package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the most recent
  * right row with the same key and `right.time <= left.time` — the
  * time-series join (trades→quotes, events→latest-config) that Spark
  * has no native operator for.
  *
  * The naive formulation is a range join (per-key quadratic pairs, and
  * Spark plans non-equi joins as BNL). This is the scalable
  * union-window form instead: tag both sides, union them, and within
  * each key carry the last-seen right payload forward over the
  * (time, side) order — right rows sort before left rows at equal
  * timestamps, so the match is inclusive. ONE shuffle on the key,
  * O(n log n) sort per partition, zero pair blowup; the same shape at
  * 100 TB, with AQE handling key skew. This union-window pattern is
  * the standard large-scale as-of strategy (e.g. Flink temporal joins
  * and kdb-style asof implementations reduce to it).
  *
  * Contract: right must be unique per (key, time) — pre-aggregate
  * otherwise (ambiguous as-of matches are engine-defined everywhere,
  * including SQL ASOF JOIN). Times are compared with plain column
  * ordering — use the same physical type on both sides (epoch millis
  * recommended). The implementation reserves the internal column
  * names `__t`, `__side`, `__p`, `__l`, `__m` and `__k0..__k{n-1}`;
  * inputs carrying any of them are rejected loudly (a silent shadow
  * would produce wrong joins).
  */
object AsofJoin {

  /** Returns every left row plus one struct column `as` holding ALL
    * right columns except the keys (including the matched right time),
    * or null when no right row precedes the left row (left-join
    * semantics). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, as: String = "asof"): DataFrame =
    asof(left, right, Seq(key), leftTime, rightTime, as, forward = false)

  /** Forward variant: the EARLIEST right row at-or-after each left
    * row's time — "next scheduled maintenance", "next release after
    * this commit". Same union-window shape, reversed scan order. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, as: String = "asof"): DataFrame =
    asof(left, right, Seq(key), leftTime, rightTime, as, forward = true)

  /** Multi-key, direction-parameterized core. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, as: String = "asof",
      forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asof needs at least one key column")
    val reserved = (Seq("__t", "__side", "__p", "__l", "__m") ++
      keys.indices.map(i => s"__k$i")).toSet
    val clash = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"asof reserves internal column names ${reserved.toSeq.sorted.mkString(", ")}; " +
        s"rename input column(s): ${clash.toSeq.sorted.mkString(", ")}")
    val payload = struct(right.columns.filterNot(keys.contains).map(col).toSeq: _*)
    val keyCols = keys.zipWithIndex.map { case (k, i) => col(k).as(s"__k$i") }
    val keyRefs = keys.indices.map(i => col(s"__k$i"))
    val r = right.select(keyCols ++ Seq(col(rightTime).as("__t"),
      lit(0).as("__side"), payload.as("__p")): _*)
    val pType = r.schema("__p").dataType
    val l = left.select(keyCols ++ Seq(col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast(pType).as("__p"),
      struct(left.columns.map(col).toSeq: _*).as("__l")): _*)
    val lType = l.schema("__l").dataType
    val unioned = r.withColumn("__l", lit(null).cast(lType)).unionByName(l)
    // Inclusive scan: right (side 0) sorts before left (side 1) at
    // equal times IN SCAN ORDER, so a right row exactly AT the left
    // timestamp matches in both directions. Backward scans ascending
    // (last right ≤ t); forward scans descending (first right ≥ t).
    val tOrd = if (forward) col("__t").desc else col("__t").asc
    val w = Window.partitionBy(keyRefs: _*)
      .orderBy(tOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__m").as(as))
  }
}
