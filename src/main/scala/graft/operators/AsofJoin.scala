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
  * recommended).
  */
object AsofJoin {

  /** Returns every left row plus one struct column `as` holding ALL
    * right columns except the key (including the matched right time),
    * or null when no right row precedes the left row (left-join
    * semantics). */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, as: String = "asof"): DataFrame = {
    val payload = struct(right.columns.filterNot(_ == key).map(col).toSeq: _*)
    val r = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), payload.as("__p"))
    val pType = r.schema("__p").dataType
    val l = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast(pType).as("__p"),
      struct(left.columns.map(col).toSeq: _*).as("__l"))
    val lType = l.schema("__l").dataType
    val unioned = r.withColumn("__l", lit(null).cast(lType)).unionByName(l)
    // Inclusive backward scan: right (side 0) sorts before left (side 1)
    // at equal times, so a right row AT the left timestamp matches.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__m").as(as))
  }
}
