package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-item (heavy-hitter) detection with bounded state — the
  * Misra-Gries summary, run as the candidate-generation pass of a
  * two-pass exact heavy-hitter query.
  *
  * Reference behavior frame: blq-cli's value-counts / summary surface
  * (frequency reporting over stored events,
  * /root/reference/src/blq/query.py) — generalized to a sketch whose
  * state is bounded at k counters per task, for value domains whose
  * full-cardinality groupBy is the thing a 100 TB monitor cannot
  * afford every cadence tick.
  *
  * Why two passes instead of trusting the sketch's counts: MG counts
  * are UNDER-estimates (every eviction forfeits mass), so they can
  * never hash-match an exact oracle. The published guarantee (Misra &
  * Gries 1982; mergeability per Agarwal et al., "Mergeable Summaries",
  * PODS 2012) is about MEMBERSHIP: any value with true count
  * > N/(k+1) is guaranteed to survive in a capacity-k summary, and
  * merging per-partition summaries (sum counters, then subtract the
  * (k+1)-th largest count and drop non-positives) preserves that
  * bound over the combined stream. So pass 1 produces a ≤ k candidate
  * set that PROVABLY contains every value above the threshold, and
  * pass 2 counts exactly — but only over the candidate set, a
  * broadcast-filtered map-side scan + a k-bounded aggregation, never
  * the full key-set shuffle. The result is bit-exact (completeness
  * from the bound, exactness from the recount) while the expensive
  * domain-wide aggregation never runs.
  *
  * Scale shape: [[MisraGries]] is a typed Aggregator, so it partial-
  * aggregates — each map task reduces its slice to ≤ k counters
  * before the (single-row) shuffle, the same cost model as
  * [[Sketches]]' KMV MinK. Pass 2's filter is `isin(candidates)` —
  * a broadcast hash set at the scan, pushed into the parquet reader
  * where the format allows.
  */
object HeavyHitters {

  /** One-pass bounded-state sketch: (n_total, counters) with
    * |counters| ≤ k. Counter values are lower bounds on true counts;
    * membership covers every value with true count > n/(k+1). */
  def sketch(df: DataFrame, valueCol: String, k: Int): (Long, Map[String, Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string")).as[String]
    val rows = ds.select(MisraGries.mg(k)).collect()
    if (rows.isEmpty) (0L, Map.empty) else rows.head
  }

  /** Exact heavy hitters: every `valueCol` value whose count satisfies
    * `cnt * fracDen > N` (i.e. frequency strictly above 1/fracDen of
    * the stream), computed without a full-cardinality shuffle.
    * Completeness requires the sketch guarantee to cover the
    * threshold: N/fracDen ≥ N/(k+1), i.e. `fracDen ≤ k + 1` —
    * enforced loudly. Output: (valueCol, cnt), exact counts. */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int,
      fracDen: Long): DataFrame = {
    require(fracDen >= 1, s"fracDen must be >= 1, got $fracDen")
    require(fracDen <= k + 1,
      s"completeness needs fracDen <= k+1 (threshold N/$fracDen must be " +
        s">= the sketch bound N/${k + 1}); got k=$k")
    val (n, counters) = sketch(df, valueCol, k)
    val cands = counters.keys.toSeq
    if (cands.isEmpty)
      df.sparkSession.emptyDataFrame
        .withColumn(valueCol, lit(null).cast("string"))
        .withColumn("cnt", lit(null).cast("long"))
        .limit(0)
    else
      df.filter(col(valueCol).isNotNull)
        .filter(col(valueCol).cast("string").isin(cands: _*))
        .groupBy(col(valueCol).cast("string").as(valueCol))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * fracDen > n)
  }

  // ---------------------------------------------------------------
  // Continuously-maintained state (the kmvMonitor companion): a
  // stored MG summary folded per ingest batch. One crucial protocol
  // difference: KMV's distinct/sort/take-k merge absorbs an
  // at-least-once replay for free, but MG merge is NOT idempotent —
  // re-merging the same batch double-counts it. The state therefore
  // carries a last-folded batch id and the fold REFUSES stale ids;
  // under a streaming checkpoint's monotonically increasing batchId
  // a replayed batch is skipped exactly.
  // ---------------------------------------------------------------

  /** Read the stored monitor state: (n, counters, lastBatchId).
    * Missing state reads as empty with lastBatchId = -1. */
  def readHhState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): (Long, Map[String, Long], Long) = {
    val live = new org.apache.hadoop.fs.Path(stateDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    repairHhState(fs, stateDir)
    if (!fs.exists(live)) (0L, Map.empty, -1L)
    else {
      // bounded collect: ≤ k counter rows + one meta row
      val rows = spark.read.parquet(stateDir)
        .select(col("v"), col("c"), col("n"), col("last_batch")).collect()
      if (rows.isEmpty) (0L, Map.empty, -1L)
      else {
        val n = rows.head.getLong(2)
        val lastBatch = rows.head.getLong(3)
        val counters = rows.filter(!_.isNullAt(0))
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        (n, counters, lastBatch)
      }
    }
  }

  /** Fold one batch's sketch into the stored state. Returns true when
    * the batch was folded, false when `batchId` was a replay
    * (≤ the stored last id — the MG non-idempotence guard). Swap is
    * the kmvMonitor rename-aside protocol (stage → live-aside →
    * promote → drop), crash-repaired on entry via the _SUCCESS
    * marker; foreachBatch bodies run serially, so single-writer. */
  def foldHhBatch(batch: DataFrame, stateDir: String, valueCol: String,
      k: Int, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val (n0, c0, last) = readHhState(spark, stateDir)
    if (batchId <= last) false
    else {
      val mg = new MisraGries(k)
      val merged = mg.merge((n0, c0), sketch(batch, valueCol, k))
      import spark.implicits._
      val rows =
        if (merged._2.isEmpty) Seq((Option.empty[String], 0L))
        else merged._2.toSeq.map { case (v, c) => (Option(v), c) }
      val df = rows.toDF("v", "c")
        .withColumn("n", lit(merged._1))
        .withColumn("last_batch", lit(batchId))
        .coalesce(1)
      val hconf = spark.sparkContext.hadoopConfiguration
      val live = new org.apache.hadoop.fs.Path(stateDir)
      val stage = new org.apache.hadoop.fs.Path(stateDir + "__stage")
      val old = new org.apache.hadoop.fs.Path(stateDir + "__old")
      val fs = live.getFileSystem(hconf)
      df.write.mode("overwrite").parquet(stage.toString)
      // rename results checked (the LexIndex.compactTombstones
      // discipline — r16 advice): a failed rename on a non-atomic or
      // permission-denied FS must not return true with the fold
      // silently dropped
      if (fs.exists(live) && !fs.rename(live, old))
        throw new java.io.IOException(s"hh fold rename-aside failed: $live")
      if (!fs.rename(stage, live)) {
        fs.rename(old, live)
        throw new java.io.IOException(s"hh fold rename-in failed: $live")
      }
      fs.delete(old, true)
      true
    }
  }

  /** Entry repair for a fold killed mid-swap: every state dir is left
    * serving either its old or its fully-written new contents. */
  private def repairHhState(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(stateDir)
    val stage = new org.apache.hadoop.fs.Path(stateDir + "__stage")
    val old = new org.apache.hadoop.fs.Path(stateDir + "__old")
    if (fs.exists(live)) {
      // fold completed or never got to the swap: drop remnants
      fs.delete(stage, true)
      fs.delete(old, true)
    } else if (fs.exists(stage) &&
        fs.exists(new org.apache.hadoop.fs.Path(stage, "_SUCCESS"))) {
      // killed between live-aside and promote: the stage is complete
      if (!fs.rename(stage, live))
        throw new java.io.IOException(s"hh repair promote failed: $stage")
      fs.delete(old, true)
    } else if (fs.exists(old)) {
      // killed with an incomplete stage: restore the old state
      fs.delete(stage, true)
      if (!fs.rename(old, live))
        throw new java.io.IOException(s"hh repair restore failed: $old")
    }
    ()
  }

  /** Streaming monitor: fold each micro-batch into the stored summary
    * — the "top domains/tokens this corpus has ever seen" dashboard
    * number, maintained at batch-sketch cost. Read any time with
    * [[readHhState]]; exact counts for the current candidates come
    * from one [[heavyHitters]]-style recount when needed. */
  def hhMonitor(stream: DataFrame, stateDir: String, valueCol: String,
      k: Int): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldHhBatch(batch, stateDir, valueCol, k, batchId)
        ()
      }
      .start()

  /** Monitoring form: the sketch's own (value, est) rows, est ≤ true ≤
    * est + N/(k+1). No second pass — for cadence ticks where a lower
    * bound with a known error band is enough. */
  def approxTopK(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, counters) = sketch(df, valueCol, k)
    val err = n / (k + 1)
    counters.toSeq.sortBy { case (v, c) => (-c, v) }
      .map { case (v, c) => (v, c, err) }
      .toDF(valueCol, "est", "max_err")
  }
}

/** Mergeable Misra-Gries summary. Buffer = (n, counters): n counts
  * every reduced row (the stream length), counters hold ≤ k entries.
  *
  * reduce: increment if present; insert if below capacity; otherwise
  * the classic simultaneous decrement (every counter −1, zeros drop)
  * — each decrement event destroys k+1 units of mass (k counters + the
  * incoming item), so total forfeited mass ≤ n/(k+1), which is both
  * the count-error band and the membership bound.
  *
  * merge: sum counters pointwise, then if over capacity subtract the
  * (k+1)-th largest count from all and drop non-positives — the
  * Agarwal et al. merge rule; the subtracted value is destroyed from
  * ≥ k+1 entries at once, so the combined error stays ≤ (n₁+n₂)/(k+1).
  */
final class MisraGries(k: Int)
    extends Aggregator[String, (Long, Map[String, Long]), (Long, Map[String, Long])] {
  require(k > 0, "k must be positive")

  override def zero: (Long, Map[String, Long]) = (0L, Map.empty)

  override def reduce(buf: (Long, Map[String, Long]),
      v: String): (Long, Map[String, Long]) = {
    val (n, m) = buf
    m.get(v) match {
      case Some(c) => (n + 1, m.updated(v, c + 1))
      case None if m.size < k => (n + 1, m.updated(v, 1L))
      case None =>
        (n + 1, m.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        })
    }
  }

  override def merge(b1: (Long, Map[String, Long]),
      b2: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
    val summed =
      if (b1._2.size >= b2._2.size)
        b2._2.foldLeft(b1._2) { case (acc, (key, c)) =>
          acc.updated(key, acc.getOrElse(key, 0L) + c)
        }
      else
        b1._2.foldLeft(b2._2) { case (acc, (key, c)) =>
          acc.updated(key, acc.getOrElse(key, 0L) + c)
        }
    val pruned =
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count; ties broken by the sort
        // are irrelevant — only the VALUE subtracted matters
        val cut = summed.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (key, c) =>
          if (c > cut) Some(key -> (c - cut)) else None
        }
      }
    (b1._1 + b2._1, pruned)
  }

  override def finish(r: (Long, Map[String, Long])): (Long, Map[String, Long]) = r

  override def bufferEncoder: Encoder[(Long, Map[String, Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Map[String, Long])]()
  override def outputEncoder: Encoder[(Long, Map[String, Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Map[String, Long])]()
}

object MisraGries {
  def mg(k: Int): TypedColumn[String, (Long, Map[String, Long])] =
    new MisraGries(k).toColumn
}
