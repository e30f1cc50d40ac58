package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.parse.FormatRegistry

/** Structured Streaming layer: the reference's quasi-streaming
  * behaviors (SURVEY.md §2.9) as real streams.
  *
  *  - T2 live tail: file-source scan of a live output directory, lines
  *    parsed to events as they append.
  *  - T5 extension: watermarked tumbling-window severity counts.
  *  - T3 watch debounce: session-window coalescing of file-change
  *    bursts (the reference's 0.5 s debounce loop,
  *    watch_cmd.py:102-175).
  *  - T1/T4 lifecycle: attempts/outcomes merged through
  *    `mapGroupsWithState`; a pending attempt with no outcome before
  *    the state timeout is emitted as orphaned (the reference's stale
  *    reconciliation, bird.py:1178-1271).
  *
  * Scale: file-source streams partition by file; lifecycle state is
  * hash-partitioned on attempt_id (RocksDB state store at cluster
  * scale); window aggs are watermark-bounded so state never grows
  * unboundedly.
  */
object LiveStreams {

  /** One attempt-lifecycle stream element: a start ("attempt") or a
    * completion ("outcome") record. */
  case class LifecycleEvent(
      attempt_id: String,
      kind: String, // attempt | outcome
      ts_ms: Long,
      exit_code: Option[Int],
      timeout: Boolean)

  case class AttemptStatus(
      attempt_id: String,
      status: String, // pending | ok | failed | timeout | orphaned
      started_ms: Long,
      completed_ms: Option[Long],
      exit_code: Option[Int])

  /** T2: tail a live output directory — every appended file's lines are
    * parsed into diagnostic events. Line-oriented formats only (the
    * compile/lint family); multi-line diagnostics re-parse at
    * completion, exactly like the reference (bird.py:1009-1126). */
  def liveTail(spark: SparkSession, dir: String, format: String = "auto"): DataFrame = {
    import spark.implicits._
    spark.readStream.text(dir).as[String]
      .flatMap(line => FormatRegistry.parse(line, format))
      .toDF()
      .withColumn("ingest_ts", current_timestamp())
  }

  /** Watermarked tumbling-window severity counts over an event stream
    * (works identically on batch frames). */
  def severityCounts(events: DataFrame, tsCol: String,
      windowDur: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col("severity"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("severity"), col("n"))

  /** Error-storm detector: fingerprints recurring ≥ `minCount` times
    * inside a watermarked tumbling window — the streaming analog of
    * the batch repeated-error rollup (A8/q17), and the alerting shape
    * a continuously-ingesting pipeline runs ("the same failure
    * fingerprint just fired 50 times in 5 minutes"). Watermark bounds
    * the state; the HAVING-style filter keeps the sink to genuinely
    * hot keys. Works identically on batch frames. */
  def hotFingerprints(events: DataFrame, tsCol: String,
      windowDur: String, watermark: String, minCount: Long): DataFrame =
    events.filter(col("severity").isin("error", "test_fail") &&
        col("fingerprint").isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col("fingerprint"))
      .agg(count(lit(1)).as("n"), max(col("message")).as("sample_message"))
      .filter(col("n") >= minCount)
      .select(col("window.start").as("window_start"),
        col("fingerprint"), col("n"), col("sample_message"))

  /** Exactly-once ingest dedup: drop re-delivered events by id within
    * the watermark horizon — the streaming half of exact dedup for a
    * continuously-ingesting training pipeline (at-least-once sources
    * re-deliver on retry; state is bounded by the watermark instead of
    * growing with history, which is what makes this shape survive an
    * unbounded stream). Batch exact dedup of settled data stays
    * [[graft.ml.TextDedup.exactDuplicates]]. */
  def dedupStream(events: DataFrame, idCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** T3: debounce file-change bursts with a session window — one row
    * per (path, quiet-gap-delimited burst), the idiomatic Spark form of
    * the reference's 0.5 s debounce+coalesce loop. */
  def debounceChanges(changes: DataFrame, tsCol: String,
      gap: String = "500 milliseconds"): DataFrame =
    changes
      .groupBy(session_window(col(tsCol), gap), col("path"))
      .agg(count(lit(1)).as("n_changes"),
        max(col(tsCol)).as("last_change"))
      .select(col("path"), col("session_window.start").as("burst_start"),
        col("last_change"), col("n_changes"))

  /** T1/T4: merge attempt/outcome streams into per-attempt status with
    * orphan detection. With `orphanAfterMs > 0`, pending attempts set a
    * processing-time timeout; if no outcome arrives the state times out
    * and the attempt is emitted as orphaned — the streaming form of the
    * reference's stale-PID reconciliation. Note the cost: a pending
    * timeout keeps the query triggering empty batches to evaluate it,
    * so use a real `Trigger.ProcessingTime` in production and
    * `orphanAfterMs = 0` (no timeout) when orphans are reconciled by
    * the batch path (Views.attemptStatus) instead. Output mode: Update. */
  def lifecycle(updates: Dataset[LifecycleEvent],
      orphanAfterMs: Long = 0L): Dataset[AttemptStatus] = {
    val spark = updates.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (orphanAfterMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    updates.groupByKey(_.attempt_id)
      .mapGroupsWithState[AttemptStatus, AttemptStatus](timeoutConf) {
        (id: String, events: Iterator[LifecycleEvent], state: GroupState[AttemptStatus]) =>
          if (state.hasTimedOut) {
            val orphaned = state.get.copy(status = "orphaned")
            state.remove()
            orphaned
          } else {
            val evs = events.toSeq
            val start = evs.find(_.kind == "attempt")
            val outcome = evs.find(_.kind == "outcome")
            val startedMs = start.map(_.ts_ms)
              .orElse(state.getOption.map(_.started_ms)).getOrElse(0L)
            val status = outcome match {
              case Some(o) if o.timeout =>
                AttemptStatus(id, "timeout", startedMs, Some(o.ts_ms), o.exit_code)
              case Some(o) if o.exit_code.isEmpty =>
                AttemptStatus(id, "orphaned", startedMs, Some(o.ts_ms), None)
              case Some(o) if o.exit_code.contains(0) =>
                AttemptStatus(id, "ok", startedMs, Some(o.ts_ms), o.exit_code)
              case Some(o) =>
                AttemptStatus(id, "failed", startedMs, Some(o.ts_ms), o.exit_code)
              case None =>
                AttemptStatus(id, "pending", startedMs, None, None)
            }
            if (status.status == "pending") {
              state.update(status)
              if (orphanAfterMs > 0) state.setTimeoutDuration(orphanAfterMs)
            } else state.remove()
            status
          }
      }
  }
}
