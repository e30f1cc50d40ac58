package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table access for the driver-provided test data (TESTDATA.md).
  *
  * All operator queries read through here so scan behavior is uniform:
  * plain parquet scans that Catalyst can push filters/projections into.
  * At cluster scale the same call sites would point at a partitioned
  * table root (see [[graft.store.EventStore]] for the partitioned layout).
  */
object Tables {

  // Resolved-table cache: spark.read.parquet pays a file listing +
  // footer schema read per call; the inputs are immutable test tables,
  // so resolve each (session, path) once. Keyed on the session too so
  // test suites with multiple sessions never cross wires.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((s, s"$dir/$name.parquet"), { case (sess, path) =>
      val df = sess.read.parquet(path)
      // events.ts has shipped as two physical parquet types across
      // testdata generations; normalize both to µs TimestampType so
      // downstream code always sees the same instant semantics:
      //  - TIMESTAMP(NANOS): Spark 4 only reads it as a nanos LongType
      //    (spark.sql.legacy.parquet.nanosAsLong=true, set in configure)
      //    → rebuild µs.
      //  - TIMESTAMP(MICROS) isAdjustedToUTC=0: reads as TIMESTAMP_NTZ
      //    → cast to TIMESTAMP; under the UTC session zone (configure)
      //    this is the identical instant, bit-for-bit.
      if (name == "events")
        df.schema("ts").dataType match {
          case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
          case _                => df
        }
      else df
    })

  /** Scale-adaptive shape pick for a fact-table attach side (r12).
    *
    * The recurring q06/q81/q90/q92 pattern: a query attaches one or
    * two columns of a second fact table (orders) onto the main fact
    * by key. At small scale the right plan is Catalyst's own
    * broadcast of the attach side — but past the broadcast threshold
    * AQE's fallback is either an SMJ (two fact sorts) or a broadcast
    * of the OTHER, fact-derived side, whose build serializes
    * single-threaded (measured: q90 1.15 s unhinted vs 0.59 s
    * shuffle-hash at sf1; q92 1.25 vs 0.89). Decide from the attach
    * side's optimizer stats: under the session broadcast threshold,
    * leave the frame unhinted (dim regime — broadcast is correct);
    * over it, pin shuffle_hash so both sides exchange on the join key
    * and the build stays per-partition (fact regime). Same
    * stats-driven cutover idiom as Ivf.probeShaped and
    * Similarity.shapedSelfJoin; costs one driver-side stats read on
    * an already-resolved plan, no job.
    *
    * The decision reads the UNPROJECTED table's stats, not the
    * projection's: "is this table a dim or a fact" is a property of
    * the table, and the projected estimate (compressed file bytes
    * scaled by column ratio) carries exactly the underestimate that
    * makes AQE mispick in the first place (measured: the 2-column
    * orders projection at a 25 MB/1.5M-row scale reads ~5 MB —
    * under the 10 MB threshold a broadcast of it would thrash).
    * The hint attaches to the projected frame and survives the
    * Project (EliminateResolvedHint collects hints through
    * non-join nodes).
    */
  def attachSide(base: DataFrame)(project: DataFrame => DataFrame): DataFrame = {
    val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    val bytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
    val out = project(base)
    if (thr >= 0 && bytes <= BigInt(thr)) out else out.hint("shuffle_hash")
  }

  /** Session config every entry point (Verify / Bench / tests) applies. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
}
