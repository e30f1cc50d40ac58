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

  /** Session config every entry point (Verify / Bench / tests) applies. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
}
