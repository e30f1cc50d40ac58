package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Table access for the driver-provided test data (TESTDATA.md).
  *
  * All operator queries read through here so scan behavior is uniform:
  * plain parquet scans that Catalyst can push filters/projections into.
  * At cluster scale the same call sites would point at a partitioned
  * table root (see [[graft.store.EventStore]] for the partitioned layout).
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads as
    // a nanos LongType (spark.sql.legacy.parquet.nanosAsLong=true — set
    // by Verify/Bench/tests). Rebuild a µs TimestampType column so all
    // downstream code sees a real timestamp; DuckDB keeps ns, so queries
    // never emit raw ts (see CoreQueries scaladoc).
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Session config every entry point (Verify / Bench / tests) applies. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
}
