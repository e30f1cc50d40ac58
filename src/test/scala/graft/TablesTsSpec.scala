package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** `Tables.t`'s events.ts normalization across parquet physical-type
  * generations — the regression class behind the r8 outage: the driver
  * regenerated testdata and events.ts changed TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, isAdjustedToUTC=0), which Spark reads as nanos
  * LongType (under nanosAsLong=true) vs TIMESTAMP_NTZ respectively.
  * Checked-in fixtures carry the SAME ten instants in both physical
  * encodings; `Tables.t` must read both to identical µs TimestampType
  * values, so every downstream events query is invariant to which
  * generation of testdata it runs against. */
class TablesTsSpec extends SparkSpec {

  private def fixture(name: String): String = {
    val url = getClass.getResource(s"/fixtures/$name")
    assert(url != null, s"missing test fixture dir: $name")
    url.getPath
  }

  test("nanos and micros encodings of the same instants read identically") {
    val nanos  = Tables.t(spark, fixture("events_nanos"), "events")
    val micros = Tables.t(spark, fixture("events_micros"), "events")
    assert(nanos.schema("ts").dataType == TimestampType)
    assert(micros.schema("ts").dataType == TimestampType)
    val n = nanos.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy(col("event_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val m = micros.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .orderBy(col("event_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(n.sameElements(m), s"nanos=${n.toSeq} micros=${m.toSeq}")
    // and the instants are the expected wall-clock micros (UTC session
    // zone): 2026-03-01T12:00:00 + i seconds + 137·i µs
    val base = java.time.LocalDateTime.of(2026, 3, 1, 12, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    m.foreach { case (id, us) =>
      assert(us == base + id * 1000000L + id * 137L, s"event $id: $us")
    }
  }
}
