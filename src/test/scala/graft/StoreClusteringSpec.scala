package graft

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.functions._
import graft.model._
import graft.store.EventStore

/** Write-side clustering of event files (the SURVEY §4 ART-index
  * substitute): every parquet part file written by the store must hold
  * its rows sorted by (severity, timestamp) within a date partition,
  * so row groups carry tight min/max stats on the columns the P6/P9
  * filters hit. Asserted per PHYSICAL FILE — reading the whole
  * directory back would let Spark reorder across files and prove
  * nothing. */
class StoreClusteringSpec extends SparkSpec {

  private def mkEvent(i: Int, sev: String, tsMs: Long) = Event(
    id = s"e$i", invocation_id = "inv-1", event_index = i.toLong,
    timestamp = new Timestamp(tsMs), severity = sev,
    message = Some(s"m$i"), raw_text = None, tool_name = Some("t"),
    category = None, code = None, rule = None, test_name = None,
    ref_file = None, ref_line = None, ref_column = None, fingerprint = None,
    log_line_start = None, log_line_end = None, context = None,
    metadata = None, date = Date.valueOf("2026-08-13"))

  test("appended event files are (severity, timestamp)-sorted per part file") {
    val root = java.nio.file.Files.createTempDirectory("cluster_store").toString
    val store = new EventStore(spark, root)
    // interleave severities and timestamps so unsorted writes would
    // be detected with near-certainty
    val rng = new scala.util.Random(11)
    val events = (0 until 600).map { i =>
      mkEvent(i, Severity.All(rng.nextInt(Severity.All.length)),
        1700000000000L + rng.nextInt(1000000))
    }
    store.appendEvents(spark.createDataFrame(events))
    val parts = new java.io.File(s"$root/events")
      .listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.getName.endsWith(".parquet"))
    assert(parts.nonEmpty, "no event part files written")
    parts.foreach { f =>
      val rows = spark.read.parquet(f.getPath)
        .select(col("severity"), col("timestamp").cast("long").as("ts"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val sorted = rows.sortBy(identity)
      assert(rows.sameElements(sorted),
        s"${f.getName}: rows not (severity, timestamp)-sorted")
    }
  }

  test("compaction bin-packs small part files and clustering survives") {
    val root = java.nio.file.Files.createTempDirectory("compact_store").toString
    val store = new EventStore(spark, root)
    val rng = new scala.util.Random(17)
    // four separate appends — the continuous-ingest shape that piles
    // up small part files, one batch at a time
    (0 until 4).foreach { batch =>
      val events = (0 until 150).map { i =>
        mkEvent(batch * 1000 + i, Severity.All(rng.nextInt(Severity.All.length)),
          1700000000000L + rng.nextInt(1000000))
      }
      store.appendEvents(spark.createDataFrame(events))
    }
    def partFiles() = new java.io.File(s"$root/events")
      .listFiles().filter(_.isDirectory).flatMap(_.listFiles())
      .filter(f => f.getName.endsWith(".parquet"))
    val before = partFiles()
    assert(before.length >= 4, s"expected >=4 small files, got ${before.length}")
    val rowsBefore = spark.read.parquet(s"$root/events")
      .orderBy("id").collect().map(_.toString).toSeq

    val m = new graft.store.Maintenance(store)
    // preview names the events partition without touching it
    val preview = m.compactionCandidates("events")
    assert(preview.map(_.date) === Seq("2026-08-13"))
    assert(preview.head.files === before.length && preview.head.targetFiles === 1)
    assert(partFiles().length === before.length, "preview must not rewrite")

    val done = m.applyCompaction("events",
      clusterBy = Seq("severity", "timestamp"))
    assert(done === preview)
    val after = partFiles()
    assert(after.length === 1, s"expected 1 packed file, got ${after.length}")
    // no data lost or changed
    val rowsAfter = spark.read.parquet(s"$root/events")
      .orderBy("id").collect().map(_.toString).toSeq
    assert(rowsAfter === rowsBefore)
    // the write-time clustering invariant survives compaction
    after.foreach { f =>
      val rows = spark.read.parquet(f.getPath)
        .select(col("severity"), col("timestamp").cast("long").as("ts"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"${f.getName}: compacted rows not (severity, timestamp)-sorted")
    }
    // idempotent: a second pass finds nothing to do
    assert(m.applyCompaction("events").isEmpty)
  }
}
