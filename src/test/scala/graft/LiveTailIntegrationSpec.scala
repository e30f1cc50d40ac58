package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.OutputMode
import graft.exec.Runner
import graft.store.{BlobStore, EventStore}
import graft.streaming.LiveStreams

/** Integration: live-output tailing (T2 + S8). Ingestion is
  * FILE-granular (Spark's file source reads a file once, when first
  * listed — see LiveStreams.liveTail scaladoc), so the streaming half
  * is driven with a rotation/chunk layout where each flush is a new
  * file; the single-growing-file case is covered by the settled
  * end-of-run ingest through the exec path, which is the reference's
  * own behavior (partial logs are re-parsed on demand, not tailed). */
class LiveTailIntegrationSpec extends SparkSpec {

  test("tail ingests new chunk files as they appear; exec lands settled events") {
    val root = Files.createTempDirectory("live_int").toString
    val store = new EventStore(spark, root)
    val runner = new Runner(store, new BlobStore(s"$root/blobs"))

    val liveDir = Files.createDirectories(
      java.nio.file.Paths.get(root, "live", "chunks")).toString
    val stream = LiveStreams.liveTail(spark, liveDir, "gcc_text")
    val query = stream.writeStream.format("memory").queryName("live_int_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // rotation layout: each flush is a NEW file → each streams in
      Files.writeString(java.nio.file.Paths.get(liveDir, "chunk-000.log"),
        "src/a.c:1:1: error: first\n")
      query.processAllAvailable()
      assert(spark.table("live_int_t").count() === 1)

      Files.writeString(java.nio.file.Paths.get(liveDir, "chunk-001.log"),
        "noise line the strict parser must not misattribute\n" +
          "src/b.c:2:2: warning: second\n")
      query.processAllAvailable()
      val tailed = spark.table("live_int_t")
        .select("severity", "ref_file").collect()
      assert(tailed.length === 2)
      assert(tailed.map(_.getString(0)).toSet === Set("error", "warning"))

      // the single-growing-file path: exec streams to ONE live file,
      // which is parsed settled at completion into the store
      val r = runner.exec(Seq("sh", "-c",
        "printf 'src/a.c:1:1: error: first\\n'; sleep 0.2; " +
          "printf 'src/b.c:2:2: warning: second\\n'; exit 1"),
        formatHint = "gcc_text")
      assert(r.status === "FAIL")
      assert(r.errors === 1L && r.warnings === 1L)
      assert(store.events.count() === 2)
    } finally query.stop()
  }

  test("chain under load: ingest → live tail → error-storm alert over 1k+ events, bounded state") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("live_storm").toString
    val liveDir = Files.createDirectories(
      java.nio.file.Paths.get(root, "chunks")).toString

    // the full streaming chain: directory tail → parse → fingerprint
    // (the same F4 expression the store applies at append) →
    // watermarked hot-fingerprint storm detector (Update mode so the
    // memory sink sees counts as they grow, without waiting out the
    // watermark)
    val events = LiveStreams.liveTail(spark, liveDir, "gcc_text")
      .withColumn("fingerprint", graft.functions.BlqFunctions.fingerprint(
        col("tool_name"), col("category"), col("code"),
        col("ref_file"), col("message")))
    // day-wide window: the two write waves are seconds apart and must
    // land in the SAME window for the storm count to accumulate
    val alerts = LiveStreams.hotFingerprints(events, "ingest_ts",
      windowDur = "1 day", watermark = "10 seconds", minCount = 500)
    val query = alerts.writeStream.format("memory").queryName("storm_t")
      .outputMode(OutputMode.Update()).start()
    try {
      // 24 chunk files × 50 lines = 1200 events appearing over several
      // triggers: 600 repeats of ONE hot failure, the rest spread over
      // 20 recurring noise diagnostics (sub-threshold) + non-event noise
      def chunk(i: Int): String =
        (0 until 50).map { j =>
          val k = i * 50 + j
          if (k % 2 == 0) "src/hot.c:10:1: error: the hot failure"
          else if (k % 10 == 1) s"make[${k % 3}]: Entering directory /b"
          else if (k % 5 == 0) s"src/noise${k % 20}.c:${k % 20}:1: error: sporadic ${k % 20}"
          else s"src/warn${k % 20}.c:${k % 20}:2: warning: lint ${k % 20}"
        }.mkString("", "\n", "\n")
      // two waves, so the second wave's counts accumulate into the
      // same window's state rather than starting fresh
      (0 until 12).foreach(i => Files.writeString(
        java.nio.file.Paths.get(liveDir, f"chunk-$i%03d.log"), chunk(i)))
      query.processAllAvailable()
      (12 until 24).foreach(i => Files.writeString(
        java.nio.file.Paths.get(liveDir, f"chunk-$i%03d.log"), chunk(i)))
      query.processAllAvailable()

      val out = spark.table("storm_t")
      // the hot fingerprint fired, with its true count and a sample
      val hot = out.filter(col("n") >= 500)
        .select("fingerprint", "n", "sample_message").collect()
      assert(hot.nonEmpty, "storm alert did not fire")
      val latest = hot.maxBy(_.getLong(1))
      assert(latest.getLong(1) === 600L, s"hot count: ${latest.getLong(1)}")
      assert(latest.getString(2).contains("the hot failure"))
      assert(latest.getString(0) != null && latest.getString(0).nonEmpty)
      // sub-threshold fingerprints (noise errors ~30×, warnings filtered
      // out entirely) never reach the sink
      assert(out.filter(col("n") >= 500).select("fingerprint")
        .distinct().count() === 1)
      assert(out.filter(col("sample_message").contains("lint")).count() === 0)
      // bounded state: one row per live (window, fingerprint) — the hot
      // key + ≤20 noise errors in ~1 window, NOT one per event
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows > 0 && stateRows <= 60, s"state rows: $stateRows")
    } finally query.stop()
  }

  test("continuous ingest: live tail lands in the EventStore across micro-batches") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("live_store").toString
    val store = new EventStore(spark, s"$root/store")
    val liveDir = Files.createDirectories(
      java.nio.file.Paths.get(root, "chunks")).toString
    val query = LiveStreams.sinkToStore(
      LiveStreams.liveTail(spark, liveDir, "gcc_text"),
      store, invocationId = "live-run-1", checkpoint = s"$root/ckpt")
    try {
      Files.writeString(java.nio.file.Paths.get(liveDir, "chunk-000.log"),
        "src/a.c:1:1: error: first\nsrc/b.c:2:2: warning: second\n")
      query.processAllAvailable()
      assert(store.events.count() === 2)

      Files.writeString(java.nio.file.Paths.get(liveDir, "chunk-001.log"),
        "src/c.c:3:3: error: third\n")
      query.processAllAvailable()
      val evs = store.events
      assert(evs.count() === 3)
      // full Event schema landed: ids unique, fingerprints computed,
      // invocation attribution and date partition present
      assert(evs.select("id").distinct().count() === 3)
      assert(evs.filter(col("fingerprint").isNull).count() === 0)
      assert(evs.filter(col("invocation_id") === "live-run-1").count() === 3)
      assert(evs.filter(col("date").isNull).count() === 0)
      assert(evs.filter(col("severity") === "error").count() === 2)
      // and the store's normal read path (partition-pruned scan) serves it
      assert(store.events.filter(col("ref_file") === "src/c.c").count() === 1)
    } finally query.stop()
  }
}
