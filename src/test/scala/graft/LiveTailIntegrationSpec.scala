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
}
