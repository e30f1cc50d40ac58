package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.OutputMode
import graft.exec.Runner
import graft.store.{BlobStore, EventStore}
import graft.streaming.LiveStreams

/** Integration: the full reference loop — a command writes its live
  * output file while a Structured Streaming query tails the live
  * directory and parses diagnostics as they appear (T2 + S8). */
class LiveTailIntegrationSpec extends SparkSpec {

  test("streaming tail sees diagnostics from a run's live output") {
    val root = Files.createTempDirectory("live_int").toString
    val store = new EventStore(spark, root)
    val runner = new Runner(store, new BlobStore(s"$root/blobs"))

    // Tail the whole live tree (any attempt's output.log).
    val stream = LiveStreams.liveTail(spark, s"$root/live/*", "gcc_text")
    val query = stream.writeStream.format("memory").queryName("live_int_t")
      .outputMode(OutputMode.Append()).start()
    try {
      // Slow-ish command emitting diagnostics as it runs.
      val r = runner.exec(Seq("sh", "-c",
        "printf 'src/a.c:1:1: error: first\\n'; sleep 0.2; " +
          "printf 'src/b.c:2:2: warning: second\\n'; exit 1"),
        formatHint = "gcc_text")
      assert(r.status === "FAIL")
      query.processAllAvailable()
      val tailed = spark.table("live_int_t")
        .select("severity", "ref_file").collect()
      assert(tailed.length === 2)
      assert(tailed.map(_.getString(0)).toSet === Set("error", "warning"))
      // and the batch store got the same events through the exec path
      assert(store.events.count() === 2)
    } finally query.stop()
  }
}
