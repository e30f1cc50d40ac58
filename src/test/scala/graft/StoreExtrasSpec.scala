package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.api.{Annotators, Formatters}
import graft.store.BlobStore

/** Specs for the blob store (S11), output formatters (S12), and the
  * annotator enrichment stage (F5). */
class StoreExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("blob store: small content inlines as data: URI") {
    val bs = new BlobStore(Files.createTempDirectory("blobs").toString)
    val (typ, ref, hash) = bs.store("hello world".getBytes(StandardCharsets.UTF_8))
    assert(typ === "inline")
    assert(ref.startsWith("data:text/plain;base64,"))
    assert(hash.length === 32)
    assert(new String(bs.load(typ, ref), StandardCharsets.UTF_8) === "hello world")
  }

  test("blob store: large content lands content-addressed with dedup") {
    val bs = new BlobStore(Files.createTempDirectory("blobs2").toString)
    val big = ("x" * 10000).getBytes(StandardCharsets.UTF_8)
    val (typ, ref, hash) = bs.store(big)
    assert(typ === "blob")
    assert(ref === s"${hash.take(2)}/$hash")
    assert(bs.load(typ, ref) === big)
    // same content -> same address, no duplicate file
    val (_, ref2, _) = bs.store(big)
    assert(ref2 === ref)
    assert(bs.listHashes() === Seq(hash))
    assert(bs.delete(hash))
    assert(bs.listHashes().isEmpty)
  }

  test("blob store: oversized content truncates head+tail") {
    val bs = new BlobStore(Files.createTempDirectory("blobs3").toString, maxBytes = 1000)
    val huge = ("a" * 5000).getBytes(StandardCharsets.UTF_8)
    val (typ, ref, _) = bs.store(huge)
    val loaded = new String(bs.load(typ, ref), StandardCharsets.UTF_8)
    assert(loaded.contains("[truncated 4000 bytes]"))
    assert(loaded.length < 1200)
  }

  test("formatters: table drops columns to fit width") {
    val df = Seq((1, "short", "x" * 60), (2, "vals", "y" * 60))
      .toDF("id", "name", "long_column")
    val full = Formatters.table(df, maxWidth = 200)
    assert(full.contains("long_column"))
    val narrow = Formatters.table(df, maxWidth = 30)
    assert(narrow.contains("id") && !narrow.contains("long_column"))
  }

  test("formatters: json strips nulls and types numbers") {
    val df = Seq((1, Some("a"), Some(1.5)), (2, None, None))
      .toDF("id", "name", "score")
    val js = Formatters.json(df)
    assert(js.contains(""""id": 1"""))
    assert(js.contains(""""name": "a""""))
    assert(js.contains(""""score": 1.5"""))
    assert(!js.contains("null"))
  }

  test("formatters: csv escapes, markdown renders") {
    val df = Seq((1, "a,b", "with \"quote\"")).toDF("id", "v1", "v2")
    val c = Formatters.csv(df)
    assert(c.contains("\"a,b\""))
    assert(c.contains("\"with \"\"quote\"\"\""))
    val md = Formatters.markdown(df)
    assert(md.startsWith("| id | v1 | v2 |"))
  }

  test("annotators: append to metadata annotations array") {
    val events = Seq(
      ("e1", "segfault in worker", Option.empty[String], Option.empty[String]),
      ("e2", "fine", None, None),
      ("e3", "timeout waiting", Some("test_x"), Some("""{"annotations":[{"a":1}]}""")))
      .toDF("id", "message", "test_name", "metadata")
    val out = Annotators(events,
        Seq(Annotators.severityEscalator, Annotators.flakyTestTagger))
      .select($"id", $"metadata").as[(String, Option[String])].collect().toMap
    assert(out("e1").get.contains("severity_escalator"))
    assert(out("e2").isEmpty) // untouched (was null)
    assert(out("e3").get.contains("flaky_test_tagger"))
    assert(out("e3").get.contains("""{"a":1}""")) // pre-existing kept
  }

  test("annotators: side-table late annotation join") {
    val events = Seq(("e1", "m1"), ("e2", "m2")).toDF("id", "message")
    val side = Seq(("e2", """{"triaged":true}""")).toDF("event_id", "annotation_json")
    val out = Annotators.annotateFromSide(events, side)
      .select($"id", $"late_annotation").as[(String, Option[String])].collect().toMap
    assert(out("e1").isEmpty)
    assert(out("e2").get.contains("triaged"))
  }
}
