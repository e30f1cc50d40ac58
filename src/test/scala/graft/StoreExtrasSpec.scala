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

  test("git blame annotator: last commit/author per ref location from a fixture repo") {
    import graft.api.GitAnnotator
    import graft.exec.ExecContext
    // fixture repo: Alice commits 5 lines, Bob rewrites line 2
    val repo = Files.createTempDirectory("blame_repo").toString
    def git(args: String*) = ExecContext.runGit(Some(repo), 5000, args: _*)
    git("init", "-b", "main")
    val src = java.nio.file.Paths.get(repo, "src")
    Files.createDirectories(src)
    Files.writeString(src.resolve("app.c"),
      "int a;\nint broken;\nint c;\nint d;\nint e;\n")
    git("add", ".")
    git("-c", "user.name=Alice", "-c", "user.email=a@x", "commit", "-m", "initial")
    Files.writeString(src.resolve("app.c"),
      "int a;\nint fixed_differently;\nint c;\nint d;\nint e;\n")
    git("add", ".")
    git("-c", "user.name=Bob", "-c", "user.email=b@x", "commit", "-m", "rework line 2")

    // primitives: blame + history
    val b2 = GitAnnotator.blame(repo, "src/app.c", 2).get
    val b4 = GitAnnotator.blame(repo, "src/app.c", 4).get
    assert(b2.author === "Bob" && b4.author === "Alice")
    assert(b2.commit.matches("[0-9a-f]{40}"))
    assert(b2.commit !== b4.commit)
    val hist = GitAnnotator.fileHistory(repo, "src/app.c")
    assert(hist.map(_.author) === Seq("Bob", "Alice"))
    assert(GitAnnotator.blame(repo, "src/app.c", 999).isEmpty) // past EOF
    assert(GitAnnotator.blame(repo, "nope.c", 1).isEmpty)

    // end-to-end: store events at those locations -> side table -> join
    val root = Files.createTempDirectory("blame_store").toString
    val store = new graft.store.EventStore(spark, root)
    val runner = new graft.exec.Runner(store, new BlobStore(s"$root/blobs"))
    runner.importContent(
      "src/app.c:2:1: error: still broken\nsrc/app.c:4:1: warning: fishy\n" +
        "elsewhere.c:9:1: error: unrelated\n",
      format = "gcc_text",
      context = Some(ExecContext.Captured.empty))
    val side = GitAnnotator.sideTable(store, repo)
    val rows = side.collect()
    assert(rows.length === 2) // elsewhere.c is not in the repo: no row
    val byId = Annotators.annotateFromSide(store.events, side)
      .select($"ref_line", $"late_annotation")
      .as[(Int, Option[String])].collect().toMap
    assert(byId(2).get.contains("\"last_author\":\"Bob\""))
    assert(byId(2).get.contains("git_blame"))
    assert(byId(2).get.contains("rework line 2")) // recent_commits rides along
    assert(byId(4).get.contains("\"last_author\":\"Alice\""))
    assert(byId(9).isEmpty)

    // plugin discovery: the blame provider is ServiceLoader-visible
    val providers = graft.api.SideAnnotatorProvider.loadAll()
    assert(providers.exists(_.name === "git_blame"))
  }

  test("schema migration: adapt + rewrite round trip (add, rename, widen)") {
    import graft.store.{GraftMigrations, SchemaMigration}
    val root = Files.createTempDirectory("migrate").toString
    // v1-era table: no test_name, legacy 'sandbox' column, int ref_line
    Seq(
      (1L, "2026-01-01", "sbx-a", 10, "boom"),
      (2L, "2026-01-02", null: String, 20, "ok"))
      .toDF("run_serial", "date", "sandbox", "ref_line", "message")
      .withColumn("ref_line", $"ref_line".cast("int"))
      .write.partitionBy("date").parquet(s"$root/events")

    val m = GraftMigrations(spark, root)
    assert(m.currentVersion === 1 && m.latestVersion === 4)
    assert(m.pending("events").map(_.version) === Seq(2, 3, 4))

    def raw = spark.read.option("mergeSchema", "true").parquet(s"$root/events")
    val adapted = m.adapt("events", raw)
    assert(adapted.columns.contains("test_name"))
    assert(adapted.columns.contains("extension_data") && !adapted.columns.contains("sandbox"))
    assert(adapted.schema("ref_line").dataType.typeName === "long")
    val byId = adapted.select($"run_serial", $"extension_data", $"test_name")
      .as[(Long, Option[String], Option[String])].collect()
      .map { case (k, v, t) => k -> ((v, t)) }.toMap
    assert(byId(1L) === ((Some("sbx-a"), None))) // rename copied the value
    assert(byId(2L) === ((None, None)))

    // Physical rewrite: live table now carries the latest schema and the
    // stored version makes the adapter chain a no-op.
    m.rewrite(Map("events" -> (raw, Seq("date"))))
    assert(m.currentVersion === 4)
    assert(m.pending("events").isEmpty)
    val rewritten = raw
    assert(rewritten.columns.contains("extension_data") && !rewritten.columns.contains("sandbox"))
    assert(rewritten.schema("ref_line").dataType.typeName === "long")
    assert(m.adapt("events", rewritten).collect().length === 2)

    // Post-migration appends in the new schema co-read with rewritten data
    Seq((3L, "2026-01-03", Some("late"), 30L, "new", Some("t_x")))
      .toDF("run_serial", "date", "extension_data", "ref_line", "message", "test_name")
      .write.mode("append").partitionBy("date").parquet(s"$root/events")
    assert(raw.count() === 3)

    // Idempotence: running an adapter over already-migrated data is a no-op
    assert(SchemaMigration.renameColumn("sandbox", "extension_data")(rewritten)
      .columns.toSeq === rewritten.columns.toSeq)
  }

  test("schema migration: rewrite refuses to bump past an uncovered table") {
    import graft.store.SchemaMigration
    import graft.store.SchemaMigration.Step
    val root = Files.createTempDirectory("migrate_guard").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/events")
    Seq((1L, "a")).toDF("id", "v").write.parquet(s"$root/attempts")
    val m = new SchemaMigration(spark, root, Seq(
      Step(2, "events", "add x", SchemaMigration.addColumn("x", "string")),
      Step(2, "attempts", "add y", SchemaMigration.addColumn("y", "string"))))
    val raw = spark.read.parquet(s"$root/events")
    // version marker is store-wide: omitting attempts would silently
    // disable its pending adapter
    intercept[IllegalArgumentException] {
      m.rewrite(Map("events" -> (raw, Seq.empty)))
    }
    assert(m.currentVersion === 1) // nothing bumped, adapters still active
  }

  test("annotator providers: ServiceLoader discovery, eager split, broken-plugin isolation") {
    import graft.api.AnnotatorProvider
    // the test classpath advertises a deliberately broken provider on
    // top of the two built-ins — discovery must skip it, not throw
    val all = AnnotatorProvider.loadAll()
    assert(all.map(_.name).toSet === Set("severity_escalator", "flaky_test_tagger"))
    // eager split mirrors the reference's run_annotators(eager_only=)
    assert(AnnotatorProvider.annotators(eagerOnly = true).size === 1)
    assert(AnnotatorProvider.annotators().size === 2)
    // discovered annotators drive the same enrichment stage
    val events = Seq(("e1", "fatal: boom", Option.empty[String], Option.empty[String]))
      .toDF("id", "message", "test_name", "metadata")
    val out = Annotators(events, AnnotatorProvider.annotators(eagerOnly = true))
      .select($"metadata").as[Option[String]].head()
    assert(out.get.contains("severity_escalator"))
  }
}

/** Deliberately unconstructible provider advertised only on the TEST
  * classpath (META-INF/services): proves one broken plugin jar cannot
  * take down discovery. */
final class BrokenAnnotatorProvider extends graft.api.AnnotatorProvider {
  throw new IllegalStateException("this plugin is broken by design")
  val name = "broken"
  val eager = true
  def annotator: graft.api.Annotators.Annotator = ???
}
