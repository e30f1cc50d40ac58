package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.exec.{ExecContext, Runner}
import graft.store.{BlobStore, EventStore}

/** Runner-lifecycle queries: operators whose input is graft's OWN
  * store rather than the TESTDATA tables. The fixture corpus is built
  * by the real write path (Runner.importContent → EventStore), so the
  * oracle gates the end-to-end capture → write → read → rollup
  * pipeline, not just the final aggregation.
  *
  * q75 is the reference's per-branch history surface (git context
  * denormalized onto invocations, git.py:236-288 + bird_schema.sql:
  * 130-175, grouped by the views at bird_schema.sql:320-400): which
  * branch is generating the errors, and from how many runs/dirty
  * trees. The git context here is SYNTHETIC (injected via the
  * Runner's context override) so the rollup is a deterministic
  * constant the DuckDB oracle can pin literally; RunnerSpec covers
  * capturing REAL git context from a repository.
  */
object RunnerQueries {

  /** Fixture runs: (branch, dirty, importable log content). Parse
    * tallies per fixture are fixed by the gcc_text format, so the
    * expected rollup below is a constant of this table. */
  private val fixtures: Seq[(String, Boolean, String)] = Seq(
    ("main", false, "src/a.c:1:1: error: one\nsrc/a.c:2:1: warning: wa\n"),
    ("main", true, "src/b.c:5:2: error: two\n"),
    ("develop", false, "src/c.c:9:9: warning: only a warning\n"),
    ("develop", false, "src/d.c:3:3: error: three\nsrc/d.c:4:4: error: four\n"),
    ("feature-x", true, "clean build, nothing to parse\n"))

  // One fixture store per Spark application: the import side effect is
  // construction, not the measured query — Bench/Verify re-invocations
  // must re-read the store, not re-import the corpus.
  private val builtRoots = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def fixtureStore(s: SparkSession): EventStore = {
    val root = builtRoots.computeIfAbsent(s.sparkContext.applicationId, _ => {
      val dir = Files.createTempDirectory("q75_store").toString
      val store = new EventStore(s, dir)
      val runner = new Runner(store, new BlobStore(s"$dir/blobs"))
      fixtures.zipWithIndex.foreach { case ((branch, dirty, content), i) =>
        runner.importContent(content, format = "gcc_text",
          tag = Some(s"fixture-$i"),
          context = Some(ExecContext.Captured(
            ExecContext.GitContext(
              commit = Some(f"$i%040x"), branch = Some(branch),
              dirty = Some(dirty)),
            ci = None, environment = None)))
      }
      dir
    })
    new EventStore(s, root)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-branch error rollup: invocations ⟕ events on invocation_id
    // (left, so an event-free run still counts toward its branch),
    // grouped on the denormalized git_branch. The join is the J3
    // shape — at scale the event side shuffles once on its foreign
    // key and the rollup is partial-aggregated map-side.
    "q75_branch_rollup" -> { (s, _) =>
      val store = fixtureStore(s)
      val inv = store.invocations
        .select(col("id"), col("git_branch"), col("git_dirty"))
      val ev = store.events.select(col("invocation_id"), col("severity"))
      inv.join(ev, col("id") === col("invocation_id"), "left")
        .groupBy(col("git_branch"))
        .agg(
          countDistinct(col("id")).as("n_runs"),
          countDistinct(when(col("git_dirty"), col("id"))).as("n_dirty"),
          count(when(col("severity") === "error", 1)).as("n_errors"),
          count(when(col("severity") === "warning", 1)).as("n_warnings"))
        .orderBy(col("git_branch"))
    })

  val oracles: Map[String, String] = Map(
    // The fixture table is constant, so the oracle is its hand-derived
    // rollup: main = 2 runs (1 dirty), errors one+two, 1 warning;
    // develop = 2 clean runs, errors three+four, 1 warning;
    // feature-x = 1 dirty run with no parseable diagnostics.
    "q75_branch_rollup" ->
      """SELECT * FROM (VALUES
        |  ('develop',   CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('feature-x', CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('main',      CAST(2 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(1 AS BIGINT)))
        |  AS t(git_branch, n_runs, n_dirty, n_errors, n_warnings)
        |ORDER BY git_branch""".stripMargin)
}
