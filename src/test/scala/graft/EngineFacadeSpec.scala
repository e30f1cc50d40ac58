package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.exec.{CiGate, Watcher}

/** End-to-end facade specs: GraftEngine, CiGate, Watcher. */
class EngineFacadeSpec extends SparkSpec {

  /** Spin until the watcher thread has registered with the OS watch
    * service — a fixed sleep races thread start under machine load. */
  private def awaitReady(w: Watcher, timeoutMs: Long = 10000): Unit = {
    val t0 = System.currentTimeMillis()
    while (!w.ready && System.currentTimeMillis() - t0 < timeoutMs)
      Thread.sleep(10)
    assert(w.ready, "watcher failed to register within the timeout")
  }

  private val mypyV1 =
    """a.py:1: error: bad type  [assignment]
      |b.py:5: error: missing return  [return]
      |Found 2 errors in 2 files (checked 3 source files)""".stripMargin
  private val mypyV2 =
    """a.py:1: error: bad type  [assignment]
      |c.py:9: error: not callable  [misc]
      |Found 2 errors in 2 files (checked 3 source files)""".stripMargin

  test("engine: import -> query -> sql -> diff round trip") {
    val g = GraftEngine(spark, Files.createTempDirectory("engine").toString)
    val s1 = g.importContent(mypyV1, format = "mypy_text", tag = Some("types"))
    val s2 = g.importContent(mypyV2, format = "mypy_text", tag = Some("types"))
    assert(Seq(s1, s2) === Seq(1L, 2L))

    assert(g.errors(10).count() === 4)
    assert(g.history(10).count() === 2)
    // re-register views to pick up the appended data, then SQL surface
    g.install()
    assert(g.sql("SELECT count(*) AS n FROM blq_events WHERE severity = 'error'")
      .head().getLong(0) === 4L)
    // fluent facade
    assert(g.query.filter("severity" -> "error", "ref_file" -> "a.py").count() === 2)
    // ref resolution via the facade
    assert(g.run("types:2").collect().head.getAs[Long]("run_serial") === 2L)
    // parse_log SQL function is installed
    assert(g.sql(s"SELECT p.* FROM (SELECT 'x.py:1: error: e  [t]' AS c) " +
      "LATERAL VIEW parse_log(c, 'mypy_text') p").count() === 1)
    // formatter renders
    assert(g.show(g.errors(2)).contains("severity"))
  }

  test("engine: output lines and grep over a run's captured body") {
    val g = GraftEngine(spark, Files.createTempDirectory("engine_out").toString)
    val r = g.exec(Seq("sh", "-c",
      "printf 'line one\\nline two\\nERROR in line three\\nline four\\nline five\\n'"))
    val body = g.output(r.invocationId)
    assert(body.exists(_.contains("ERROR in line three")))
    val window = g.outputLines(r.invocationId, "3 +/-1")
      .collect().map(_.getInt(0)).toSeq
    assert(window === Seq(2, 3, 4))
    val hits = g.grepOutput(r.invocationId, "error", ctx = 1)
      .collect().map(x => (x.getInt(0), x.getBoolean(2)))
    assert(hits.toSeq === Seq((2, false), (3, true), (4, false)))
  }

  test("ci gate: new fingerprint fails, fix-only passes") {
    val g = GraftEngine(spark, Files.createTempDirectory("cigate").toString)
    g.importContent(mypyV1, format = "mypy_text")
    g.importContent(mypyV2, format = "mypy_text")
    val gate = new CiGate(g.analytics)
    val v = gate.check(baselineSerial = 1L, candidateSerial = 2L)
    assert(!v.pass)
    assert(v.newErrors === 1 && v.fixedErrors === 1 && v.unchangedErrors === 1)
    assert(v.newSamples.exists(_.contains("not callable")))
    // candidate identical to baseline -> pass
    val v2 = gate.check(1L, 1L)
    assert(v2.pass && v2.newErrors === 0)
  }

  test("ci gate: regression seen in an older non-baseline run still yields samples") {
    // r1 has the errors, r2 (baseline) is clean of them, r3 (candidate)
    // regresses. The verdict counts 'new vs baseline'; the samples must
    // come from that same set — an all-history anti-join would return
    // none here (the fingerprints exist in r1).
    val g = GraftEngine(spark, Files.createTempDirectory("cigate_reg").toString)
    g.importContent(mypyV1, format = "mypy_text") // r1: assignment + return
    g.importContent("c.py:9: error: not callable  [misc]\nFound 1 error in 1 file",
      format = "mypy_text")                       // r2 baseline: others fixed
    g.importContent(mypyV1, format = "mypy_text") // r3 candidate: regressed
    val v = new CiGate(g.analytics).check(baselineSerial = 2L, candidateSerial = 3L)
    assert(!v.pass && v.newErrors === 2)
    assert(v.newSamples.exists(_.contains("bad type")), s"samples: ${v.newSamples}")
  }

  test("watch loop drives re-runs: change -> debounce -> exec -> events") {
    val g = GraftEngine(spark, Files.createTempDirectory("watch_engine").toString)
    val watched = Files.createTempDirectory("watched_src").toString
    val w = new Watcher(watched, debounceMs = 200L)
    val results = scala.collection.mutable.ArrayBuffer.empty[graft.exec.Runner.RunResult]
    val t = new Thread(() => w.run({ changed =>
      results += g.exec(Seq("sh", "-c",
        s"printf '${changed.length} files changed\\nsrc/a.c:1:1: error: broken\\n'; exit 1"),
        tag = Some("watch"), formatHint = "gcc_text")
    }, maxBursts = 1))
    t.start()
    awaitReady(w)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(watched, "a.c"), "x")
    t.join(15000)
    w.stop()
    assert(results.length === 1)
    assert(results.head.status === "FAIL")
    assert(g.errors(5).count() === 1) // parsed event queryable afterwards
  }

  test("watcher: debounces a burst into one callback") {
    val dir = Files.createTempDirectory("watch").toString
    // generous quiet gap: a loaded machine can stall the test thread
    // between the two writes, and a gap shorter than that stall would
    // legitimately split the burst
    val w = new Watcher(dir, debounceMs = 1000L)
    val bursts = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val t = new Thread(() => w.run(b => bursts += b, maxBursts = 1))
    t.start()
    awaitReady(w)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "f1.txt"), "a")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "f2.txt"), "b")
    t.join(15000)
    w.stop()
    assert(bursts.length === 1)
    assert(bursts.head.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
      === Set("f1.txt", "f2.txt"))
  }
}
