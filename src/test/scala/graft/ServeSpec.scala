package graft

import java.nio.file.Files
import graft.api.Serve

/** Serving-surface dispatch: the MCP-tool mapping over the engine
  * facade (reference serve.py tool registry). */
class ServeSpec extends SparkSpec {

  private def mkServe(): Serve = {
    val g = GraftEngine(spark, Files.createTempDirectory("serve").toString)
    g.importContent(
      """a.py:1: error: bad type  [assignment]
        |b.py:5: warning: unused import  [unused-import]
        |Found 1 error in 1 file""".stripMargin, format = "mypy_text",
      tag = Some("types"))
    g.importContent(
      """a.py:1: error: bad type  [assignment]
        |c.py:9: error: not callable  [misc]
        |Found 2 errors in 2 files""".stripMargin, format = "mypy_text",
      tag = Some("types"))
    new Serve(g)
  }

  test("query tool: filter mini-language + select + limit → json") {
    val s = mkServe()
    val out = s.call("query", Map(
      "filter" -> "severity=error", "select" -> "message,ref_file", "limit" -> "10"))
    assert(out.contains("\"message\"") && out.contains("bad type"))
    assert(!out.contains("unused import")) // warning filtered out
  }

  test("errors / history / status / summary / events tools return rows") {
    val s = mkServe()
    assert(s.call("errors", Map("limit" -> "5")).contains("not callable"))
    assert(s.call("history").contains("\"run_serial\""))
    assert(s.call("status").contains("[FAIL]"))
    assert(s.call("summary").contains("mypy"))
    assert(s.call("events", Map("ref" -> "types:2")).contains("not callable"))
  }

  test("diff and ci_check tools compare runs") {
    val s = mkServe()
    val diff = s.call("diff", Map("run1" -> "1", "run2" -> "2"))
    assert(diff.contains("delta"))
    val ci = s.call("ci_check", Map("baseline" -> "1", "candidate" -> "2"))
    assert(ci.contains("\"pass\":false"))
    assert(ci.contains("\"new_errors\":1"))
    assert(ci.contains("not callable")) // sample from the new set
  }

  test("report tool renders markdown; sql tool queries views") {
    val s = mkServe()
    assert(s.call("report").contains("#"))
    val out = s.call("sql", Map(
      "q" -> "SELECT count(*) AS n FROM blq_events WHERE severity = 'error'"))
    assert(out.contains("\"n\": 3") || out.contains("\"n\":3"))
  }

  test("import tool: glob path dispatches the distributed ingest") {
    val s = mkServe()
    val dir = Files.createTempDirectory("serve_logs")
    Files.writeString(dir.resolve("one.log"), "x.c:1:2: error: nope\n")
    Files.writeString(dir.resolve("two.log"), "y.c:3:4: warning: meh\n")
    val out = s.call("import", Map("path" -> s"$dir/*.log", "format" -> "gcc_text"))
    assert(out.contains("\"errors\":1") && out.contains("\"warnings\":1"))
  }

  test("unknown tool and malformed args degrade to json errors") {
    val s = mkServe()
    assert(s.call("frobnicate").contains("\"error\""))
    assert(s.call("diff", Map("run1" -> "1")).contains("\"error\""))
    assert(s.call("events", Map("ref" -> "nope:99")).contains("\"error\""))
    // engine-level exceptions (AnalysisException, parse errors, bad
    // paths, bad numbers) must also come back as error documents
    assert(s.call("query", Map("filter" -> "sevrity=error")).contains("\"error\""))
    assert(s.call("sql", Map("q" -> "SELEC 1")).contains("\"error\""))
    assert(s.call("import", Map("path" -> "/nope/nowhere/*.log")).contains("\"error\""))
    assert(s.call("errors", Map("limit" -> "many")).contains("\"error\""))
  }

  test("query tool honors limits above the formatter default (100)") {
    val g = GraftEngine(spark, Files.createTempDirectory("serve_big").toString)
    val lines = (1 to 120).map(i => s"f$i.py:$i: error: broken $i  [misc]")
    g.importContent(lines.mkString("\n"), format = "mypy_text")
    val s = new Serve(g)
    val out = s.call("query", Map("select" -> "ref_file", "limit" -> "150"))
    val rows = "\"ref_file\"".r.findAllIn(out).length
    assert(rows === 120, s"expected all 120 rows, got $rows")
  }
}
