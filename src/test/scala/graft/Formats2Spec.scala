package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.parse._

/** Pure-JVM parser specs for the second wave of formats (no Spark). */
class Formats2Spec extends AnyFunSuite {

  test("tsc: error/warning with code and position") {
    val log =
      """src/app.ts(10,5): error TS2322: Type 'string' is not assignable to type 'number'.
        |src/util.ts(3,1): warning TS6133: 'x' is declared but never used.
        |Found 1 error.""".stripMargin
    val evs = TscParser.parse(log)
    assert(evs.length === 2)
    assert(evs.head.severity === "error")
    assert(evs.head.code === Some("TS2322"))
    assert(evs.head.ref_file === Some("src/app.ts"))
    assert(evs.head.ref_line === Some(10))
    assert(FormatRegistry.detect(log).map(_.format) === Some("tsc_text"))
  }

  test("go test: pass/fail results with assertion locations") {
    val log =
      """=== RUN   TestAdd
        |--- PASS: TestAdd (0.00s)
        |=== RUN   TestDiv
        |    div_test.go:42: expected 2, got 3
        |--- FAIL: TestDiv (0.03s)
        |FAIL
        |FAIL	example.com/calc	0.041s""".stripMargin
    val evs = GoTestParser.parse(log)
    assert(evs.map(_.severity) === Seq("test_pass", "error", "test_fail"))
    assert(evs(1).ref_file === Some("div_test.go"))
    assert(evs(2).test_name === Some("TestDiv"))
    assert(FormatRegistry.detect(log).map(_.format) === Some("go_test"))
  }

  test("maven: javac diagnostics with [line,col] and plain errors") {
    val log =
      """[INFO] Compiling 3 source files
        |[ERROR] /src/main/java/App.java:[10,8] cannot find symbol
        |[WARNING] /src/main/java/Util.java:[5] deprecated API
        |[ERROR] Failed to execute goal org.apache.maven.plugins:compile
        |[INFO] BUILD FAILURE""".stripMargin
    val evs = MavenParser.parse(log)
    assert(evs.length === 3)
    assert(evs.head.ref_file === Some("/src/main/java/App.java"))
    assert(evs.head.ref_line === Some(10))
    assert(evs.head.ref_column === Some(8))
    assert(evs(1).severity === "warning")
    assert(evs(2).ref_file.isEmpty)
  }

  test("jest: suite + per-test results tied to current file") {
    val log =
      """PASS src/sum.test.ts
        |  ✓ adds numbers (3 ms)
        |FAIL src/div.test.ts
        |  ✓ divides evenly (1 ms)
        |  ✕ handles zero (12 ms)""".stripMargin
    val evs = JestParser.parse(log)
    assert(evs.map(_.severity) ===
      Seq("test_pass", "error", "test_pass", "test_fail"))
    assert(evs.last.test_name === Some("handles zero"))
    assert(evs.last.ref_file === Some("src/div.test.ts"))
  }

  test("python traceback: exception with last frame location and span") {
    val log =
      """some output
        |Traceback (most recent call last):
        |  File "app.py", line 12, in main
        |    run()
        |  File "core.py", line 7, in run
        |    1/0
        |ZeroDivisionError: division by zero
        |more output""".stripMargin
    val evs = PythonTracebackParser.parse(log)
    assert(evs.length === 1)
    assert(evs.head.code === Some("ZeroDivisionError"))
    assert(evs.head.ref_file === Some("core.py"))
    assert(evs.head.ref_line === Some(7))
    assert(evs.head.log_line_start === Some(2))
    assert(evs.head.log_line_end === Some(7))
  }

  test("auto-detect keeps older formats winning on their own logs") {
    val gcc = "src/main.c:15:5: error: expected ';'"
    assert(FormatRegistry.detect(gcc).map(_.format) === Some("gcc_text"))
    val mypy = "src/a.py:12: error: Incompatible types [assignment]\nFound 1 error in 1 file"
    assert(FormatRegistry.detect(mypy).map(_.format) === Some("mypy_text"))
  }
}
