package graft

import graft.model.Severity
import graft.parse._
import org.apache.spark.sql.functions._

class ParserSpec extends SparkSpec {

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromResource(s"logs/$name")
    try src.mkString finally src.close()
  }

  test("gcc: errors/warnings with file:line:col, linker + fatal") {
    val evs = GccParser.parse(fixture("gcc_errors.log"))
    assert(evs.length === 6)
    val first = evs.head
    assert(first.severity === Severity.Error)
    assert(first.ref_file === Some("src/main.c"))
    assert(first.ref_line === Some(15) && first.ref_column === Some(5))
    assert(evs.count(_.severity == Severity.Warning) === 1)
    assert(evs.count(_.category.contains("link")) === 2)
    // fatal error mapped to error severity
    assert(evs.last.severity === Severity.Error)
    assert(evs.map(_.event_index) === (0L until 6L))
  }

  test("pytest: test results with test_name, pass/fail severities") {
    val evs = PytestParser.parse(fixture("pytest_failures.txt"))
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    assert(evs.count(_.severity == Severity.TestPass) === 1)
    val failed = evs.filter(_.severity == Severity.TestFail)
    assert(failed.map(_.test_name).flatten.toSet === Set("test_parse", "test_store"))
    assert(failed.head.message.get.contains("AssertionError"))
  }

  test("mypy: error codes populated, stable fingerprints group repeats") {
    val evs = MypyParser.parse(fixture("mypy_output.txt"))
    assert(evs.length === 5)
    assert(evs.head.code === Some("assignment"))
    // repeated template on same file → same fingerprint after DF stage
    val df = LogSource.parseContent(spark, fixture("mypy_output.txt"), "mypy_text")
    val byFp = df.filter(col("severity") === "error")
      .groupBy(col("fingerprint")).count().collect()
    assert(byFp.exists(_.getLong(1) === 2)) // src/app.py [assignment] x2
  }

  test("eslint: rule field populated, file carried from header") {
    val evs = EslintParser.parse(fixture("eslint_output.txt"))
    assert(evs.length === 3)
    assert(evs.head.rule === Some("no-unused-vars"))
    assert(evs.head.ref_file === Some("/app/src/index.js"))
    assert(evs(2).ref_file === Some("/app/src/util.js"))
    assert(evs(2).severity === Severity.Warning)
  }

  test("cargo: E-codes and --> locations") {
    val evs = CargoParser.parse(fixture("cargo_build.log"))
    val e = evs.find(_.code.contains("E0308")).get
    assert(e.ref_file === Some("src/main.rs"))
    assert(e.ref_line === Some(4) && e.ref_column === Some(5))
    assert(evs.exists(_.severity == Severity.Warning))
  }

  test("make: target errors with exit codes") {
    val evs = MakeParser.parse(fixture("make_fail.log"))
    assert(evs.length === 3)
    assert(evs.head.message.get.contains("main.o"))
    assert(evs.head.code === Some("1"))
    assert(evs(2).message.get.startsWith("No rule to make target"))
  }

  test("auto-detect picks the right format per fixture") {
    assert(FormatRegistry.detect(fixture("gcc_errors.log")).map(_.format) === Some("gcc_text"))
    assert(FormatRegistry.detect(fixture("mypy_output.txt")).map(_.format) === Some("mypy_text"))
    assert(FormatRegistry.detect(fixture("pytest_failures.txt")).map(_.format) === Some("pytest_text"))
    assert(FormatRegistry.detect(fixture("eslint_output.txt")).map(_.format) === Some("eslint_text"))
    assert(FormatRegistry.detect(fixture("cargo_build.log")).map(_.format) === Some("cargo_build"))
    assert(FormatRegistry.detect(fixture("make_fail.log")).map(_.format) === Some("make_error"))
  }

  test("auto on unknown content: zero or generic events, no crash") {
    val evs = FormatRegistry.parse(fixture("mixed_unknown.log"), "auto")
    assert(evs.isEmpty || evs.forall(_.tool_name.contains("generic")))
  }

  test("comma-separated hints tried in order with auto fallback") {
    // gcc hint on mypy content parses mypy-looking lines via gcc regex? No —
    // mypy lines lack the col, gcc still matches file:line: pattern... the
    // contract is: first format yielding events wins.
    val evs = FormatRegistry.parse(fixture("cargo_build.log"), "eslint_text,cargo_build")
    assert(evs.nonEmpty && evs.head.tool_name === Some("cargo"))
    // unknown format name falls through to auto
    val evs2 = FormatRegistry.parse(fixture("gcc_errors.log"), "no_such_format")
    assert(evs2.nonEmpty && evs2.head.tool_name === Some("gcc"))
  }

  test("command hints: longest pattern wins, unknown → auto") {
    assert(FormatRegistry.detectFormatFromCommand("python -m pytest tests/") === "pytest_text")
    assert(FormatRegistry.detectFormatFromCommand("mypy src/") === "mypy_text")
    assert(FormatRegistry.detectFormatFromCommand("cargo build --release") === "cargo_build")
    assert(FormatRegistry.detectFormatFromCommand("unknown-tool") === "auto")
  }

  test("distributed read: wholetext scan + executor-side parse") {
    val dir = getClass.getResource("/logs").getPath
    val df = LogSource.readLogFiles(spark, s"$dir/*.log", "auto")
    assert(df.columns.contains("log_file") && df.columns.contains("fingerprint"))
    val byFile = df.groupBy(col("log_file")).count().collect()
      .map(r => r.getString(0).split('/').last -> r.getLong(1)).toMap
    assert(byFile("gcc_errors.log") === 6)
    assert(byFile("cargo_build.log") === 3)
    assert(byFile("make_fail.log") === 3)
    // errors carry fingerprints, notes don't
    val fp = df.filter(col("severity") === "error").select("fingerprint").collect()
    assert(fp.forall(!_.isNullAt(0)))
  }
}
