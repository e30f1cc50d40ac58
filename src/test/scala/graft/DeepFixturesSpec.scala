package graft

import graft.model.Severity
import graft.parse._

/** Real-world-shaped fixture corpus for the 20 most-used formats:
  * ≥30-line logs with interleaved noise, continuation lines, source
  * echoes and summaries — the shapes the small per-format smoke
  * fixtures in ParserSpec don't exercise. Every test asserts exact
  * event counts and at least three exact ref_file:line anchors, so a
  * silent mis-parse on a realistic variant fails loudly.
  */
class DeepFixturesSpec extends SparkSpec {

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromResource(s"logs/deep/$name")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private def refs(evs: Seq[ParsedEvent]): Set[(String, Int)] =
    evs.flatMap(e => e.ref_file.zip(e.ref_line)).toSet

  test("gcc deep: diagnostics, fatal, modern ld undefined references") {
    val evs = GccParser.parse(fixture("gcc_build.log"))
    assert(evs.count(_.severity == Severity.Error) === 5)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == "note") === 1)
    val r = refs(evs)
    assert(r.contains(("src/main.c", 57)) && r.contains(("src/main.c", 63)))
    assert(r.contains(("src/util.c", 18)) && r.contains(("src/legacy.c", 101)))
    // both ld forms: bare relocation and /usr/bin/ld:-prefixed
    val link = evs.filter(_.category.contains("link"))
    assert(link.length === 2 && link.forall(_.ref_file === Some("net.c")))
    assert(link.exists(_.message.get.contains("ssl_init")))
    assert(FormatRegistry.detect(fixture("gcc_build.log")).map(_.format) === Some("gcc_text"))
  }

  test("mypy deep: codes, columned refs, multi-line note blocks") {
    val evs = MypyParser.parse(fixture("mypy_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 16)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.count(_.severity == "note") === 7)
    val r = refs(evs)
    assert(r.contains(("src/app/models.py", 42)))
    assert(r.contains(("src/app/views.py", 104)))
    assert(r.contains(("src/app/api/v2/endpoints.py", 164)))
    val columned = evs.find(e => e.ref_line.contains(58)).get
    assert(columned.ref_column === Some(17) && columned.code === Some("arg-type"))
    assert(FormatRegistry.detect(fixture("mypy_run.txt")).map(_.format) === Some("mypy_text"))
  }

  test("pytest deep: verbose lines + summary dedup to one event per test") {
    val evs = PytestParser.parse(fixture("pytest_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 5)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    assert(evs.count(_.severity == Severity.Info) === 1) // SKIPPED
    assert(evs.length === 8)
    // the failure event carries the short-summary message, not the bare
    // verbose line
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.find(_.test_name.contains("test_token_refresh")).get
      .message.get.contains("assert 1800 == 3600"))
    assert(fails.find(_.test_name.contains("test_delete_item")).get
      .message.get.contains("KeyError"))
    assert(evs.forall(_.ref_file.exists(_.startsWith("tests/"))))
    assert(FormatRegistry.detect(fixture("pytest_run.txt")).map(_.format) === Some("pytest_text"))
  }

  test("eslint deep: scoped plugin rules, files carried across blocks") {
    val evs = EslintParser.parse(fixture("eslint_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 9)
    assert(evs.count(_.severity == Severity.Warning) === 4)
    val r = refs(evs)
    assert(r.contains(("/work/src/index.js", 12)))
    assert(r.contains(("/work/src/components/App.jsx", 61)))
    assert(r.contains(("/work/src/lib/api.ts", 29)))
    assert(evs.exists(_.rule.contains("react-hooks/rules-of-hooks")))
    assert(evs.exists(_.rule.contains("@typescript-eslint/no-floating-promises")))
    assert(FormatRegistry.detect(fixture("eslint_run.txt")).map(_.format) === Some("eslint_text"))
  }

  test("cargo deep: E-codes with --> locations through annotated snippets") {
    val evs = CargoParser.parse(fixture("cargo_build.log"))
    assert(evs.count(_.severity == Severity.Error) === 4)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    val r = refs(evs)
    assert(r.contains(("src/cli.rs", 4)) && r.contains(("src/main.rs", 27)))
    assert(r.contains(("src/server.rs", 9)) && r.contains(("src/worker.rs", 88)))
    assert(evs.find(_.code.contains("E0308")).get.ref_column === Some(22))
    // the two summary errors carry no location
    assert(evs.count(e => e.severity == Severity.Error && e.ref_file.isEmpty) === 2)
    assert(FormatRegistry.detect(fixture("cargo_build.log")).map(_.format) === Some("cargo_build"))
  }

  test("tsc deep: TS codes across ts/tsx/d.ts, watch-mode noise ignored") {
    val evs = TscParser.parse(fixture("tsc_run.txt"))
    assert(evs.length === 12)
    assert(evs.forall(_.severity == Severity.Error))
    val r = refs(evs)
    assert(r.contains(("src/app.ts", 10)))
    assert(r.contains(("src/components/Table.tsx", 60)))
    assert(r.contains(("src/legacy/vendor.d.ts", 2)))
    assert(evs.find(_.ref_line.contains(24)).get.code === Some("TS2339"))
    assert(FormatRegistry.detect(fixture("tsc_run.txt")).map(_.format) === Some("tsc_text"))
  }

  test("go test deep: subtests, RUN/CONT-tracked log locations, skip") {
    val evs = GoTestParser.parse(fixture("gotest_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 4)
    assert(evs.count(_.severity == Severity.TestFail) === 4)
    assert(evs.count(_.severity == Severity.Info) === 1) // SKIP
    val locs = evs.filter(_.ref_file.isDefined)
    assert(refs(locs) === Set(("server_test.go", 88), ("metrics_test.go", 41),
      ("metrics_test.go", 45), ("routing_test.go", 133)))
    // attribution: log lines BEFORE the --- FAIL line belong to the
    // RUN/CONT test, not the previously finished one
    assert(locs.find(_.ref_file.contains("metrics_test.go")).get
      .test_name === Some("TestMetricsFlush"))
    assert(locs.find(_.ref_file.contains("routing_test.go")).get
      .test_name === Some("TestRouting"))
    assert(locs.find(_.ref_file.contains("server_test.go")).get
      .test_name === Some("TestServerStart/with_tls"))
    assert(FormatRegistry.detect(fixture("gotest_run.txt")).map(_.format) === Some("go_test"))
  }

  test("maven deep: javac refs, folded symbol/location detail, boilerplate dropped") {
    val evs = MavenParser.parse(fixture("maven_build.txt"))
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    val r = refs(evs)
    assert(r.contains(("/work/src/main/java/com/example/inv/StockService.java", 66)))
    assert(r.contains(("/work/src/main/java/com/example/inv/PriceRule.java", 12)))
    assert(r.contains(("/work/src/main/java/com/example/inv/audit/AuditLog.java", 29)))
    // the two [ERROR]-indented continuation lines folded into the
    // cannot-find-symbol event
    val cfs = evs.find(_.message.exists(_.startsWith("cannot find symbol"))).get
    assert(cfs.message.get.contains("countBySkuu"))
    assert(cfs.message.get.contains("StockRepository"))
    assert(cfs.log_line_end.exists(_ > cfs.log_line_start.get))
    // -> [Help 1] / re-run advice never becomes events
    assert(!evs.exists(_.message.exists(_.contains("[Help"))))
    assert(FormatRegistry.detect(fixture("maven_build.txt")).map(_.format) === Some("maven_build"))
  }

  test("gradle deep: kotlinc diags, failed task, build failure") {
    val evs = GradleParser.parse(fixture("gradle_build.txt"))
    assert(evs.count(_.severity == Severity.Error) === 5)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    val r = refs(evs)
    assert(r.contains(("/work/core/src/main/kotlin/com/example/core/Store.kt", 44)))
    assert(r.contains(("/work/core/src/main/kotlin/com/example/core/Store.kt", 51)))
    assert(r.contains(("/work/core/src/main/kotlin/com/example/core/journal/Journal.kt", 12)))
    assert(evs.exists(e => e.test_name.contains(":core:compileKotlin")))
    assert(FormatRegistry.detect(fixture("gradle_build.txt")).map(_.format) === Some("gradle_build"))
  }

  test("junit surefire deep: FAILURE/ERROR results with exception messages") {
    val evs = JunitTextParser.parse(fixture("junit_surefire.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 6)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.find(_.test_name.contains("com.example.inv.StockServiceTest.testReserve"))
      .get.message.get.contains("expected:<5> but was:<3>"))
    assert(fails.find(_.test_name.contains("com.example.inv.PriceRuleTest.testCompound"))
      .get.message.get.contains("NullPointerException"))
    // three failing suite/total summaries + one clean suite summary
    assert(evs.count(e => e.category.contains("test-summary") &&
      e.severity == Severity.Error) === 3)
    assert(evs.count(e => e.category.contains("test-summary") &&
      e.severity == Severity.Info) === 1)
    assert(FormatRegistry.detect(fixture("junit_surefire.txt")).map(_.format) === Some("junit_text"))
  }

  test("jest deep: suite files carried onto ticks, failure blocks ignored") {
    val evs = JestParser.parse(fixture("jest_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 6)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    assert(evs.count(_.severity == Severity.Error) === 1) // FAIL suite line
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.forall(_.ref_file.contains("src/components/Modal.test.tsx")))
    assert(fails.map(_.test_name.get).toSet === Set("closes on escape", "traps focus"))
    assert(evs.filter(_.severity == Severity.TestPass)
      .count(_.ref_file.contains("src/lib/util.test.ts")) === 2)
    assert(FormatRegistry.detect(fixture("jest_run.txt")).map(_.format) === Some("jest_text"))
  }

  test("mocha deep: bottom failure list enriches inline numbered failures") {
    val evs = MochaParser.parse(fixture("mocha_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 6)
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.length === 3) // deduped by failure number
    // names are the suite-qualified bottom-list form, messages real
    assert(fails.find(_.test_name.contains("Calculator subtracts below zero"))
      .get.message.get.contains("expected -1 to equal 1"))
    assert(fails.find(_.test_name.contains("Calculator rejects division by zero"))
      .get.message.get.contains("promise resolved"))
    assert(fails.find(_.test_name.contains("HttpClient retries on 503"))
      .get.message.get.contains("timeout of 2000ms"))
    assert(FormatRegistry.detect(fixture("mocha_run.txt")).map(_.format) === Some("mocha_chai_text"))
  }

  test("pylint deep: E/F→error, W→warning, C/R→info, symbolic rules") {
    val evs = PylintParser.parse(fixture("pylint_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 6)
    assert(evs.count(_.severity == Severity.Warning) === 6)
    assert(evs.count(_.severity == Severity.Info) === 6)
    val r = refs(evs)
    assert(r.contains(("app/models.py", 42)))
    assert(r.contains(("app/tasks.py", 12)))
    assert(r.contains(("app/admin/site.py", 23)))
    // message keeps interior parens; symbolic rule is the trailing one
    val locals = evs.find(_.code.contains("R0914")).get
    assert(locals.message === Some("Too many local variables (21/15)"))
    assert(locals.rule === Some("too-many-locals"))
    assert(FormatRegistry.detect(fixture("pylint_run.txt")).map(_.format) === Some("pylint_text"))
  }

  test("flake8 deep: E/F vs W/C severities with exact positions") {
    val evs = Flake8Parser.parse(fixture("flake8_run.txt"))
    assert(evs.length === 28)
    assert(evs.count(_.severity == Severity.Error) === 23)
    assert(evs.count(_.severity == Severity.Warning) === 5)
    val r = refs(evs)
    assert(r.contains(("app/models.py", 44)))
    assert(r.contains(("app/tasks.py", 47)))
    assert(r.contains(("app/api/v2/endpoints.py", 102)))
    assert(evs.find(e => e.ref_file.contains("app/serializers.py") &&
      e.ref_line.contains(14)).get.code === Some("C901"))
    assert(FormatRegistry.detect(fixture("flake8_run.txt")).map(_.format) === Some("flake8_text"))
  }

  test("clippy deep: lint names, E-codes and notes in dense format") {
    val evs = ClippyDenseParser.parse(fixture("clippy_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 4)
    assert(evs.count(_.severity == Severity.Warning) === 14)
    assert(evs.count(_.severity == "note") === 2)
    val r = refs(evs)
    assert(r.contains(("src/main.rs", 27)))
    assert(r.contains(("src/handlers/items.rs", 61)))
    assert(r.contains(("src/metrics.rs", 30)))
    assert(evs.find(_.ref_line.contains(61)).get.code === Some("E0382"))
    assert(evs.exists(_.rule.contains("clippy::too_many_arguments")))
    assert(FormatRegistry.detect(fixture("clippy_run.txt")).map(_.format) === Some("clippy_dense"))
  }

  test("javac deep: errors without columns, detail and echo lines skipped") {
    val evs = JavacParser.parse(fixture("javac_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 5)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    val r = refs(evs)
    assert(r.contains(("src/com/example/inv/Invoice.java", 12)))
    assert(r.contains(("src/com/example/inv/StockService.java", 84)))
    assert(r.contains(("src/com/example/inv/audit/AuditLog.java", 29)))
    assert(evs.find(_.ref_line.contains(47)).get.message.get.contains("[deprecation]"))
    assert(FormatRegistry.detect(fixture("javac_run.txt")).map(_.format) === Some("javac_text"))
  }

  test("rubocop deep: cop severities incl. .rake files and [Correctable]") {
    val evs = RubocopParser.parse(fixture("rubocop_run.txt"))
    assert(evs.length === 14)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 4)
    assert(evs.count(_.severity == Severity.Info) === 8)
    val r = refs(evs)
    assert(r.contains(("app/models/order.rb", 8)))
    assert(r.contains(("app/services/billing.rb", 14)))
    assert(r.contains(("lib/tasks/export.rake", 28)))
    val correctable = evs.find(e => e.ref_file.contains("app/models/order.rb") &&
      e.ref_line.contains(22)).get
    assert(correctable.rule === Some("Style/StringLiterals"))
    assert(correctable.message.get.startsWith("Prefer single-quoted"))
    assert(FormatRegistry.detect(fixture("rubocop_run.txt")).map(_.format) === Some("rubocop_text"))
  }

  test("golangci-lint deep: linter attribution through echoed source lines") {
    val evs = GolangciParser.parse(fixture("golangci_run.txt"))
    assert(evs.length === 8)
    assert(evs.forall(_.severity == Severity.Warning))
    val r = refs(evs)
    assert(r.contains(("main.go", 26)))
    assert(r.contains(("server/handler.go", 102)))
    assert(r.contains(("store/pg.go", 55)))
    assert(evs.find(_.ref_line.contains(102)).get.rule === Some("staticcheck"))
    assert(evs.count(_.rule.contains("ineffassign")) === 2)
    assert(FormatRegistry.detect(fixture("golangci_run.txt")).map(_.format) === Some("golangci_lint"))
  }

  test("sbt deep: multi-line scalac messages, phase failure event") {
    val evs = SbtParser.parse(fixture("sbt_compile.txt"))
    assert(evs.count(_.severity == Severity.Error) === 4)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    val r = refs(evs)
    assert(r.contains(("/work/svc/src/main/scala/com/example/svc/Store.scala", 44)))
    assert(r.contains(("/work/svc/src/main/scala/com/example/svc/Store.scala", 51)))
    assert(r.contains(("/work/svc/src/main/scala/com/example/svc/Journal.scala", 12)))
    assert(evs.exists(_.message.exists(_.contains("Compilation failed"))))
    assert(FormatRegistry.detect(fixture("sbt_compile.txt")).map(_.format) === Some("sbt_text"))
  }

  test("phpstan deep: raw file:line:message across namespaced messages") {
    val evs = PhpstanParser.parse(fixture("phpstan_run.txt"))
    assert(evs.length === 14)
    assert(evs.forall(_.severity == Severity.Error))
    val r = refs(evs)
    assert(r.contains(("/work/shop/src/Controller/OrderController.php", 58)))
    assert(r.contains(("/work/shop/src/Entity/Order.php", 19)))
    assert(r.contains(("/work/shop/src/Legacy/compat.php", 9)))
    assert(evs.find(_.ref_line.contains(91)).get
      .message.get.contains("expects int, string given"))
    assert(FormatRegistry.detect(fixture("phpstan_run.txt")).map(_.format) === Some("phpstan_raw"))
  }
}
