package graft

import graft.model.Severity
import graft.parse._

/** Real-world-shaped fixture corpus, tier 4c — the final 17 formats:
  * cucumber, dart analyze, helm lint, k6, karma, kotlinc, luacheck,
  * markdownlint, minitest, ocaml, puppet, R CMD check, semgrep, TAP,
  * python unittest, zig, and the generic fallback. With this tier all
  * 105 registry formats carry a ≥30-line (or format-natural) realistic
  * fixture with exact counts, exact anchors and a detect() assertion.
  */
class DeepFixturesSpec6 extends SparkSpec {

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromResource(s"logs/deep/$name")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private def detected(name: String): Option[String] =
    FormatRegistry.detect(fixture(name)).map(_.format)

  test("cucumber deep: failing-scenario reruns, failed-summary severity") {
    val evs = CucumberParser.parse(fixture("cucumber_run.txt"))
    assert(evs.length === 3) // 2 failing scenarios + 1 scenarios summary
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.map(_.test_name.get).toSet ===
      Set("Pay with saved card", "Refund a returned item"))
    assert(fails.map(e => (e.ref_file.get, e.ref_line.get)).toSet ===
      Set(("features/checkout.feature", 12), ("features/returns.feature", 8)))
    val summary = evs.find(_.severity == Severity.Error).get
    assert(summary.message === Some("8 scenarios (2 failed, 6 passed)"))
    assert(detected("cucumber_run.txt") === Some("cucumber_text"))
  }

  test("dart analyze deep: bullet diagnostics with rule ids across severities") {
    val evs = DartParser.parse(fixture("dart_analyze.txt"))
    assert(evs.length === 12)
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.count(_.severity == Severity.Info) === 6)
    val undef = evs.find(_.rule.contains("undefined_identifier")).get
    assert(undef.ref_file === Some("lib/cart/total.dart"))
    assert(undef.ref_line === Some(42) && undef.ref_column === Some(19))
    assert(undef.message === Some("Undefined name 'subtotal'"))
    assert(detected("dart_analyze.txt") === Some("dart_analyze"))
  }

  test("helm lint deep: per-chart context carried onto diagnostics") {
    val evs = HelmParser.parse(fixture("helm_lint.txt"))
    assert(evs.length === 11)
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.count(_.severity == Severity.Info) === 5)
    val sts = evs.find(_.message.exists(_.contains("serviceName"))).get
    assert(sts.rule === Some("charts/session-store")) // chart context
    assert(sts.ref_file === Some("templates/statefulset.yaml"))
    assert(evs.filter(_.rule.contains("charts/shop-api"))
      .count(_.severity == Severity.Error) === 2)
    assert(detected("helm_lint.txt") === Some("helm_lint"))
  }

  test("k6 deep: check marks as test results, named metrics as info") {
    val evs = K6Parser.parse(fixture("k6_run.txt"))
    assert(evs.length === 9)
    assert(evs.count(_.severity == Severity.TestPass) === 3)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    assert(evs.count(_.severity == Severity.Info) === 4) // the four named metrics
    assert(evs.filter(_.severity == Severity.TestFail).map(_.test_name.get).toSet ===
      Set("response time < 500ms", "checkout succeeds"))
    assert(evs.exists(e => e.rule.contains("http_req_failed") &&
      e.message.exists(_.contains("2.99%"))))
    assert(detected("k6_run.txt") === Some("k6_text"))
  }

  test("karma deep: per-browser failures with expectation messages, executed summaries") {
    val evs = KarmaParser.parse(fixture("karma_run.txt"))
    assert(evs.length === 5) // 3 FAILED + 2 per-browser summaries
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.length === 3)
    assert(fails.count(_.rule.contains("Chrome 126.0.0 (Linux)")) === 2)
    assert(fails.count(_.rule.contains("Firefox 127.0 (Linux)")) === 1)
    assert(fails.exists(_.message === Some("Expected 3 to equal 2.")))
    val summaries = evs.filter(_.severity == Severity.Error)
    assert(summaries.map(_.message.get).toSet ===
      Set("executed 5, 2 failed", "executed 5, 1 failed"))
    assert(detected("karma_run.txt") === Some("karma_text"))
  }

  test("kotlinc deep: gcc-shaped diagnostics won by the .kt anchor") {
    val evs = KotlincParser.parse(fixture("kotlinc_build.txt"))
    assert(evs.length === 24)
    assert(evs.count(_.severity == Severity.Error) === 10)
    assert(evs.count(_.severity == Severity.Warning) === 14)
    val unresolved = evs.find(_.message.contains("unresolved reference: subtotal")).get
    assert(unresolved.ref_file === Some("src/main/kotlin/com/shop/cart/Total.kt"))
    assert(unresolved.ref_line === Some(42) && unresolved.ref_column === Some(19))
    assert(evs.exists(_.ref_file.exists(_.endsWith("Settings.kts")))) // .kts too
    // the .kt anchor must beat the identically-shaped gcc parser
    assert(detected("kotlinc_build.txt") === Some("kotlinc_text"))
  }

  test("luacheck deep: per-file blocks, syntax errors split from warnings") {
    val evs = LuacheckParser.parse(fixture("luacheck_run.txt"))
    assert(evs.length === 14) // matches its own Total line
    assert(evs.count(_.severity == Severity.Error) === 1)
    assert(evs.count(_.severity == Severity.Warning) === 13)
    val syn = evs.find(_.severity == Severity.Error).get
    assert(syn.ref_file === Some("app/db.lua") && syn.ref_line === Some(88))
    assert(syn.message === Some("syntax error near '}'"))
    assert(detected("luacheck_run.txt") === Some("luacheck_text"))
  }

  test("markdownlint deep: MD codes + aliases, optional column, .markdown too") {
    val evs = MarkdownlintParser.parse(fixture("markdownlint_run.txt"))
    assert(evs.length === 30)
    assert(evs.forall(_.severity == Severity.Warning))
    val ll = evs.filter(_.code.contains("MD013"))
    assert(ll.length === 8)
    assert(ll.forall(_.rule.contains("line-length")))
    // column-less form still anchors
    val noCol = evs.find(e => e.ref_file.contains("README.md") &&
      e.ref_line.contains(31)).get
    assert(noCol.ref_column.isEmpty)
    assert(noCol.rule === Some("first-line-heading/first-line-h1"))
    assert(evs.exists(_.ref_file.contains("docs/architecture.markdown")))
    assert(detected("markdownlint_run.txt") === Some("markdownlint_text"))
  }

  test("minitest deep: numbered failure/error blocks, run summaries by verdict") {
    val evs = MinitestParser.parse(fixture("minitest_run.txt"))
    assert(evs.length === 4) // 2 failures + 2 summaries
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.map(_.test_name.get).toSet ===
      Set("CartTest#test_total_with_discount", "InventoryTest#test_restock_on_refund"))
    assert(fails.exists(_.message === Some("Expected 47.5 to equal 42.75.")))
    assert(fails.exists(_.message === Some("KeyError: key not found: \"sku-991\"")))
    assert(fails.forall(_.ref_file.exists(_.startsWith("test/"))))
    assert(evs.count(_.severity == Severity.Error) === 1) // red summary
    assert(evs.count(_.severity == Severity.Info) === 1) // green summary
    assert(detected("minitest_run.txt") === Some("minitest_text"))
  }

  test("ocaml deep: File/Error pairs through code echoes, numbered warnings") {
    val evs = OcamlParser.parse(fixture("ocaml_build.txt"))
    assert(evs.length === 8)
    assert(evs.count(_.severity == Severity.Error) === 4)
    assert(evs.count(_.severity == Severity.Warning) === 4)
    val unbound = evs.find(_.message.contains("Unbound value sesion")).get
    assert(unbound.ref_file === Some("lib/api/checkout.ml"))
    assert(unbound.ref_line === Some(104) && unbound.ref_column === Some(12))
    assert(evs.exists(_.message.contains("unused variable locale.")))
    assert(detected("ocaml_build.txt") === Some("ocaml_text"))
  }

  test("puppet deep: (file, line, column) suffix diagnostics among notices") {
    val evs = PuppetParser.parse(fixture("puppet_apply.txt"))
    assert(evs.length === 7)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 5)
    val syn = evs.find(_.message.exists(_.startsWith("Could not parse"))).get
    assert(syn.ref_file.exists(_.endsWith("metrics.pp")))
    assert(syn.ref_line === Some(44) && syn.ref_column === Some(1))
    // column-less deprecation form
    assert(evs.exists(e => e.ref_file.exists(_.endsWith("params.pp")) &&
      e.ref_line.contains(9) && e.ref_column.isEmpty))
    assert(detected("puppet_apply.txt") === Some("puppet_text"))
  }

  test("R CMD check deep: non-OK check verdicts + status summary") {
    val evs = RCheckParser.parse(fixture("r_check.txt"))
    assert(evs.length === 5)
    assert(evs.count(_.severity == Severity.Error) === 2) // examples + Status
    assert(evs.count(_.severity == Severity.Warning) === 1)
    assert(evs.count(_.severity == Severity.Note) === 2)
    assert(evs.exists(_.message === Some("examples: ERROR")))
    assert(evs.exists(_.message === Some("status: 1 ERROR, 1 WARNING, 2 NOTEs")))
    assert(detected("r_check.txt") === Some("r_check"))
  }

  test("semgrep deep: file/rule context onto ┆ findings, separators skipped") {
    val evs = SemgrepParser.parse(fixture("semgrep_run.txt"))
    assert(evs.length === 7)
    assert(evs.forall(_.severity == Severity.Warning))
    val sqli = evs.filter(_.rule.exists(_.contains("formatted-sql-query")))
    assert(sqli.length === 2)
    assert(sqli.forall(_.ref_file.contains("app/db.py")))
    assert(sqli.map(_.ref_line.get).toSet === Set(44, 51))
    val evalFinding = evs.find(_.ref_line.contains(114)).get
    assert(evalFinding.ref_file === Some("web/src/tracker.js"))
    assert(evalFinding.rule.exists(_.contains("eval-detected")))
    assert(detected("semgrep_run.txt") === Some("semgrep_text"))
  }

  test("tap deep: plan+version anchored, YAML messages onto failures, directives informational") {
    val evs = TapParser.parse(fixture("tap_run.txt"))
    assert(evs.length === 14)
    assert(evs.count(_.severity == Severity.TestPass) === 9)
    assert(evs.count(_.severity == Severity.TestFail) === 3)
    assert(evs.count(_.severity == Severity.Info) === 2) // SKIP + TODO
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.flatMap(_.message).toSet === Set(
      "expected total 42.75, got 47.5",
      "connect ECONNREFUSED 127.0.0.1:8000",
      "KeyError sku-991"))
    assert(evs.exists(_.message.exists(_.endsWith("[SKIP]"))))
    assert(detected("tap_run.txt") === Some("tap_text"))
  }

  test("unittest deep: verbose ok lines, detail blocks beat verbose FAIL dupes") {
    val evs = UnittestParser.parse(fixture("unittest_run.txt"))
    assert(evs.length === 10) // 7 pass + 2 fail + 1 verdict; no double-count
    assert(evs.count(_.severity == Severity.TestPass) === 7)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.exists(e =>
      e.test_name.contains("tests.test_cart.CartTest.test_total_with_discount") &&
        e.message.contains("47.5 != 42.75")))
    assert(fails.exists(e =>
      e.test_name.contains("tests.test_inventory.InventoryTest.test_restock_on_refund") &&
        e.message.contains("'sku-991'")))
    val verdict = evs.find(_.severity == Severity.Error).get
    assert(verdict.message === Some("FAILED (failures=1, errors=1, skipped=1)"))
    assert(detected("unittest_run.txt") === Some("unittest_text"))
  }

  test("zig deep: error/warning/note ladder, cross-reference notes anchored") {
    val evs = ZigParser.parse(fixture("zig_build.txt"))
    assert(evs.length === 11)
    assert(evs.count(_.severity == Severity.Error) === 6)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == Severity.Note) === 3)
    val undecl = evs.find(_.message.contains("use of undeclared identifier 'subtotal'")).get
    assert(undecl.ref_file === Some("src/cart/total.zig"))
    assert(undecl.ref_line === Some(42) && undecl.ref_column === Some(19))
    // two diagnostics on the same line, different columns, both kept
    assert(evs.count(_.ref_line.contains(133)) === 2)
    assert(detected("zig_build.txt") === Some("zig_text"))
  }

  test("generic fallback deep: located + keyword lines from a tool no parser claims") {
    val evs = GenericParser.parse(fixture("generic_tool.txt"))
    assert(evs.length === 18) // 13 located + 5 keyword
    assert(evs.count(_.severity == Severity.Error) === 17)
    assert(evs.count(_.severity == Severity.Warning) === 1)
    val dup = evs.find(_.ref_line.contains(22)).get
    assert(dup.ref_file === Some("assets/manifest.yaml"))
    assert(dup.message.exists(_.startsWith("duplicate entry")))
    assert(evs.exists(e => e.ref_file.contains("assets/locale/strings_fr.yaml") &&
      e.ref_column.contains(12)))
    // no specific parser may claim this output: the damped fallback wins
    assert(detected("generic_tool.txt") === Some("generic_lint"))
  }
}
