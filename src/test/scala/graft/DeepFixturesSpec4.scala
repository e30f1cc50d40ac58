package graft

import graft.model.Severity
import graft.parse._

/** Real-world-shaped fixture corpus, tier 4a: the JSON-emitting tool
  * family (cargo --message-format=json, eslint/shellcheck/hadolint
  * --format json, go test -json, bandit/rubocop/trivy JSON reports,
  * pytest-json-report, SARIF 2.1.0, gcc -fdiagnostics-format=json) plus
  * kubectl events. Same contract as tiers 1-3: ≥30-line realistic
  * logs, exact counts, exact anchors, detect() assertions.
  */
class DeepFixturesSpec4 extends SparkSpec {

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromResource(s"logs/deep/$name")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private def detected(name: String): Option[String] =
    FormatRegistry.detect(fixture(name)).map(_.format)

  test("cargo_json deep: primary spans, codes, note levels skipped, artifacts skipped") {
    val evs = CargoJsonParser.parse(fixture("cargo_build.jsonl"))
    assert(evs.length === 5)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.flatMap(_.code).toSet ===
      Set("E0308", "E0425", "unused_variables", "dead_code", "unused_imports"))
    // E0308's PRIMARY span is the second in its array — is_primary wins
    val e308 = evs.find(_.code.contains("E0308")).get
    assert(e308.ref_file === Some("src/cart/total.rs"))
    assert(e308.ref_line === Some(42) && e308.ref_column === Some(22))
    val e425 = evs.find(_.code.contains("E0425")).get
    assert(e425.message === Some("cannot find value `sesion` in this scope"))
    assert(e425.ref_file === Some("src/api/checkout.rs") && e425.ref_line === Some(88))
    assert(detected("cargo_build.jsonl") === Some("cargo_json"))
  }

  test("eslint_json deep: severity 2/1 split, null ruleId, per-file paths") {
    val evs = EslintJsonParser.parse(fixture("eslint_run.json"))
    assert(evs.length === 5)
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.flatMap(_.rule).toSet === Set("no-unused-vars",
      "react-hooks/exhaustive-deps", "eqeqeq", "no-console"))
    val parseErr = evs.find(_.message.exists(_.startsWith("Parsing error"))).get
    assert(parseErr.rule.isEmpty && parseErr.severity === Severity.Error)
    assert(parseErr.ref_file === Some("/work/web/src/utils/format.js"))
    assert(parseErr.ref_line === Some(88) && parseErr.ref_column === Some(15))
    assert(detected("eslint_run.json") === Some("eslint_json"))
  }

  test("shellcheck_json deep: SC codes from ints, level→severity incl. style") {
    val evs = ShellcheckJsonParser.parse(fixture("shellcheck_run.json"))
    assert(evs.length === 6)
    assert(evs.count(_.severity == Severity.Error) === 1)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.count(_.severity == Severity.Info) === 2) // info + style
    assert(evs.flatMap(_.code).toSet ===
      Set("SC2086", "SC2068", "SC2034", "SC2164", "SC2006", "SC2046"))
    val err = evs.find(_.severity == Severity.Error).get
    assert(err.ref_file === Some("deploy/release.sh") && err.ref_line === Some(29))
    assert(err.ref_column === Some(6))
    assert(detected("shellcheck_run.json") === Some("shellcheck_json"))
  }

  test("gotest_json deep: subtests, last non-frame output as the fail message") {
    val evs = GoTestJsonParser.parse(fixture("gotest_run.jsonl"))
    assert(evs.length === 7) // package-level pass/fail rows carry no Test: skipped
    assert(evs.count(_.severity == Severity.TestPass) === 4)
    assert(evs.count(_.severity == Severity.TestFail) === 3)
    val byTest = evs.map(e => e.test_name.get -> e).toMap
    assert(byTest("TestEviction").message ===
      Some("cache_test.go:71: expected key9 evicted after capacity hit, still present"))
    assert(byTest("TestRefund/partial_amount").message ===
      Some("payment_test.go:118: refund mismatch: want 12.50, got 12.05"))
    // parent fail with no own diagnostic output falls back to "<name> failed"
    assert(byTest("TestRefund").message === Some("TestRefund failed"))
    assert(detected("gotest_run.jsonl") === Some("gotest_json"))
  }

  test("bandit_json deep: HIGH/MEDIUM/LOW severities, test ids and names") {
    val evs = BanditJsonParser.parse(fixture("bandit_run.json"))
    assert(evs.length === 5)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == Severity.Info) === 1)
    assert(evs.flatMap(_.code).toSet === Set("B608", "B602", "B324", "B501", "B105"))
    val sqli = evs.find(_.code.contains("B608")).get
    assert(sqli.ref_file === Some("app/db.py") && sqli.ref_line === Some(44))
    assert(sqli.rule === Some("hardcoded_sql_expressions"))
    assert(detected("bandit_run.json") === Some("bandit_json"))
  }

  test("rubocop_json deep: fatal/error→error, convention→info, cop names") {
    val evs = RubocopJsonParser.parse(fixture("rubocop_run.json"))
    assert(evs.length === 5)
    assert(evs.count(_.severity == Severity.Error) === 2) // error + fatal
    assert(evs.count(_.severity == Severity.Warning) === 1)
    assert(evs.count(_.severity == Severity.Info) === 2) // conventions
    val syntax = evs.filter(_.rule.contains("Lint/Syntax"))
    assert(syntax.map(_.ref_line.get).toSet === Set(121, 203))
    assert(syntax.map(_.ref_file.get).toSet ===
      Set("app/models/order.rb", "app/services/checkout_service.rb"))
    assert(detected("rubocop_run.json") === Some("rubocop_json"))
  }

  test("hadolint_json deep: DL + embedded-SC codes; beats shellcheck_json sniff") {
    val evs = HadolintJsonParser.parse(fixture("hadolint_run.json"))
    assert(evs.length === 7)
    assert(evs.count(_.severity == Severity.Error) === 2) // DL3000, DL3025
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.count(_.severity == Severity.Info) === 2) // info + style
    assert(evs.flatMap(_.code).toSet ===
      Set("DL3008", "DL3009", "DL3000", "SC2046", "DL3007", "DL3059", "DL3025"))
    assert(evs.flatMap(_.ref_file).toSet ===
      Set("Dockerfile", "services/worker/Dockerfile"))
    // same array-of-{file,line,level,code} shape as shellcheck_json:
    // the DL-code/Dockerfile signal must out-score it
    assert(detected("hadolint_run.json") === Some("hadolint_json"))
  }

  test("pytest_json deep: outcome split, longrepr last line as fail message") {
    val evs = PytestJsonParser.parse(fixture("pytest_report.json"))
    assert(evs.length === 6)
    assert(evs.count(_.severity == Severity.TestPass) === 3)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    assert(evs.count(_.severity == Severity.Info) === 1) // skipped
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.flatMap(_.message).toSet ===
      Set("E       assert 47.5 == 42.75", "E       KeyError: 'sku-991'"))
    assert(fails.flatMap(_.ref_file).toSet ===
      Set("tests/test_cart.py", "tests/test_inventory.py"))
    assert(evs.forall(_.test_name.isDefined))
    assert(detected("pytest_report.json") === Some("pytest_json"))
  }

  test("trivy_json deep: CRITICAL/HIGH→error, per-target grouping, CVE codes") {
    val evs = TrivyJsonParser.parse(fixture("trivy_scan.json"))
    assert(evs.length === 5) // secret-class result with no vulns yields none
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == Severity.Info) === 1)
    assert(evs.flatMap(_.code).toSet === Set("CVE-2024-33599", "CVE-2024-28085",
      "CVE-2023-50387", "CVE-2024-35195", "CVE-2024-3651"))
    val glibc = evs.find(_.code.contains("CVE-2024-33599")).get
    assert(glibc.message.get.startsWith("libc-bin: glibc: stack-based"))
    assert(glibc.ref_file ===
      Some("registry.example.com/shop/api:2026-07-30 (debian 12.5)"))
    assert(evs.count(_.ref_file.contains("app/requirements.txt")) === 2)
    assert(detected("trivy_scan.json") === Some("trivy_json"))
  }

  test("sarif deep: multi-run document, spec-default level, driver-tagged messages") {
    val evs = SarifParser.parse(fixture("codeql_scan.sarif"))
    assert(evs.length === 4)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 1) // absent level → warning
    assert(evs.count(_.severity == Severity.Note) === 1)
    val sqli = evs.find(_.rule.contains("js/sql-injection")).get
    assert(sqli.message.get.startsWith("[CodeQL] This query string depends"))
    assert(sqli.ref_file === Some("server/db/orders.js"))
    assert(sqli.ref_line === Some(77) && sqli.ref_column === Some(19))
    val semgrep = evs.find(_.rule.exists(_.contains("dangerous-subprocess"))).get
    assert(semgrep.message.get.startsWith("[Semgrep OSS]"))
    assert(detected("codeql_scan.sarif") === Some("sarif_json"))
  }

  test("gcc_json deep: kinds incl. fatal error, -W options as rules, caret anchors") {
    val evs = GccJsonParser.parse(fixture("gcc_fdiag.json"))
    assert(evs.length === 5) // children notes are not top-level diagnostics
    assert(evs.count(_.severity == Severity.Error) === 2) // error + fatal error
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == Severity.Note) === 1)
    assert(evs.flatMap(_.rule).toSet === Set("-Wunused-variable", "-Wsign-compare"))
    val undecl = evs.find(_.message.exists(_.contains("undeclared"))).get
    assert(undecl.ref_file === Some("src/cart/total.c"))
    assert(undecl.ref_line === Some(88) && undecl.ref_column === Some(15))
    val fatal = evs.find(_.message.exists(_.contains("No such file"))).get
    assert(fatal.severity === Severity.Error)
    assert(detected("gcc_fdiag.json") === Some("gcc_json"))
  }

  test("kube_events deep: Warning→warning, Normal→info, reason codes, object refs") {
    val evs = KubeEventsParser.parse(fixture("kube_events.txt"))
    assert(evs.length === 31) // header row is not an event
    assert(evs.count(_.severity == Severity.Warning) === 10)
    assert(evs.count(_.severity == Severity.Info) === 21)
    val backoffs = evs.filter(_.code.contains("BackOff"))
    assert(backoffs.length === 2)
    assert(backoffs.flatMap(_.ref_file).toSet ===
      Set("pod/checkout-worker-6b8d5f9c44-mk2ww", "pod/metrics-agent-zz41b"))
    assert(evs.exists(e => e.code.contains("NodeNotReady") &&
      e.ref_file.contains("node/node-pool-a-2c9x")))
    assert(evs.exists(e => e.code.contains("FailedCreate") &&
      e.ref_file.contains("statefulset/session-store")))
    assert(detected("kube_events.txt") === Some("kube_events"))
  }
}
