package graft

import graft.model.Severity
import graft.parse._

/** Real-world-shaped fixture corpus, tier 3 (the 20 formats below
  * DeepFixturesSpec2's tier): swiftc/xcodebuild, rspec, spotbugs,
  * valgrind, cppcheck, gtest, playwright, cypress, ansible, pip, npm,
  * tox, poetry, bundler, ghc, yamllint, stylelint, sqlfluff, hadolint,
  * gitlab-ci. Same contract as its siblings: ≥30-line realistic logs,
  * exact counts, exact anchors, detect() assertions.
  */
class DeepFixturesSpec3 extends SparkSpec {

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromResource(s"logs/deep/$name")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private def refs(evs: Seq[ParsedEvent]): Set[(String, Int)] =
    evs.flatMap(e => e.ref_file.zip(e.ref_line)).toSet

  test("swiftc deep: diagnostics through echoed source, xcodebuild failure marker") {
    val evs = SwiftParser.parse(fixture("swift_build.txt"))
    assert(evs.count(_.severity == Severity.Error) === 4) // 3 diags + BUILD FAILED
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == "note") === 1)
    val r = refs(evs)
    assert(r.contains(("/Users/ci/work/App/Sources/App/SessionStore.swift", 48)))
    assert(r.contains(("/Users/ci/work/App/Sources/App/Views/CartView.swift", 102)))
    assert(r.contains(("/Users/ci/work/App/Sources/Networking/Client.swift", 27)))
    assert(evs.find(_.ref_line.contains(48)).get.ref_column === Some(23))
    assert(evs.exists(e => e.message.contains("BUILD FAILED") && e.ref_file.isEmpty))
    assert(FormatRegistry.detect(fixture("swift_build.txt")).map(_.format) === Some("swift_text"))
  }

  test("rspec deep: rerun lines carry file:line + full example description") {
    val evs = RspecParser.parse(fixture("rspec_run.txt"))
    assert(evs.length === 3)
    assert(evs.forall(_.severity == Severity.TestFail))
    assert(refs(evs) === Set(("./spec/models/user_spec.rb", 84),
      ("./spec/services/checkout_spec.rb", 38),
      ("./spec/models/inventory_spec.rb", 60)))
    assert(evs.map(_.test_name.get).toSet === Set(
      "User password reset issues a signed token",
      "Checkout applies the discount once",
      "Inventory restocks on refund"))
    assert(FormatRegistry.detect(fixture("rspec_run.txt")).map(_.format) === Some("rspec_text"))
  }

  test("spotbugs deep: H→error, M/L→warning, bug type as code") {
    val evs = SpotbugsParser.parse(fixture("spotbugs_run.txt"))
    assert(evs.length === 7)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 5)
    val r = refs(evs)
    assert(r.contains(("CartService.java", 131)))
    assert(r.contains(("ReportDao.java", 44)))
    assert(r.contains(("AuditLog.java", 18)))
    assert(evs.find(_.code.contains("SQL_NONCONSTANT_STRING_PASSED_TO_EXECUTE"))
      .get.severity === Severity.Error)
    assert(evs.find(_.code.contains("DLS_DEAD_LOCAL_STORE"))
      .get.severity === Severity.Warning)
    assert(FormatRegistry.detect(fixture("spotbugs_run.txt")).map(_.format) === Some("spotbugs_text"))
  }

  test("valgrind deep: issue blocks anchor on first frame; comma'd leak sizes; summary") {
    val evs = ValgrindParser.parse(fixture("valgrind_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 6) // 5 issues + summary(5>0)
    val r = refs(evs)
    assert(r.contains(("ring.c", 58)))
    assert(r.contains(("config.c", 77)))
    assert(r.contains(("cache.c", 93)))
    // the comma'd "1,024 bytes ... definitely lost" block parsed
    assert(evs.exists(_.message.exists(_.contains("definitely lost"))))
    assert(evs.exists(_.message.exists(_.startsWith("Mismatched free"))))
    val summary = evs.find(_.category.contains("memory-summary")).get
    assert(summary.message.get.contains("5 errors"))
    assert(FormatRegistry.detect(fixture("valgrind_run.txt")).map(_.format) === Some("valgrind"))
  }

  test("cppcheck deep: five severity classes through progress noise") {
    val evs = CppcheckParser.parse(fixture("cppcheck_run.txt"))
    assert(evs.length === 10)
    assert(evs.count(_.severity == Severity.Error) === 4)
    assert(evs.count(_.severity == Severity.Warning) === 1)
    assert(evs.count(_.severity == Severity.Info) === 5) // style/perf/portability/information
    val r = refs(evs)
    assert(r.contains(("src/ring.c", 58)))
    assert(r.contains(("src/cache.c", 93)))
    assert(r.contains(("src/buffer.c", 40)))
    assert(evs.find(_.ref_file.contains("src/buffer.c")).get
      .message.get.startsWith("Memory leak"))
    assert(FormatRegistry.detect(fixture("cppcheck_run.txt")).map(_.format) === Some("cppcheck_text"))
  }

  test("gtest deep: failures carry loc + expectation, bottom re-list not double-counted") {
    val evs = GtestParser.parse(fixture("gtest_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 6)
    assert(evs.count(_.severity == Severity.TestFail) === 3) // NOT 6: re-list suppressed
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(refs(fails) === Set(("ring_test.cc", 58), ("cache_test.cc", 93),
      ("config_test.cc", 31)))
    assert(fails.find(_.test_name.contains("RingTest.WrapAround")).get
      .message.get.contains("equality"))
    assert(fails.find(_.test_name.contains("CacheTest.Eviction")).get
      .message.get.contains("cache_get"))
    assert(FormatRegistry.detect(fixture("gtest_run.txt")).map(_.format) === Some("gtest_text"))
  }

  test("playwright deep: per-browser results with spec anchors; detail/re-list not re-counted") {
    val evs = PlaywrightParser.parse(fixture("playwright_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 7)
    assert(evs.count(_.severity == Severity.TestFail) === 3)
    val r = refs(evs)
    assert(r.contains(("auth/login.spec.ts", 12)))
    assert(r.contains(("cart/checkout.spec.ts", 30)))
    assert(r.contains(("profile/avatar.spec.ts", 18)))
    // browser attribution rides as rule
    assert(evs.filter(_.severity == Severity.TestFail)
      .flatMap(_.rule).toSet === Set("chromium", "firefox", "webkit"))
    assert(evs.find(e => e.rule.contains("webkit") && e.severity == Severity.TestFail)
      .get.test_name === Some("uploads a new avatar"))
    assert(FormatRegistry.detect(fixture("playwright_run.txt")).map(_.format) === Some("playwright_text"))
  }

  test("cypress deep: spec attribution across Running: blocks, error detail as message") {
    val evs = CypressParser.parse(fixture("cypress_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 6)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.find(_.test_name.contains("uploads a new avatar")).get
      .message.get.startsWith("CypressError"))
    assert(fails.forall(_.ref_file.isDefined))
    assert(fails.map(_.ref_file.get).toSet === Set("cart.cy.ts", "profile.cy.ts"))
    assert(evs.filter(_.severity == Severity.TestPass)
      .count(_.ref_file.contains("auth.cy.ts")) === 3)
    assert(FormatRegistry.detect(fixture("cypress_run.txt")).map(_.format) === Some("cypress_text"))
  }

  test("ansible deep: fatal json msgs with task attribution, recap warnings for failed hosts") {
    val evs = AnsibleParser.parse(fixture("ansible_play.txt"))
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 3) // db1, web2, web3 recaps
    val errs = evs.filter(_.severity == Severity.Error)
    assert(errs.find(_.message.exists(_.contains("No package nginx"))).get
      .test_name === Some("install nginx"))
    assert(errs.find(_.message.exists(_.contains("Unable to restart"))).get
      .test_name === Some("restart nginx"))
    assert(errs.find(_.code.contains("unreachable")).get
      .message.get.contains("[db1]"))
    assert(evs.exists(e => e.severity == Severity.Warning &&
      e.message.exists(_.contains("web3: failed=1"))))
    assert(!evs.exists(_.message.exists(_.contains("web1:")))) // clean host: no event
    assert(FormatRegistry.detect(fixture("ansible_play.txt")).map(_.format) === Some("ansible_text"))
  }

  test("pip deep: resolution errors + version warning + installed summary") {
    val evs = PipParser.parse(fixture("pip_install.txt"))
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 1)
    assert(evs.count(_.severity == Severity.Info) === 1)
    assert(evs.exists(_.message.exists(_.contains(
      "Could not find a version that satisfies the requirement internal-schema==4.2.0"))))
    assert(evs.exists(_.message.exists(_.startsWith("No matching distribution"))))
    assert(evs.find(_.severity == Severity.Info).get
      .message.get.contains("fastapi-0.109.0"))
    assert(FormatRegistry.detect(fixture("pip_install.txt")).map(_.format) === Some("pip_text"))
  }

  test("npm deep: ERESOLVE block, code extraction, bare separator lines skipped") {
    val evs = NpmParser.parse(fixture("npm_install.txt"))
    assert(evs.count(_.severity == Severity.Error) === 13) // content lines only
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.find(_.code.isDefined).get.code === Some("ERESOLVE"))
    assert(evs.exists(_.message.exists(_.contains("While resolving: webapp@2.4.0"))))
    assert(evs.exists(_.message.exists(_.contains("peer react@"))))
    assert(evs.exists(e => e.severity == Severity.Warning &&
      e.message.exists(_.contains("left-pad"))))
    assert(FormatRegistry.detect(fixture("npm_install.txt")).map(_.format) === Some("npm_err"))
  }

  test("tox deep: env failures incl. missing interpreter; succeeded env passes") {
    val evs = ToxParser.parse(fixture("tox_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.TestPass) === 1)
    assert(evs.exists(e => e.test_name.contains("py311") &&
      e.message.exists(_.contains("commands failed"))))
    assert(evs.count(e => e.test_name.contains("py39") &&
      e.message.exists(_.contains("InterpreterNotFound"))) === 2) // mid-run + summary
    assert(evs.find(_.severity == Severity.TestPass).get.test_name === Some("lint"))
    assert(FormatRegistry.detect(fixture("tox_run.txt")).map(_.format) === Some("tox_text"))
  }

  test("poetry deep: solver error with Because-detail; installs as info") {
    val evs = PoetryParser.parse(fixture("poetry_install.txt"))
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Info) === 4)
    assert(evs.find(_.code.contains("SolverProblemError")).isDefined)
    assert(evs.exists(_.message.exists(_.contains(
      "internal-schema (^4.2) which doesn't match any versions"))))
    assert(evs.exists(e => e.severity == Severity.Info &&
      e.message.exists(_.contains("requests 2.31.0"))))
    assert(FormatRegistry.detect(fixture("poetry_install.txt")).map(_.format) === Some("poetry_text"))
  }

  test("bundler deep: missing gem + version conflict through Using noise") {
    val evs = BundlerParser.parse(fixture("bundler_install.txt"))
    assert(evs.length === 2)
    assert(evs.forall(_.severity == Severity.Error))
    assert(evs.exists(_.message.exists(_.contains("paymetrics (~> 3.2)"))))
    assert(evs.exists(_.message.exists(_.contains("version conflict: rack"))))
    assert(FormatRegistry.detect(fixture("bundler_install.txt")).map(_.format) === Some("bundler_text"))
  }

  test("ghc deep: multi-line diagnostic layout adopts continuation message; flags as rules") {
    val evs = GhcParser.parse(fixture("ghc_build.txt"))
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    val r = refs(evs)
    assert(r.contains(("src/Config.hs", 31)))
    assert(r.contains(("src/Cache.hs", 93)))
    assert(r.contains(("src/Worker.hs", 122)))
    assert(r.contains(("src/Legacy.lhs", 12))) // literate haskell ext
    assert(evs.find(_.ref_line.contains(31)).get
      .message.get.contains("Variable not in scope: parseModee"))
    assert(evs.find(_.ref_line.contains(122)).get
      .message.get.contains("parse error on input"))
    assert(evs.find(_.ref_line.contains(7)).get.rule === Some("-Wunused-imports"))
    assert(FormatRegistry.detect(fixture("ghc_build.txt")).map(_.format) === Some("ghc_text"))
  }

  test("yamllint deep: rules + exact cols across k8s/workflow/ansible files") {
    val evs = YamllintParser.parse(fixture("yamllint_run.txt"))
    assert(evs.length === 10)
    assert(evs.count(_.severity == Severity.Error) === 5)
    assert(evs.count(_.severity == Severity.Warning) === 5)
    val r = refs(evs)
    assert(r.contains(("deploy/k8s/web-deployment.yaml", 48)))
    assert(r.contains((".github/workflows/ci.yml", 88)))
    assert(r.contains(("ansible/site.yml", 31)))
    assert(evs.find(_.ref_line.contains(9)).get.rule === Some("key-duplicates"))
    assert(evs.count(_.rule.contains("line-length")) === 2)
    assert(FormatRegistry.detect(fixture("yamllint_run.txt")).map(_.format) === Some("yamllint_text"))
  }

  test("stylelint deep: file headers carry across css/scss/less blocks") {
    val evs = StylelintParser.parse(fixture("stylelint_run.txt"))
    assert(evs.length === 7)
    assert(evs.count(_.severity == Severity.Error) === 5)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.ref_file.contains("src/styles/base.css")) === 3)
    assert(evs.count(_.ref_file.contains("src/styles/components/modal.scss")) === 3)
    assert(evs.find(_.ref_file.contains("src/styles/legacy/print.less")).get
      .rule === Some("property-no-unknown"))
    assert(evs.find(_.rule.contains("color-no-invalid-hex")).get
      .ref_line === Some(31))
    assert(FormatRegistry.detect(fixture("stylelint_run.txt")).map(_.format) === Some("stylelint_text"))
  }

  test("sqlfluff deep: L:|P: positions with codes, PASS files contribute nothing") {
    val evs = SqlfluffParser.parse(fixture("sqlfluff_run.txt"))
    assert(evs.length === 7)
    assert(evs.forall(_.severity == Severity.Warning))
    assert(evs.count(_.ref_file.contains("models/staging/stg_orders.sql")) === 3)
    assert(evs.count(_.ref_file.contains("models/marts/fct_revenue.sql")) === 3)
    assert(evs.count(_.ref_file.contains("models/staging/stg_customers.sql")) === 0)
    val long = evs.find(_.code.contains("L016")).get
    assert(long.ref_file === Some("models/marts/dim_customers.sql"))
    assert(long.ref_line === Some(15) && long.ref_column === Some(22))
    assert(FormatRegistry.detect(fixture("sqlfluff_run.txt")).map(_.format) === Some("sqlfluff_text"))
  }

  test("hadolint deep: DL + SC codes across multiple dockerfiles") {
    val evs = HadolintParser.parse(fixture("hadolint_run.txt"))
    assert(evs.length === 10)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 6)
    assert(evs.count(_.severity == Severity.Info) === 2)
    val r = refs(evs)
    assert(r.contains(("Dockerfile", 7)))
    assert(r.contains(("services/api/Dockerfile", 2)))
    assert(r.contains(("services/worker/Dockerfile.prod", 3)))
    assert(evs.find(_.code.contains("SC2046")).get.severity === Severity.Warning)
    assert(evs.find(_.code.contains("DL3002")).get
      .message.get.contains("root"))
    assert(FormatRegistry.detect(fixture("hadolint_run.txt")).map(_.format) === Some("hadolint_text"))
  }

  test("gitlab-ci deep: job failure + non-cache warnings through section markers") {
    val evs = GitlabCiParser.parse(fixture("gitlab_ci_job.txt"))
    assert(evs.count(_.severity == Severity.Error) === 1)
    assert(evs.count(_.severity == Severity.Warning) === 1) // after_script; cache warning excluded
    assert(evs.find(_.severity == Severity.Error).get
      .message.get.contains("exit code 1"))
    assert(evs.find(_.severity == Severity.Warning).get
      .message.get.contains("after_script failed"))
    assert(!evs.exists(_.message.exists(_.contains("Cache file"))))
    assert(FormatRegistry.detect(fixture("gitlab_ci_job.txt")).map(_.format) === Some("gitlab_ci"))
  }
}
