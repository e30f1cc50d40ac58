package graft

import graft.model.Severity
import graft.parse._

/** Real-world-shaped fixture corpus for the NEXT 20 formats (the tier
  * below DeepFixturesSpec's top-20): junit-xml, msbuild, phpunit,
  * terraform, docker-buildkit, shellcheck, ruff, python/java crash
  * logs, make, cmake, checkstyle, clang-tidy, bazel, webpack, vitest,
  * github-actions, dotnet-test, black, ktlint. Same contract: ≥30-line
  * logs with interleaved noise and summaries, exact event counts, ≥3
  * exact ref anchors per format, and a detect() assertion so registry
  * scoring keeps resolving these shapes correctly.
  */
class DeepFixturesSpec2 extends SparkSpec {

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromResource(s"logs/deep/$name")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private def refs(evs: Seq[ParsedEvent]): Set[(String, Int)] =
    evs.flatMap(e => e.ref_file.zip(e.ref_line)).toSet

  test("junit xml deep: pass/failure/error cases, entities unescaped, system-out not a failure") {
    val evs = JunitXmlParser.parse(fixture("junit_report.xml"))
    assert(evs.count(_.severity == Severity.TestPass) === 5)
    assert(evs.count(_.severity == Severity.TestFail) === 3)
    val fails = evs.filter(_.severity == Severity.TestFail)
    // XML entities in the message attribute must be unescaped
    assert(fails.find(_.test_name.contains("testTotalAppliesDiscount")).get
      .message.get === "expected:<84.15> but was:<99.00>")
    assert(fails.find(_.test_name.contains("testCheckoutEmptyCart")).get
      .message.get.contains("IllegalStateException"))
    assert(fails.find(_.test_name.contains("testCompoundRules")).get
      .message.get.contains("tier boundary"))
    // the system-out case is a pass, not a failure
    assert(evs.find(_.test_name.contains("testConcurrentAdds")).get
      .severity === Severity.TestPass)
    // classname rides as the file anchor
    assert(evs.forall(_.ref_file.exists(_.startsWith("com.example.shop."))))
    assert(FormatRegistry.detect(fixture("junit_report.xml")).map(_.format) === Some("junit_xml"))
  }

  test("msbuild deep: CS/NETSDK codes with (line,col), Build-FAILED summary echo deduped") {
    val evs = MsbuildParser.parse(fixture("msbuild_build.txt"))
    // the summary after "Build FAILED." re-echoes every diagnostic —
    // one event per distinct diagnostic, not two
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    val r = refs(evs)
    assert(r.contains(("C:\\work\\App\\src\\App.Api\\Controllers\\OrderController.cs", 12)))
    assert(r.contains(("C:\\work\\App\\src\\App.Api\\Mapping\\OrderProfile.cs", 29)))
    assert(r.contains(("C:\\work\\App\\src\\App.Core\\Services\\StockService.cs", 66)))
    val e = evs.find(_.code.contains("CS1002")).get
    assert(e.ref_line === Some(12) && e.ref_column === Some(34))
    assert(evs.exists(_.code.contains("NETSDK1071")))
    assert(FormatRegistry.detect(fixture("msbuild_build.txt")).map(_.format) === Some("msbuild"))
  }

  test("phpunit deep: failures/errors vs skipped sections, summary event") {
    val evs = PhpunitParser.parse(fixture("phpunit_run.txt"))
    assert(evs.count(_.severity == Severity.TestFail) === 3) // 2 failures + 1 error
    assert(evs.count(_.severity == Severity.Info) === 1) // skipped section
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.find(_.test_name.exists(_.contains("testEmailValidationRejectsBareDomain")))
      .get.message.get === "Failed asserting that true is false.")
    assert(fails.find(_.test_name.exists(_.contains("testDiscountAppliedOnce")))
      .get.ref_file === Some("/work/shop/tests/Feature/CheckoutTest.php"))
    assert(fails.find(_.test_name.exists(_.contains("testChargeRetriesOnTimeout")))
      .get.message.get.contains("ConnectException"))
    val r = refs(evs)
    assert(r.contains(("/work/shop/tests/Unit/UserTest.php", 58)))
    assert(r.contains(("/work/shop/tests/Feature/CheckoutTest.php", 131)))
    assert(r.contains(("/work/shop/src/Payment/GatewayClient.php", 77)))
    // FAILURES! summary becomes a test-summary event
    assert(evs.count(e => e.category.contains("test-summary") &&
      e.severity == Severity.Error) === 1)
    assert(FormatRegistry.detect(fixture("phpunit_run.txt")).map(_.format) === Some("phpunit_text"))
  }

  test("terraform deep: Error/Warning blocks with on-file-line anchors, headless lock error kept") {
    val evs = TerraformParser.parse(fixture("terraform_plan.txt"))
    assert(evs.count(_.severity == Severity.Error) === 4)
    assert(evs.count(_.severity == Severity.Warning) === 1)
    val r = refs(evs)
    assert(r.contains(("main.tf", 12)))
    assert(r.contains(("modules/compute/instances.tf", 41)))
    assert(r.contains(("modules/storage/buckets.tf", 9)))
    assert(r.contains(("modules/network/vpc.tf", 23)))
    assert(evs.find(_.message.exists(_.contains("Invalid resource type"))).get
      .ref_file === Some("main.tf"))
    // the state-lock error has no location block — still an event
    assert(evs.exists(e => e.message.exists(_.contains("state lock")) && e.ref_file.isEmpty))
    assert(FormatRegistry.detect(fixture("terraform_plan.txt")).map(_.format) === Some("terraform_text"))
  }

  test("docker buildkit deep: step ERRORs through CACHED/transfer noise") {
    val evs = DockerBuildParser.parse(fixture("docker_buildkit.txt"))
    assert(evs.length === 2)
    assert(evs.forall(_.severity == Severity.Error))
    assert(evs.head.message.get.contains("go vet"))
    assert(evs.head.message.get.contains("exit code: 1"))
    assert(evs(1).message.get.contains("failed to compute cache key"))
    assert(evs(1).message.get.contains("/missing-asset.txt"))
    assert(FormatRegistry.detect(fixture("docker_buildkit.txt")).map(_.format) === Some("docker_build"))
  }

  test("shellcheck deep: multi-finding blocks, severity map, wiki footer ignored") {
    val evs = ShellcheckParser.parse(fixture("shellcheck_run.txt"))
    assert(evs.length === 9)
    assert(evs.count(_.severity == Severity.Error) === 1)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == Severity.Info) === 6)
    val r = refs(evs)
    assert(r.contains(("deploy/release.sh", 12)))
    assert(r.contains(("scripts/backup.sh", 44)))
    assert(r.contains(("scripts/rotate.sh", 8)))
    // two findings in one caret block share the header's location
    assert(evs.count(e => e.ref_file.contains("deploy/release.sh") &&
      e.ref_line.contains(19)) === 2)
    assert(evs.find(_.code.contains("SC2006")).get.severity === Severity.Info) // style
    assert(evs.find(_.ref_file.contains("scripts/rotate.sh")).get
      .code === Some("SC2086"))
    assert(FormatRegistry.detect(fixture("shellcheck_run.txt")).map(_.format) === Some("shellcheck_text"))
  }

  test("ruff deep: E/F error vs other-family warning, [*] fixable, exact cols") {
    val evs = RuffParser.parse(fixture("ruff_run.txt"))
    assert(evs.length === 15)
    assert(evs.count(_.severity == Severity.Error) === 10)
    assert(evs.count(_.severity == Severity.Warning) === 5)
    assert(evs.count(_.rule.contains("fixable")) === 5)
    val r = refs(evs)
    assert(r.contains(("app/models.py", 3)))
    assert(r.contains(("app/api/endpoints.py", 17)))
    assert(r.contains(("app/legacy/compat.py", 31)))
    assert(evs.find(_.code.contains("PLR0913")).get.severity === Severity.Warning)
    assert(evs.find(_.code.contains("F821")).get.ref_column === Some(9))
    assert(evs.find(_.code.contains("E501")).exists(_.ref_column.contains(101)))
    assert(FormatRegistry.detect(fixture("ruff_run.txt")).map(_.format) === Some("ruff_text"))
  }

  test("python traceback deep: chained tracebacks, deepest frame anchors, dotted exception class") {
    val evs = PythonTracebackParser.parse(fixture("python_crash.log"))
    assert(evs.length === 3)
    assert(evs.forall(_.severity == Severity.Error))
    assert(evs(0).message === Some("KeyError: 'user_id'"))
    assert(evs(0).ref_file === Some("/work/pipeline/ingest/transforms.py"))
    assert(evs(0).ref_line === Some(102))
    assert(evs(1).message.get.startsWith("FileNotFoundError"))
    assert(evs(1).ref_file === Some("/work/pipeline/sinks/parquet_sink.py"))
    assert(evs(1).ref_line === Some(41))
    // dotted module path on the exception class
    assert(evs(2).code === Some("pipeline.errors.SinkError"))
    assert(evs(2).ref_file === Some("/work/pipeline/ingest/runner.py"))
    assert(evs(2).ref_line === Some(233))
    // traceback span recorded
    assert(evs(0).log_line_start.exists(_ < evs(0).log_line_end.get))
    assert(FormatRegistry.detect(fixture("python_crash.log")).map(_.format) === Some("python_traceback"))
  }

  test("java stacktrace deep: Caused-by chain yields one event per cause with first frame") {
    val evs = JavaStackTraceParser.parse(fixture("java_crash.log"))
    assert(evs.length === 3)
    assert(evs.forall(_.severity == Severity.Error))
    assert(evs(0).code === Some("java.lang.RuntimeException"))
    assert(evs(0).message.get.contains("pipeline stage 'enrich' failed"))
    assert(refs(evs) === Set(("Pipeline.java", 87), ("FutureTask.java", 122),
      ("ConnectionFactoryImpl.java", 319)))
    assert(evs(1).code === Some("java.util.concurrent.ExecutionException"))
    assert(evs(2).code === Some("org.postgresql.util.PSQLException"))
    assert(evs(2).message.get.contains("connection refused"))
    assert(FormatRegistry.detect(fixture("java_crash.log")).map(_.format) === Some("java_stacktrace"))
  }

  test("make deep: nested sub-make targets, No-rule stop, final aggregate error") {
    val evs = MakeParser.parse(fixture("make_run.txt"))
    assert(evs.length === 4)
    assert(evs.forall(_.severity == Severity.Error))
    assert(evs(0).message.get.contains("Makefile:42: build/auth.so"))
    assert(evs(0).code === Some("1"))
    assert(evs(1).message.get.contains("html"))
    assert(evs(2).message.get.startsWith("No rule to make target 'deps/libvendored.a'"))
    assert(evs(3).message.get.contains("GNUmakefile:7: all"))
    assert(evs(3).code === Some("2"))
    assert(FormatRegistry.detect(fixture("make_run.txt")).map(_.format) === Some("make_error"))
  }

  test("cmake deep: at-location blocks, dev warnings, headless source-dir error") {
    val evs = CmakeParser.parse(fixture("cmake_configure.txt"))
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    val r = refs(evs)
    assert(r.contains(("cmake/Deps.cmake", 7)))
    assert(r.contains(("CMakeLists.txt", 14)))
    assert(r.contains(("src/net/CMakeLists.txt", 31)))
    assert(evs.find(_.ref_line.contains(14)).get.rule === Some("add_executable"))
    assert(evs.find(_.ref_line.contains(14)).get.message.get.contains("Cannot find source file"))
    assert(evs.exists(e => e.severity == Severity.Error &&
      e.message.exists(_.contains("source directory")) && e.ref_file.isEmpty))
    assert(FormatRegistry.detect(fixture("cmake_configure.txt")).map(_.format) === Some("cmake_build"))
  }

  test("checkstyle deep: ERROR/WARN/INFO with check names and columns") {
    val evs = CheckstyleParser.parse(fixture("checkstyle_run.txt"))
    assert(evs.length === 12)
    assert(evs.count(_.severity == Severity.Error) === 6)
    assert(evs.count(_.severity == Severity.Warning) === 4)
    assert(evs.count(_.severity == Severity.Info) === 2)
    val r = refs(evs)
    assert(r.contains(("/work/src/main/java/com/example/app/OrderService.java", 25)))
    assert(r.contains(("/work/src/main/java/com/example/app/billing/Invoice.java", 12)))
    assert(r.contains(("/work/src/main/java/com/example/app/util/Dates.java", 9)))
    assert(evs.find(_.ref_line.contains(25)).get.rule === Some("JavadocMethod"))
    assert(evs.find(_.rule.contains("IllegalCatch")).get.ref_column === Some(11))
    assert(FormatRegistry.detect(fixture("checkstyle_run.txt")).map(_.format) === Some("checkstyle_text"))
  }

  test("clang-tidy deep: checks through echoed snippets, error + note severities") {
    val evs = ClangTidyParser.parse(fixture("clang_tidy_run.txt"))
    assert(evs.length === 8)
    assert(evs.count(_.severity == Severity.Error) === 1)
    assert(evs.count(_.severity == Severity.Warning) === 6)
    assert(evs.count(_.severity == "note") === 1)
    val r = refs(evs)
    assert(r.contains(("/work/engine/src/cache/lru_cache.cpp", 42)))
    assert(r.contains(("/work/engine/src/net/conn_pool.cpp", 88)))
    assert(r.contains(("/work/engine/include/engine/metrics.h", 30)))
    assert(evs.find(_.severity == Severity.Error).get
      .rule === Some("clang-diagnostic-error"))
    assert(evs.exists(_.rule.contains("clang-analyzer-deadcode.DeadStores")))
    assert(FormatRegistry.detect(fixture("clang_tidy_run.txt")).map(_.format) === Some("clang_tidy"))
  }

  test("bazel deep: BUILD diagnostics + PASS/FAIL/TIMEOUT/FLAKY test targets") {
    val evs = BazelParser.parse(fixture("bazel_run.txt"))
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 2) // BUILD warning + FLAKY
    assert(evs.count(_.severity == Severity.TestFail) === 2) // FAIL + TIMEOUT
    assert(evs.count(_.severity == Severity.TestPass) === 2)
    val r = refs(evs)
    assert(r.contains(("/work/services/gateway/BUILD", 12)))
    assert(r.contains(("/work/services/gateway/BUILD.bazel", 27)))
    assert(r.contains(("/work/lib/metrics/BUILD", 4)))
    assert(evs.find(_.severity == Severity.TestFail)
      .get.test_name === Some("//services/gateway:router_test"))
    assert(evs.exists(_.test_name.contains("//services/billing:reconcile_test")))
    assert(FormatRegistry.detect(fixture("bazel_run.txt")).map(_.format) === Some("bazel_build"))
  }

  test("webpack deep: ERROR/WARNING in module with pos, first detail line as message") {
    val evs = WebpackParser.parse(fixture("webpack_build.txt"))
    assert(evs.length === 4)
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 1)
    val r = refs(evs)
    assert(r.contains(("./src/app.jsx", 12)))
    assert(r.contains(("./src/store/session.ts", 48)))
    assert(r.contains(("./src/legacy/polyfills.js", 5)))
    assert(evs.find(_.ref_file.contains("./src/app.jsx")).get
      .message.get.startsWith("Module not found"))
    assert(evs.find(_.ref_file.contains("./src/api/client.ts")).get
      .message.get.contains("'AuthToken'"))
    assert(FormatRegistry.detect(fixture("webpack_build.txt")).map(_.format) === Some("webpack_text"))
  }

  test("vitest deep: per-file passes, named failures with arrow messages, summary") {
    val evs = VitestParser.parse(fixture("vitest_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 3)
    assert(evs.count(_.severity == Severity.TestFail) === 3)
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.find(_.test_name.contains("closes on escape")).get
      .message.get.contains("to be called 1 times"))
    assert(fails.find(_.test_name.contains("merges duplicate skus")).get
      .ref_file === Some("src/store/cart.test.ts"))
    assert(fails.forall(_.ref_file.isDefined))
    val summary = evs.find(_.category.contains("test-summary")).get
    assert(summary.severity === Severity.Error)
    assert(summary.message.get.contains("3 failed"))
    assert(FormatRegistry.detect(fixture("vitest_run.txt")).map(_.format) === Some("vitest_text"))
  }

  test("github actions deep: workflow annotations through grouped, timestamped log") {
    val evs = GithubActionsParser.parse(fixture("github_actions_run.txt"))
    assert(evs.length === 5)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == "note") === 1)
    assert(evs.find(_.severity == "note").get
      .message.get.contains("annotated on the pull request"))
    assert(evs.exists(_.message.exists(_.contains("Process completed with exit code 1"))))
    assert(evs.exists(_.message.exists(_.startsWith("Cache not found"))))
    assert(FormatRegistry.detect(fixture("github_actions_run.txt")).map(_.format) === Some("github_actions"))
  }

  test("dotnet test deep: Passed/Failed/Skipped with Error Message capture, summary") {
    val evs = DotnetTestParser.parse(fixture("dotnet_test_run.txt"))
    assert(evs.count(_.severity == Severity.TestPass) === 4)
    assert(evs.count(_.severity == Severity.TestFail) === 2)
    val fails = evs.filter(_.severity == Severity.TestFail)
    assert(fails.find(_.test_name.contains("App.Tests.Unit.PricingTests.CompoundRulesStack"))
      .get.message.get.contains("Assert.Equal() Failure"))
    assert(fails.find(_.test_name.contains("App.Tests.Integration.CheckoutTests.EmptyCartThrows"))
      .get.message.get.contains("InvalidOperationException"))
    val summary = evs.find(_.category.contains("test-summary")).get
    assert(summary.severity === Severity.Error)
    assert(summary.message.get.contains("Failed:     2"))
    assert(FormatRegistry.detect(fixture("dotnet_test_run.txt")).map(_.format) === Some("dotnet_test"))
  }

  test("black deep: would-reformat vs reformatted vs cannot-parse") {
    val evs = BlackParser.parse(fixture("black_check.txt"))
    assert(evs.length === 6)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    assert(evs.count(_.severity == Severity.Info) === 2)
    assert(evs.count(_.severity == Severity.Error) === 1)
    val err = evs.find(_.severity == Severity.Error).get
    assert(err.ref_file === Some("app/legacy/compat.py"))
    assert(err.ref_line === Some(102) && err.ref_column === Some(18))
    assert(evs.exists(e => e.severity == Severity.Warning &&
      e.ref_file.contains("app/tasks/scheduler.py")))
    assert(evs.exists(e => e.severity == Severity.Info &&
      e.ref_file.contains("app/settings.py")))
    assert(FormatRegistry.detect(fixture("black_check.txt")).map(_.format) === Some("black_text"))
  }

  test("ktlint deep: rule-tagged style errors incl. test sources, summary ignored") {
    val evs = KtlintParser.parse(fixture("ktlint_run.txt"))
    assert(evs.length === 10)
    assert(evs.forall(_.severity == Severity.Error))
    val r = refs(evs)
    assert(r.contains(("src/main/kotlin/com/example/app/Main.kt", 12)))
    assert(r.contains(("src/main/kotlin/com/example/app/store/Store.kt", 44)))
    assert(r.contains(("src/test/kotlin/com/example/app/MainTest.kt", 22)))
    // two findings on the same line, distinct columns
    assert(evs.count(e => e.ref_file.exists(_.endsWith("Store.kt")) &&
      e.ref_line.contains(44)) === 2)
    assert(evs.find(_.ref_line.contains(8)).get.rule === Some("standard:no-wildcard-imports"))
    assert(FormatRegistry.detect(fixture("ktlint_run.txt")).map(_.format) === Some("ktlint_text"))
  }
}
