package graft

import graft.model.Severity
import graft.parse._

/** Real-world-shaped fixture corpus, tier 4b (16 text formats): biome,
  * deno lint, gofmt, go vet, isort, rustfmt, prettier, mix, nginx
  * error log, syslog, ninja, autoconf configure, protoc, meson, conda,
  * pnpm. Same contract as tiers 1-4a: ≥30-line realistic logs, exact
  * counts, exact anchors, detect() assertions. Parser fixes surfaced
  * by this tier: biome's bare `format`/`parse` categories (the old
  * regex required a slash and dropped every formatter diagnostic) and
  * conda's blank-line reset (real output blank-separates the error
  * head from its package list, which the old reset discarded).
  */
class DeepFixturesSpec5 extends SparkSpec {

  private def fixture(name: String): String = {
    val src = scala.io.Source.fromResource(s"logs/deep/$name")(scala.io.Codec.UTF8)
    try src.mkString finally src.close()
  }

  private def detected(name: String): Option[String] =
    FormatRegistry.detect(fixture(name)).map(_.format)

  test("biome deep: slash rules AND bare format category, ✖ messages attached") {
    val evs = BiomeParser.parse(fixture("biome_check.txt"))
    assert(evs.length === 6)
    assert(evs.forall(_.severity == Severity.Warning))
    assert(evs.flatMap(_.rule).toSet === Set(
      "lint/correctness/noUnusedVariables", "lint/suspicious/noDoubleEquals",
      "lint/suspicious/noConsoleLog", "lint/style/noVar", "format",
      "lint/correctness/useExhaustiveDependencies"))
    val unused = evs.find(_.rule.contains("lint/correctness/noUnusedVariables")).get
    assert(unused.ref_file === Some("src/components/Cart.jsx"))
    assert(unused.ref_line === Some(14) && unused.ref_column === Some(9))
    assert(unused.message === Some("This variable subtotal is unused."))
    // the formatter diagnostic (bare `format`, no slash) is an event
    val fmt = evs.find(_.rule.contains("format")).get
    assert(fmt.ref_file === Some("src/api/client.js") && fmt.ref_line === Some(130))
    assert(detected("biome_check.txt") === Some("biome_lint"))
  }

  test("deno lint deep: rule-coded heads, --> locations, mixed severities") {
    val evs = DenoLintParser.parse(fixture("deno_lint.txt"))
    assert(evs.length === 4)
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 1)
    assert(evs.flatMap(_.rule).toSet === Set("no-unused-vars", "no-explicit-any",
      "no-deprecated-deno-api", "require-await"))
    val dep = evs.find(_.rule.contains("no-deprecated-deno-api")).get
    assert(dep.severity === Severity.Warning)
    assert(dep.ref_file === Some("/work/shop/tools/spawn.ts"))
    assert(dep.ref_line === Some(8) && dep.ref_column === Some(17))
    assert(detected("deno_lint.txt") === Some("deno_lint"))
  }

  test("gofmt deep: -l list mode, every path an event") {
    val evs = GofmtParser.parse(fixture("gofmt_files.txt"))
    assert(evs.length === 32)
    assert(evs.forall(_.severity == Severity.Warning))
    assert(evs.head.message === Some("needs gofmt: cmd/api/main.go"))
    assert(evs.flatMap(_.ref_file).contains("internal/payment/gateway/stripe.go"))
    assert(detected("gofmt_files.txt") === Some("gofmt_text"))
  }

  test("go vet deep: analyzer messages, package headers skipped, vet: prefix") {
    val evs = GoVetParser.parse(fixture("govet_run.txt"))
    assert(evs.length === 24)
    assert(evs.forall(_.severity == Severity.Warning))
    val unreachable = evs.find(_.message.contains("unreachable code")).get
    assert(unreachable.ref_file === Some("internal/cache/lru.go"))
    assert(unreachable.ref_line === Some(87) && unreachable.ref_column === Some(2))
    // the `vet:`-prefixed type-error form still anchors
    val undef = evs.find(_.message.exists(_.startsWith("undefined:"))).get
    assert(undef.ref_file === Some("tools/seed/main.go"))
    assert(undef.ref_line === Some(22) && undef.ref_column === Some(14))
    assert(detected("govet_run.txt") === Some("govet_text"))
  }

  test("isort deep: ERROR unsorted vs Fixing fixed split") {
    val evs = IsortParser.parse(fixture("isort_run.txt"))
    assert(evs.length === 30)
    assert(evs.count(_.severity == Severity.Warning) === 11) // ERROR: unsorted
    assert(evs.count(_.severity == Severity.Info) === 19) // Fixing
    assert(evs.exists(e => e.severity == Severity.Warning &&
      e.ref_file.contains("/work/shop/tests/conftest.py")))
    assert(evs.exists(e => e.severity == Severity.Info &&
      e.ref_file.contains("/work/shop/app/cli.py")))
    assert(detected("isort_run.txt") === Some("isort_text"))
  }

  test("rustfmt deep: Diff headers anchor file+line, diff bodies skipped") {
    val evs = RustfmtParser.parse(fixture("rustfmt_diff.txt"))
    assert(evs.length === 6)
    assert(evs.forall(_.severity == Severity.Warning))
    assert(evs.count(_.ref_file.contains("/work/shop/src/cart/total.rs")) === 2)
    assert(evs.map(_.ref_line.get).toSet === Set(4, 38, 61, 12, 57, 3))
    assert(detected("rustfmt_diff.txt") === Some("rustfmt_text"))
  }

  test("prettier deep: [warn] files, [error] syntax failures with position") {
    val evs = PrettierParser.parse(fixture("prettier_check.txt"))
    assert(evs.length === 29)
    assert(evs.count(_.severity == Severity.Warning) === 27) // matches its own summary
    assert(evs.count(_.severity == Severity.Error) === 2)
    val syn = evs.find(_.ref_file.contains("src/legacy/tracker.js")).get
    assert(syn.message === Some("SyntaxError: Unexpected token"))
    assert(syn.ref_line === Some(88) && syn.ref_column === Some(15))
    assert(evs.exists(_.ref_file.contains("src/pages/orders/[id].jsx")))
    assert(detected("prettier_check.txt") === Some("prettier_text"))
  }

  test("mix deep: multi-line warnings bind their trailing location; ** errors coded") {
    val evs = MixParser.parse(fixture("mix_compile.txt"))
    assert(evs.length === 7)
    assert(evs.count(_.severity == Severity.Error) === 2)
    assert(evs.count(_.severity == Severity.Warning) === 5)
    assert(evs.flatMap(_.code).toSet === Set("CompileError", "MatchError"))
    val compile = evs.find(_.code.contains("CompileError")).get
    assert(compile.ref_file === Some("lib/shop_web/live/cart_live.ex"))
    assert(compile.ref_line === Some(114))
    // a warning whose body spans blank + suggestion lines still finds
    // its `lib/...:NN` location
    val undefWarn = evs.find(_.message.exists(_.contains("charge/2"))).get
    assert(undefWarn.ref_file === Some("lib/shop/api/checkout.ex"))
    assert(undefWarn.ref_line === Some(91))
    assert(detected("mix_compile.txt") === Some("mix_compile"))
  }

  test("nginx error log deep: full level ladder emerg..info") {
    val evs = NginxParser.parse(fixture("nginx_error.log"))
    assert(evs.length === 31)
    assert(evs.count(_.severity == Severity.Error) === 9) // error+crit+alert+emerg
    assert(evs.count(_.severity == Severity.Warning) === 4)
    assert(evs.count(_.severity == Severity.Note) === 15) // notice
    assert(evs.count(_.severity == Severity.Info) === 3)
    assert(evs.exists(_.message.exists(_.startsWith("bind() to 0.0.0.0:443 failed"))))
    assert(evs.exists(_.message.exists(_.contains("SSL_do_handshake() failed"))))
    assert(detected("nginx_error.log") === Some("nginx_error"))
  }

  test("syslog deep: keyword severities, process as rule, host in message") {
    val evs = SyslogParser.parse(fixture("syslog_sample.txt"))
    assert(evs.length === 31)
    assert(evs.count(_.severity == Severity.Error) === 7)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == Severity.Info) === 22)
    assert(evs.count(e => e.severity == Severity.Error &&
      e.message.exists(_.contains("Failed password"))) === 2)
    assert(evs.exists(e => e.rule.contains("kernel") &&
      e.message.exists(_.contains("Out of memory"))))
    assert(evs.forall(_.message.exists(_.startsWith("[web-a-01]"))))
    assert(detected("syslog_sample.txt") === Some("syslog_text"))
  }

  test("ninja deep: FAILED targets + build stopped; compiler noise left to gcc") {
    val evs = NinjaParser.parse(fixture("ninja_build.txt"))
    assert(evs.length === 3)
    assert(evs.forall(_.severity == Severity.Error))
    assert(evs.flatMap(_.ref_file).toSet ===
      Set("obj/payment/charge.o", "obj/reporting/daily.o"))
    assert(evs.exists(_.message.contains("subcommand failed.")))
    assert(detected("ninja_build.txt") === Some("ninja_build"))
  }

  test("configure deep: missing checks as info, WARNING/error verdicts") {
    val evs = ConfigureParser.parse(fixture("configure_run.txt"))
    assert(evs.length === 8)
    assert(evs.count(_.severity == Severity.Error) === 1)
    assert(evs.count(_.severity == Severity.Warning) === 2)
    assert(evs.count(_.severity == Severity.Info) === 5) // "... no" checks
    assert(evs.exists(_.message.contains("missing: libzstd")))
    assert(evs.exists(_.message.contains("missing: libpq")))
    assert(evs.find(_.severity == Severity.Error).get.message.get
      .startsWith("PostgreSQL client library"))
    assert(detected("configure_run.txt") === Some("configure_text"))
  }

  test("protoc deep: line:col diagnostics as errors, file-level warning/error forms") {
    val evs = ProtocParser.parse(fixture("protoc_run.txt"))
    assert(evs.length === 30)
    assert(evs.count(_.severity == Severity.Error) === 26)
    assert(evs.count(_.severity == Severity.Warning) === 4)
    val semi = evs.find(_.ref_line.contains(14)).get
    assert(semi.ref_file === Some("api/v1/order.proto") && semi.ref_column === Some(3))
    assert(semi.message === Some("Expected \";\"."))
    assert(evs.exists(e => e.severity == Severity.Warning &&
      e.ref_file.contains("api/v1/customer.proto") &&
      e.message.exists(_.contains("address.proto is unused"))))
    assert(evs.exists(e => e.severity == Severity.Error &&
      e.ref_file.contains("api/v1/catalog.proto") &&
      e.message.exists(_.contains("Invalid control characters"))))
    assert(detected("protoc_run.txt") === Some("protoc_text"))
  }

  test("meson deep: setup chatter skipped, file:line:col ERROR/WARNING anchored") {
    val evs = MesonParser.parse(fixture("meson_setup.txt"))
    assert(evs.length === 6)
    assert(evs.count(_.severity == Severity.Error) === 3)
    assert(evs.count(_.severity == Severity.Warning) === 3)
    val dep = evs.find(_.message.exists(_.startsWith("Dependency \"liburing\""))).get
    assert(dep.ref_file === Some("meson.build") && dep.ref_line === Some(41))
    assert(evs.exists(_.ref_file.contains("subprojects/redisclient/meson.build")))
    assert(evs.exists(_.ref_file.contains("subprojects/sqlite/meson.build")))
    assert(detected("meson_setup.txt") === Some("meson_build"))
  }

  test("conda deep: blank-separated package lists survive; channel URLs don't leak") {
    val evs = CondaParser.parse(fixture("conda_create.txt"))
    assert(evs.length === 8)
    assert(evs.forall(_.severity == Severity.Error))
    assert(evs.flatMap(_.code).toSet ===
      Set("PackagesNotFoundError", "ResolvePackageNotFound", "CondaError"))
    val pkgs = evs.filter(_.message.exists(_.startsWith("not found:")))
    assert(pkgs.map(_.message.get).toSet === Set(
      "not found: torchvision=0.19.2", "not found: flash-attn=2.6",
      "not found: nosuchlib=9.9", "not found: cudatoolkit=12.9",
      "not found: mkl=2099.0"))
    // the indented channel-URL bullets under "Current channels:" must
    // NOT be read as missing packages
    assert(!evs.exists(_.message.exists(_.contains("repo.anaconda.com"))))
    assert(detected("conda_create.txt") === Some("conda_text"))
  }

  test("pnpm deep: ERR_PNPM codes, WARN deprecations, peer-dep tree skipped") {
    val evs = PnpmParser.parse(fixture("pnpm_install.txt"))
    assert(evs.length === 6)
    assert(evs.count(_.severity == Severity.Error) === 1)
    assert(evs.count(_.severity == Severity.Warning) === 5)
    val err = evs.find(_.severity == Severity.Error).get
    assert(err.code === Some("ERR_PNPM_PEER_DEP_ISSUES"))
    assert(err.message === Some("Unmet peer dependencies"))
    assert(evs.exists(_.message.exists(_.startsWith("deprecated left-pad@1.3.0"))))
    assert(detected("pnpm_install.txt") === Some("pnpm_text"))
  }
}
