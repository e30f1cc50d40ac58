package graft.parse

/** Format registry + auto-detect (S6) + command-pattern hints, mirroring
  * the reference's dispatch behavior (core.py:2020-2102: comma-separated
  * hints tried in order, fall back to auto; core.py:974-1076: command
  * substring → format hint, longest pattern wins).
  */
object FormatRegistry extends Serializable {

  /** Specific formats first; GenericParser is the damped fallback.
    * SwiftParser precedes GccParser: swift diagnostics are a gcc-shaped
    * subset, and Swift's sniff doubles per-.swift-line score so the tie
    * resolves to the more specific tool. */
  val parsers: Seq[LogParser] = Seq(
    SwiftParser, GccParser, MypyParser, PytestParser, EslintParser, CargoParser,
    MakeParser, TscParser, GoTestParser, MavenParser, JestParser,
    PythonTracebackParser, ShellcheckParser, GradleParser, JunitXmlParser,
    RspecParser, GolangciParser, MsbuildParser, CargoJsonParser,
    EslintJsonParser, PhpunitParser, RubocopParser, YamllintParser,
    TerraformParser, DockerBuildParser,
    PylintParser, ClippyDenseParser, CheckstyleParser, SpotbugsParser,
    KtlintParser, JunitTextParser, AnsibleParser, PipParser,
    NginxParser, SyslogParser,
    SbtParser, JavacParser, JavaStackTraceParser, CmakeParser,
    BazelParser, ValgrindParser, Flake8Parser, BlackParser,
    MochaParser, GithubActionsParser, HadolintParser, SqlfluffParser,
    CppcheckParser, ClangTidyParser, PrettierParser, StylelintParser,
    PhpstanParser, GoVetParser, DotnetTestParser, MixParser,
    ShellcheckJsonParser, GoTestJsonParser, BanditJsonParser,
    RubocopJsonParser, HadolintJsonParser, TrivyJsonParser,
    PytestJsonParser,
    RuffParser, VitestParser, DenoLintParser, BiomeParser,
    KubeEventsParser, NpmParser,
    NinjaParser, ConfigureParser, ProtocParser, GitlabCiParser,
    IsortParser, GofmtParser, RustfmtParser, MesonParser,
    GtestParser, PlaywrightParser, CypressParser, WebpackParser,
    ToxParser, PoetryParser, BundlerParser, GhcParser,
    UnittestParser, MinitestParser, CucumberParser, KarmaParser,
    SemgrepParser, K6Parser, CondaParser, PnpmParser,
    PuppetParser, HelmParser, DartParser, KotlincParser,
    LuacheckParser, ZigParser, OcamlParser, RCheckParser,
    SarifParser, TapParser, MarkdownlintParser, GccJsonParser,
    GenericParser)

  private val byFormat: Map[String, LogParser] =
    parsers.map(p => p.format -> p).toMap

  def apply(format: String): Option[LogParser] = byFormat.get(format)

  /** Auto-detect: sample lines, score every parser, take the max
    * (reference behavior: duck_hunt 'auto'; S6 "detection by sampling
    * first N lines per format matcher"). Returns None when nothing
    * scores > 0 — caller emits zero events, no crash. */
  def detect(content: String, sampleLines: Int = 200): Option[LogParser] = {
    val lines = content.linesIterator.take(sampleLines).toArray
    val scored = parsers.map(p => p -> p.sniff(lines)).filter(_._2 > 0)
    if (scored.isEmpty) None else Some(scored.maxBy(_._2)._1)
  }

  /** Parse with a comma-separated format hint; each tried in order, the
    * first that yields events wins; "auto" (or total failure) detects.
    * Mirrors parse_log_content (core.py:2037-2102). */
  def parse(content: String, formatHint: String = "auto"): Seq[ParsedEvent] = {
    val hints = formatHint.split(",").map(_.trim).filter(_.nonEmpty)
    hints.filter(_ != "auto").iterator
      .flatMap(f => byFormat.get(f))
      .map(_.parse(content))
      .collectFirst { case evs if evs.nonEmpty => evs }
      // all explicit hints failed to produce events → auto-detect
      // (reference falls back to 'auto' on parse failure)
      .getOrElse(detect(content).map(_.parse(content)).getOrElse(Seq.empty))
  }

  /** Command string → format hint (core.py:974-1076 semantics: substring
    * match, longest pattern first, "auto" when unknown). */
  val commandHints: Map[String, String] = Map(
    "prove" -> "tap_text",
    "bats" -> "tap_text",
    "markdownlint" -> "markdownlint_text",
    "codeql database analyze" -> "sarif_json",
    "gcc -fdiagnostics-format=json" -> "gcc_json",
    "pytest" -> "pytest_text",
    "python -m pytest" -> "pytest_text",
    "mypy" -> "mypy_text",
    "gcc" -> "gcc_text",
    "g++" -> "gcc_text",
    "clang" -> "gcc_text",
    "cc " -> "gcc_text",
    "cargo build" -> "cargo_build",
    "cargo check" -> "cargo_build",
    "eslint" -> "eslint_text",
    "make" -> "make_error",
    "tsc" -> "tsc_text",
    "go test" -> "go_test",
    "mvn" -> "maven_build",
    "jest" -> "jest_text",
    "shellcheck" -> "shellcheck_text",
    "gradle" -> "gradle_build",
    "gradlew" -> "gradle_build",
    "rspec" -> "rspec_text",
    "golangci-lint" -> "golangci_lint",
    "dotnet build" -> "msbuild",
    "msbuild" -> "msbuild",
    "phpunit" -> "phpunit_text",
    "rubocop" -> "rubocop_text",
    "yamllint" -> "yamllint_text",
    "terraform" -> "terraform_text",
    "docker build" -> "docker_build",
    "ruff" -> "ruff_text",
    "pylint" -> "pylint_text",
    "cargo clippy" -> "clippy_dense",
    "checkstyle" -> "checkstyle_text",
    "spotbugs" -> "spotbugs_text",
    "findbugs" -> "spotbugs_text",
    "ktlint" -> "ktlint_text",
    "swiftc" -> "swift_text",
    "swift build" -> "swift_text",
    "xcodebuild" -> "swift_text",
    "ansible-playbook" -> "ansible_text",
    "ansible" -> "ansible_text",
    "pip install" -> "pip_text",
    "pip3 install" -> "pip_text",
    "uv pip" -> "pip_text",
    "uv add" -> "pip_text",
    "surefire" -> "junit_text",
    "sbt" -> "sbt_text",
    "scalac" -> "sbt_text",
    "javac" -> "javac_text",
    "cmake" -> "cmake_build",
    "bazel" -> "bazel_build",
    "valgrind" -> "valgrind",
    "flake8" -> "flake8_text",
    "black" -> "black_text",
    "mocha" -> "mocha_chai_text",
    "npm test" -> "mocha_chai_text",
    "yarn test" -> "mocha_chai_text",
    "hadolint" -> "hadolint_text",
    "sqlfluff" -> "sqlfluff_text",
    "gh run view" -> "github_actions",
    "cppcheck" -> "cppcheck_text",
    "clang-tidy" -> "clang_tidy",
    "prettier" -> "prettier_text",
    "stylelint" -> "stylelint_text",
    "phpstan" -> "phpstan_raw",
    "go vet" -> "govet_text",
    "dotnet test" -> "dotnet_test",
    "mix compile" -> "mix_compile",
    "mix test" -> "mix_compile",
    "bandit" -> "bandit_json",
    "trivy" -> "trivy_json",
    "vitest" -> "vitest_text",
    "deno lint" -> "deno_lint",
    "biome" -> "biome_lint",
    "kubectl get events" -> "kube_events",
    "npm install" -> "npm_err",
    "npm ci" -> "npm_err",
    "ninja" -> "ninja_build",
    "./configure" -> "configure_text",
    "protoc" -> "protoc_text",
    "isort" -> "isort_text",
    "gofmt" -> "gofmt_text",
    "rustfmt" -> "rustfmt_text",
    "cargo fmt" -> "rustfmt_text",
    "meson" -> "meson_build",
    "playwright" -> "playwright_text",
    "cypress" -> "cypress_text",
    "webpack" -> "webpack_text",
    "tox" -> "tox_text",
    "poetry install" -> "poetry_text",
    "poetry add" -> "poetry_text",
    "bundle install" -> "bundler_text",
    "ghc" -> "ghc_text",
    "stack build" -> "ghc_text",
    "cabal build" -> "ghc_text",
    "python -m unittest" -> "unittest_text",
    "cucumber" -> "cucumber_text",
    "karma" -> "karma_text",
    "semgrep" -> "semgrep_text",
    "k6 run" -> "k6_text",
    "conda install" -> "conda_text",
    "conda create" -> "conda_text",
    "pnpm install" -> "pnpm_text",
    "pnpm add" -> "pnpm_text",
    "puppet apply" -> "puppet_text",
    "puppet agent" -> "puppet_text",
    "helm lint" -> "helm_lint",
    "dart analyze" -> "dart_analyze",
    "flutter analyze" -> "dart_analyze",
    "kotlinc" -> "kotlinc_text",
    "luacheck" -> "luacheck_text",
    "zig build" -> "zig_text",
    "dune build" -> "ocaml_text",
    "ocamlfind" -> "ocaml_text",
    "r cmd check" -> "r_check")

  def detectFormatFromCommand(cmd: String): String = {
    val lower = cmd.toLowerCase
    commandHints.keys.toSeq.sortBy(-_.length)
      .collectFirst { case p if lower.contains(p) => commandHints(p) }
      .getOrElse("auto")
  }
}
