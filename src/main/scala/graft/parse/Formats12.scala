package graft.parse

import graft.model.Severity

/** Twelfth wave of format parsers — test-framework and packaging tier:
  * GoogleTest, Playwright, Cypress, webpack, tox, poetry, bundler,
  * GHC. Pattern knowledge is from the tools' public output formats; no
  * reference code is reproduced.
  */

object GtestParser extends LogParser {
  val format = "gtest_text"
  val tool = "gtest"
  // [ RUN      ] MathTest.Adds
  // [       OK ] MathTest.Adds (0 ms)
  // [  FAILED  ] MathTest.Divides (1 ms)
  // math_test.cc:42: Failure
  private val run = """^\[\s*RUN\s*\]\s+([\w./]+)$""".r
  private val ok = """^\[\s*OK\s*\]\s+([\w./]+).*$""".r
  private val failed = """^\[\s*FAILED\s*\]\s+([\w./]+)(?:\s+\(.*\))?$""".r
  private val loc = """^([^:\s]+\.(?:cc|cpp|h)):(\d+):\s*Failure\s*$""".r
  // whole-line capture: EXPECT_EQ's real first line is "Expected
  // equality of these values:" (keyword NOT followed by a colon), and
  // the keyword-prefixed line reads better as the message than its
  // post-colon tail alone
  private val expect = """^((?:Expected|Value of|Actual|Which is)\b.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => run.findFirstIn(l).isDefined || ok.findFirstIn(l).isDefined ||
      failed.findFirstIn(l).isDefined)

  // [  PASSED  ] 6 tests. / [  FAILED  ] 3 tests, listed below: — after
  // this marker gtest RE-LISTS every failed test; those lines must not
  // double-count.
  private val tally = """^\[\s*(?:PASSED|FAILED)\s*\]\s+\d+ tests?[.,].*$""".r

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var lastLoc: Option[(String, Int)] = None
    var lastExpect: Option[String] = None
    var done = false
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case tally() => done = true
      case ok(test) if !done =>
        out += mk(idx, i + 1, Severity.TestPass, s"$test passed", test,
          "test", test = Some(test))
        idx += 1; lastLoc = None; lastExpect = None
      case failed(test) if !done =>
        out += mk(idx, i + 1, Severity.TestFail,
          lastExpect.getOrElse(s"$test failed"), test, "test",
          test = Some(test), file = lastLoc.map(_._1), line = lastLoc.map(_._2))
        idx += 1; lastLoc = None; lastExpect = None
      case loc(file, line) => lastLoc = Some((file, line.toInt))
      case expect(what) if lastExpect.isEmpty => lastExpect = Some(what)
      case _ =>
    }
    out.result()
  }
}

object PlaywrightParser extends LogParser {
  val format = "playwright_text"
  val tool = "playwright"
  //   ✓  1 [chromium] › auth.spec.ts:12:5 › login works (2.1s)
  //   ✘  2 [firefox] › cart.spec.ts:30:3 › checkout fails (900ms)
  //   1 failed / 12 passed (30.2s)
  private val result =
    """^\s*([✓✘×])\s+\d+\s+\[([\w-]+)\]\s+›\s+([^:\s]+):(\d+):(\d+)\s+›\s+(.*?)\s+\([\d.]+m?s\)$""".r
  private val summary = """^\s*\d+ (?:failed|passed|skipped|flaky)\b.*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => result.findFirstIn(l).isDefined) * 2 +
      lines.count(l => summary.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case result(mark, browser, file, line, colN, test) =>
        val sev = if (mark == "✓") Severity.TestPass else Severity.TestFail
        out += mk(idx, i + 1, sev, s"[$browser] $test", raw, "test",
          test = Some(test), rule = Some(browser),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object CypressParser extends LogParser {
  val format = "cypress_text"
  val tool = "cypress"
  //   Running:  auth.cy.ts                          (1 of 3)
  //   ✓ logs in (800ms)
  //   1) shows error banner
  //   Tests:        5   /   Passing:      4   /   Failing:      1
  private val running = """^\s*Running:\s+(\S+)\s+\(\d+ of \d+\)$""".r
  private val pass = """^\s*✓\s+(.*?)(?:\s+\(\d+m?s\))?$""".r
  private val failNum = """^\s*(\d+)\)\s+(.*?):?$""".r
  private val stat = """^\s*(Tests|Passing|Failing|Pending|Skipped):\s+(\d+)\s*$""".r

  def sniff(lines: Array[String]): Int = {
    val r = lines.count(l => running.findFirstIn(l).isDefined)
    if (r == 0) 0
    else r * 3 + lines.count(l => pass.findFirstIn(l).isDefined ||
      stat.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var currentSpec: Option[String] = None
    var pending: Option[(String, Int)] = None
    def flush(msg: Option[String]): Unit = pending.foreach { case (test, ln) =>
      out += mk(idx, ln, Severity.TestFail, msg.getOrElse(s"$test failed"),
        test, "test", test = Some(test), file = currentSpec)
      idx += 1; pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case running(spec) => flush(None); currentSpec = Some(spec)
      case failNum(_, test) => flush(None); pending = Some((test, i + 1))
      case pass(test) =>
        flush(None)
        out += mk(idx, i + 1, Severity.TestPass, s"$test passed", test,
          "test", test = Some(test), file = currentSpec)
        idx += 1
      case l if pending.isDefined && l.trim.nonEmpty &&
          stat.findFirstIn(l).isEmpty => flush(Some(l.trim))
      case _ => if (stat.findFirstIn(raw).isDefined) flush(None)
    }
    flush(None)
    out.result()
  }
}

object WebpackParser extends LogParser {
  val format = "webpack_text"
  val tool = "webpack"
  // ERROR in ./src/app.js 12:4-18
  // Module not found: Error: Can't resolve './missing'
  // webpack 5.88.0 compiled with 1 error in 1234 ms
  private val head = """^(ERROR|WARNING) in (\S+?)(?:\s+(\d+):(\d+)(?:-\d+)?)?$""".r
  private val compiled =
    """^webpack [\d.]+ compiled (?:successfully|with \d+ (?:errors?|warnings?).*) in \d+ ms$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => head.findFirstIn(l).isDefined) * 2 +
      lines.count(l => compiled.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, String, Option[Int], Option[Int], Int)] = None
    def flush(msg: Option[String]): Unit =
      pending.foreach { case (sev, file, line, colN, ln) =>
        out += mk(idx, ln, sev.toLowerCase, msg.getOrElse(s"$sev in $file"),
          s"$sev in $file", "build", file = Some(file), line = line, col = colN)
        idx += 1; pending = None
      }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case head(sev, file, line, colN) =>
        flush(None)
        pending = Some((sev, file, Option(line).map(_.toInt),
          Option(colN).map(_.toInt), i + 1))
      case l if pending.isDefined && l.trim.nonEmpty &&
          compiled.findFirstIn(l).isEmpty => flush(Some(l.trim))
      case _ =>
    }
    flush(None)
    out.result()
  }
}

object ToxParser extends LogParser {
  val format = "tox_text"
  val tool = "tox"
  // py311: commands succeeded  /  ERROR: py39: commands failed
  // ERROR: py38: InterpreterNotFound: python3.8
  private val envOk = """^\s*(\S+): (?:commands succeeded|OK).*$""".r
  private val envErr = """^\s*ERROR:\s+(\S+?):\s+(.*)$""".r
  private val congrats = """^\s*congratulations :\).*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => envOk.findFirstIn(l).isDefined ||
      envErr.findFirstIn(l).isDefined || congrats.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case envErr(env, msg) =>
        out += mk(idx, i + 1, Severity.Error, s"$env: $msg", raw, "test",
          test = Some(env))
        idx += 1
      case envOk(env) =>
        out += mk(idx, i + 1, Severity.TestPass, s"$env succeeded", raw,
          "test", test = Some(env))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object PoetryParser extends LogParser {
  val format = "poetry_text"
  val tool = "poetry"
  // SolverProblemError / Because myapp depends on foo (^9.0) which doesn't match any versions...
  private val solverErr = """^\s*(SolverProblemError|PackageNotFound|VersionConflict)\s*$""".r
  private val because = """^\s*Because\s+(.*)$""".r
  private val installing = """^\s*(?:•\s+)?Installing\s+(\S+)\s+\(([\w.]+)\).*$""".r

  def sniff(lines: Array[String]): Int = {
    val ctx = lines.count(l => installing.findFirstIn(l).isDefined ||
      solverErr.findFirstIn(l).isDefined)
    if (ctx == 0) 0
    else ctx * 2 + lines.count(l => because.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var inSolverError = false
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case solverErr(kind) => inSolverError = true
        out += mk(idx, i + 1, Severity.Error, kind, raw, "deps", code = Some(kind))
        idx += 1
      case because(msg) if inSolverError =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "deps")
        idx += 1; inSolverError = false
      case installing(pkg, ver) =>
        out += mk(idx, i + 1, Severity.Info, s"installing $pkg $ver", raw, "deps")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object BundlerParser extends LogParser {
  val format = "bundler_text"
  val tool = "bundler"
  // Could not find gem 'rails (~> 9.0)' in rubygems repository
  // Bundler could not find compatible versions for gem "rack":
  private val notFound = """^Could not find gem '([^']+)'.*$""".r
  private val conflict = """^Bundler could not find compatible versions for gem "([^"]+)":?$""".r
  private val using = """^Using\s+(\S+)\s+([\w.]+)$""".r
  private val complete = """^Bundle complete!.*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => notFound.findFirstIn(l).isDefined ||
      conflict.findFirstIn(l).isDefined || complete.findFirstIn(l).isDefined) * 2 +
      lines.count(l => using.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case notFound(gem) =>
        out += mk(idx, i + 1, Severity.Error, s"gem not found: $gem", raw, "deps")
        idx += 1
      case conflict(gem) =>
        out += mk(idx, i + 1, Severity.Error, s"version conflict: $gem", raw, "deps")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object GhcParser extends LogParser {
  val format = "ghc_text"
  val tool = "ghc"
  // src/Main.hs:12:5: error: Variable not in scope: foo
  // src/Lib.hs:7:1: warning: [-Wunused-imports] The import of Data.List is redundant
  private val diag =
    """^([^:\s]+\.l?hs):(\d+):(\d+)(?:-\d+)?:\s*(error|warning):\s*(?:\[([-\w]+)\]\s*)?(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    // GHC's standard layout puts the message on the following indented
    // lines ("src/Foo.hs:31:12: error:" then the text) — when the head
    // line carries no message, adopt the first non-empty continuation.
    var pending: Option[(String, Int, Int, String, Option[String], Int)] = None
    def flush(msg: Option[String]): Unit = pending.foreach {
      case (file, line, colN, sev, flag, ln) =>
        // a pending head with no continuation seen falls back to a
        // location-derived message built from ITS OWN fields
        val m = msg.getOrElse(s"$sev at $file:$line")
        out += mk(idx, ln, sev, m, m, "compile",
          rule = flag, file = Some(file), line = Some(line), col = Some(colN))
        idx += 1; pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, flag, msg) =>
        flush(None)
        if (msg.trim.nonEmpty)
          out += { val e = mk(idx, i + 1, sev, msg, raw, "compile",
            rule = Option(flag), file = Some(file),
            line = Some(line.toInt), col = Some(colN.toInt)); idx += 1; e }
        else pending = Some((file, line.toInt, colN.toInt, sev, Option(flag), i + 1))
      case l if pending.isDefined && l.trim.nonEmpty =>
        flush(Some(l.trim))
      case _ =>
    }
    flush(None)
    out.result()
  }
}
