package graft.parse

import graft.model.Severity

/** Thirteenth wave of format parsers: python unittest, ruby minitest,
  * cucumber, karma/jasmine, semgrep, k6, conda, pnpm. Pattern
  * knowledge is from the tools' public output formats; no reference
  * code is reproduced.
  */

object UnittestParser extends LogParser {
  val format = "unittest_text"
  val tool = "unittest"
  // test_parse (tests.test_core.ParserTest) ... ok      (verbose line)
  // FAIL: test_store (tests.test_core.StoreTest)        (detail block)
  // Ran 5 tests in 0.123s  /  FAILED (failures=1)
  // Verbose FAIL/ERROR lines are ignored — the detail block that
  // always follows carries the assertion message, so counting both
  // would double-report the failure.
  private val verbose = """^(\w+) \(([\w.]+)\) \.\.\. (ok|FAIL|ERROR|skipped.*)$""".r
  private val detail = """^(FAIL|ERROR): (\w+) \(([\w.]+)\)\s*$""".r
  private val ran = """^Ran (\d+) tests? in [\d.]+s$""".r
  private val verdict = """^(OK|FAILED)(?: \((.*)\))?\s*$""".r
  private val assertLine = """^(?:AssertionError|.*Error):\s*(.*)$""".r

  def sniff(lines: Array[String]): Int = {
    val r = lines.count(l => ran.findFirstIn(l).isDefined)
    if (r == 0) 0
    else r * 2 + lines.count(l => verbose.findFirstIn(l).isDefined ||
      detail.findFirstIn(l).isDefined || verdict.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, String, Int)] = None
    def flush(msg: Option[String]): Unit = pending.foreach { case (kind, test, ln) =>
      out += mk(idx, ln, Severity.TestFail,
        msg.getOrElse(s"$test $kind"), test, "test", test = Some(test))
      idx += 1; pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case verbose(test, cls, "ok") =>
        flush(None)
        out += mk(idx, i + 1, Severity.TestPass, s"$cls.$test passed",
          raw, "test", test = Some(s"$cls.$test"))
        idx += 1
      case verbose(_, _, _) => flush(None) // FAIL/ERROR counted via detail block
      case detail(kind, test, cls) =>
        flush(None); pending = Some((kind, s"$cls.$test", i + 1))
      case assertLine(msg) if pending.isDefined => flush(Some(msg))
      case verdict(v, detailTxt) =>
        flush(None)
        val sev = if (v == "OK") Severity.Info else Severity.Error
        out += mk(idx, i + 1, sev,
          Option(detailTxt).map(d => s"$v ($d)").getOrElse(v), raw, "test-summary")
        idx += 1
      case _ =>
    }
    flush(None)
    out.result()
  }
}

object MinitestParser extends LogParser {
  val format = "minitest_text"
  val tool = "minitest"
  // 1) Failure:
  // UserTest#test_email [test/user_test.rb:42]:
  // Expected false to be truthy.
  // 5 runs, 8 assertions, 1 failures, 0 errors, 0 skips
  private val failHead = """^\s*\d+\) (Failure|Error):\s*$""".r
  private val testLoc = """^(\w+)#(\w+) \[([^:\]]+):(\d+)\]:?\s*$""".r
  private val counts =
    """^(\d+) runs?, (\d+) assertions?, (\d+) failures?, (\d+) errors?(?:, (\d+) skips?)?.*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => counts.findFirstIn(l).isDefined) * 3 +
      lines.count(l => failHead.findFirstIn(l).isDefined ||
        testLoc.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var inFail = false
    var pending: Option[(String, String, Int, Int)] = None // test, file, line, lineNo
    def flush(msg: Option[String]): Unit = pending.foreach { case (test, file, ln, at) =>
      out += mk(idx, at, Severity.TestFail, msg.getOrElse(s"$test failed"),
        test, "test", test = Some(test), file = Some(file), line = Some(ln))
      idx += 1; pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case failHead(_) => flush(None); inFail = true
      case testLoc(cls, test, file, line) if inFail =>
        pending = Some((s"$cls#$test", file, line.toInt, i + 1)); inFail = false
      case counts(runs, _, failures, errors, _) =>
        flush(None)
        val bad = failures.toInt + errors.toInt
        out += mk(idx, i + 1, if (bad > 0) Severity.Error else Severity.Info,
          s"$runs runs, $failures failures, $errors errors", raw, "test-summary")
        idx += 1
      case l if pending.isDefined && l.trim.nonEmpty => flush(Some(l.trim))
      case _ =>
    }
    flush(None)
    out.result()
  }
}

object CucumberParser extends LogParser {
  val format = "cucumber_text"
  val tool = "cucumber"
  // Failing Scenarios:
  // cucumber features/checkout.feature:12 # Scenario: pay with card
  // 8 scenarios (1 failed, 7 passed)
  private val failing = """^cucumber (\S+\.feature):(\d+) # Scenario: (.*)$""".r
  private val scenarios =
    """^(\d+) scenarios? \(([^)]*)\)\s*$""".r
  private val steps = """^(\d+) steps? \(([^)]*)\)\s*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => failing.findFirstIn(l).isDefined) * 2 +
      lines.count(l => scenarios.findFirstIn(l).isDefined ||
        steps.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case failing(file, line, name) =>
        out += mk(idx, i + 1, Severity.TestFail, s"scenario failed: $name",
          raw, "test", test = Some(name), file = Some(file), line = Some(line.toInt))
        idx += 1
      case scenarios(n, detail) =>
        val sev = if (detail.contains("failed")) Severity.Error else Severity.Info
        out += mk(idx, i + 1, sev, s"$n scenarios ($detail)", raw, "test-summary")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object KarmaParser extends LogParser {
  val format = "karma_text"
  val tool = "karma"
  // Chrome 115.0.0 (Linux) Calculator adds numbers FAILED
  //         Expected 2 to be 0.
  // Chrome 115.0.0 (Linux): Executed 5 of 5 (1 FAILED) (0.1 secs / 0.05 secs)
  private val result =
    """^(\w+ [\d.]+ \([\w\s]+\))\s+(.*?)\s+(FAILED|SUCCESS)\s*$""".r
  private val executed =
    """^(\w+ [\d.]+ \([\w\s]+\)): Executed (\d+) of (\d+)(?:\s+\((\d+) FAILED\))?.*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => executed.findFirstIn(l).isDefined) * 3 +
      lines.count(l => result.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, String, Int)] = None
    def flush(msg: Option[String]): Unit = pending.foreach { case (browser, test, ln) =>
      out += mk(idx, ln, Severity.TestFail, msg.getOrElse(s"$test failed"),
        test, "test", test = Some(test), rule = Some(browser))
      idx += 1; pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case executed(browser, _, total, failed) =>
        flush(None)
        val f = Option(failed).map(_.toInt).getOrElse(0)
        out += mk(idx, i + 1, if (f > 0) Severity.Error else Severity.Info,
          s"executed $total, $f failed", raw, "test-summary", rule = Some(browser))
        idx += 1
      case result(browser, test, "FAILED") =>
        flush(None); pending = Some((browser, test, i + 1))
      case result(_, _, _) => flush(None)
      case l if pending.isDefined && l.trim.nonEmpty => flush(Some(l.trim))
      case _ =>
    }
    flush(None)
    out.result()
  }
}

object SemgrepParser extends LogParser {
  val format = "semgrep_text"
  val tool = "semgrep"
  //   app/db.py
  //      python.lang.security.audit.formatted-sql-query
  //         12┆ cursor.execute(f"SELECT * FROM {table}")
  private val fileHead = """^\s{2}(\S+\.[a-z]{1,4})\s*$""".r
  private val ruleLine = """^\s+([a-z][\w.-]+\.[\w.-]+)\s*$""".r
  private val finding = """^\s+(\d+)┆\s*(.*)$""".r

  def sniff(lines: Array[String]): Int = {
    val f = lines.count(l => finding.findFirstIn(l).isDefined)
    if (f == 0) 0 else f * 2 + lines.count(l => ruleLine.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var currentFile: Option[String] = None
    var currentRule: Option[String] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case fileHead(file) => currentFile = Some(file)
      case ruleLine(rule) if rule.contains(".") => currentRule = Some(rule)
      case finding(line, snippet) =>
        out += mk(idx, i + 1, Severity.Warning, snippet.trim, raw, "security",
          rule = currentRule, file = currentFile, line = Some(line.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object K6Parser extends LogParser {
  val format = "k6_text"
  val tool = "k6"
  // ✓ status is 200  /  ✗ response time < 500ms
  //      ↳  95% — ✓ 950 / ✗ 50
  // checks.........................: 95.00% ✓ 1900 ✗ 100
  private val check = """^\s*([✓✗])\s+(.*)$""".r
  private val metric =
    """^\s*(checks|http_req_duration|http_req_failed|iterations)[.]*:\s*(.*)$""".r

  def sniff(lines: Array[String]): Int = {
    val m = lines.count(l => metric.findFirstIn(l).isDefined)
    if (m == 0) 0 else m * 2 + lines.count(l => check.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case check(mark, name) if !name.startsWith("↳") =>
        val sev = if (mark == "✓") Severity.TestPass else Severity.TestFail
        out += mk(idx, i + 1, sev, name.trim, raw, "load-test", test = Some(name.trim))
        idx += 1
      case metric(name, value) =>
        out += mk(idx, i + 1, Severity.Info, s"$name: ${value.trim}", raw,
          "load-test-metric", rule = Some(name))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object CondaParser extends LogParser {
  val format = "conda_text"
  val tool = "conda"
  // PackagesNotFoundError: The following packages are not available from current channels:
  // ResolvePackageNotFound:  /  - nosuchpkg=9.9
  // Requires a NAMED error class (PackagesNotFoundError, CondaError…):
  // a bare "Error:" head is not conda-specific — terraform, generic CLI
  // and many tools emit it, and the old \w* form made conda outscore
  // them all in the registry (found by the terraform deep fixture).
  private val errHead = """^(\w+(?:Error|NotFound)\w*):\s*(.*)$""".r
  private val missing = """^\s+-\s+(\S+)$""".r
  private val solving = """^Solving environment: .*$""".r
  private val done = """^# To activate this environment.*$""".r

  def sniff(lines: Array[String]): Int = {
    val ctx = lines.count(l => solving.findFirstIn(l).isDefined ||
      done.findFirstIn(l).isDefined)
    val e = lines.count(l => errHead.findFirstIn(l).isDefined)
    if (ctx + e == 0) 0 else (ctx + e) * 2
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var inError = false
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case errHead(kind, msg) =>
        out += mk(idx, i + 1, Severity.Error,
          if (msg.nonEmpty) msg else kind, raw, "deps", code = Some(kind))
        idx += 1; inError = true
      case missing(pkg) if inError =>
        out += mk(idx, i + 1, Severity.Error, s"not found: $pkg", raw, "deps")
        idx += 1
      // Real conda output separates the error head from its package
      // list with a BLANK line (tier-4 deep fixture caught the old
      // blank-line reset dropping the entire list). The list ends at
      // the next non-indented prose line instead ("Current channels:",
      // "Note: …"), which also keeps the indented channel-URL bullets
      // under "Current channels:" from being misread as packages.
      case _ =>
        if (raw.trim.nonEmpty && !raw.startsWith(" ") && !raw.startsWith("\t"))
          inError = false
    }
    out.result()
  }
}

object PnpmParser extends LogParser {
  val format = "pnpm_text"
  val tool = "pnpm"
  //  ERR_PNPM_NO_MATCHING_VERSION  No matching version found for foo@^9.0.0
  //  WARN  deprecated left-pad@1.0.0
  private val err = """^\s*(ERR_PNPM_\w+)\s+(.*)$""".r
  private val warn = """^\s*WARN\s+(.*)$""".r
  private val progress = """^(?:Packages: \+\d+|Progress: resolved \d+.*|Done in [\d.]+m?s)$""".r

  def sniff(lines: Array[String]): Int = {
    val p = lines.count(l => progress.findFirstIn(l).isDefined ||
      err.findFirstIn(l).isDefined)
    if (p == 0) 0 else p * 2 + lines.count(l => warn.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case err(code, msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "deps", code = Some(code))
        idx += 1
      case warn(msg) =>
        out += mk(idx, i + 1, Severity.Warning, msg, raw, "deps")
        idx += 1
      case _ =>
    }
    out.result()
  }
}
