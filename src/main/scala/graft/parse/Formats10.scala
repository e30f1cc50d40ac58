package graft.parse

import graft.model.Severity

/** Tenth wave of format parsers — modern-toolchain tier: ruff, vitest,
  * deno lint, biome, kubectl events, npm errors. Pattern knowledge is
  * from the tools' public output formats; no reference code is
  * reproduced.
  */

object RuffParser extends LogParser {
  val format = "ruff_text"
  val tool = "ruff"
  // app.py:1:1: F401 [*] `os` imported but unused
  // codes span families: E501, F401, PLR0913, UP007, SIM108...
  private val diag =
    """^([^:\s]+\.pyi?):(\d+):(\d+):\s*([A-Z]{1,4}\d{3,4})\s*(\[\*\])?\s*(.*)$""".r
  private val summary = """^Found \d+ errors?( \(\d+ fixable.*\))?\.$""".r

  // flake8's grammar is a subset (2-4 letter prefixes, [*] marker and
  // the Found-summary are ruff-only) — the bonus separates the two on
  // real ruff output while flake8 output without ruff markers ties and
  // resolves by registry order to flake8.
  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) +
      lines.count(l => summary.findFirstIn(l).isDefined ||
        l.contains("[*]")) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, code, fixable, msg) =>
        val severity = code.head match {
          case 'E' | 'F' => Severity.Error
          case _ => Severity.Warning
        }
        out += mk(idx, i + 1, severity, msg, raw, "lint", code = Some(code),
          rule = Option(fixable).map(_ => "fixable"),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object VitestParser extends LogParser {
  val format = "vitest_text"
  val tool = "vitest"
  //  ✓ src/math.test.ts (3 tests) 12ms
  //  ❯ src/fail.test.ts (2 tests | 1 failed) 20ms
  //    × adds numbers
  //      → expected 2 to be 0
  // Tests  1 failed | 4 passed (5)
  private val fileOk = """^\s*✓\s+(\S+\.(?:test|spec)\.[jt]sx?)\s+\((\d+) tests?\).*$""".r
  private val fileFail = """^\s*❯\s+(\S+\.(?:test|spec)\.[jt]sx?)\s+\((\d+) tests? \| (\d+) failed\).*$""".r
  private val testFail = """^\s*×\s+(.*?)(?:\s+\d+ms)?$""".r
  private val failMsg = """^\s*→\s+(.*)$""".r
  private val summary = """^\s*Tests\s+(?:(\d+) failed \| )?(\d+) passed \((\d+)\)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => fileOk.findFirstIn(l).isDefined ||
      fileFail.findFirstIn(l).isDefined) * 2 +
      lines.count(l => summary.findFirstIn(l).isDefined) * 2 +
      lines.count(l => testFail.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var currentFile: Option[String] = None
    var pending: Option[(String, Int)] = None
    def flush(msg: Option[String]): Unit = pending.foreach { case (test, ln) =>
      out += mk(idx, ln, Severity.TestFail, msg.getOrElse(s"$test failed"),
        test, "test", test = Some(test), file = currentFile)
      idx += 1; pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case fileFail(file, _, _) => flush(None); currentFile = Some(file)
      case fileOk(file, n) =>
        flush(None)
        out += mk(idx, i + 1, Severity.TestPass, s"$file: $n tests passed",
          raw, "test", file = Some(file))
        idx += 1
      case testFail(test) => flush(None); pending = Some((test, i + 1))
      case failMsg(msg) if pending.isDefined => flush(Some(msg))
      case summary(failed, passed, total) =>
        flush(None)
        val f = Option(failed).map(_.toInt).getOrElse(0)
        val sev = if (f > 0) Severity.Error else Severity.Info
        out += mk(idx, i + 1, sev,
          s"tests: $f failed, $passed passed, $total total", raw, "test-summary")
        idx += 1
      case _ =>
    }
    flush(None)
    out.result()
  }
}

object DenoLintParser extends LogParser {
  val format = "deno_lint"
  val tool = "deno"
  // error[no-unused-vars]: `x` is never used
  //  --> /app/main.ts:12:7
  private val head = """^(error|warning)\[([\w-]+)\]:\s*(.*)$""".r
  private val loc = """^\s*-->\s*([^:\s]+\.[jt]sx?):(\d+):(\d+)\s*$""".r

  def sniff(lines: Array[String]): Int = {
    val h = lines.count(l => head.findFirstIn(l).isDefined)
    val c = lines.count(l => loc.findFirstIn(l).isDefined)
    if (h > 0 && c > 0) (h + c) * 2 else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, String, String, Int)] = None
    def flush(file: Option[String], line: Option[Int], colN: Option[Int]): Unit =
      pending.foreach { case (sev, rule, msg, ln) =>
        out += mk(idx, ln, sev, msg, msg, "lint", rule = Some(rule),
          file = file, line = line, col = colN)
        idx += 1; pending = None
      }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case head(sev, rule, msg) => flush(None, None, None); pending = Some((sev, rule, msg, i + 1))
      case loc(file, line, colN) if pending.isDefined =>
        flush(Some(file), Some(line.toInt), Some(colN.toInt))
      case _ =>
    }
    flush(None, None, None)
    out.result()
  }
}

object BiomeParser extends LogParser {
  val format = "biome_lint"
  val tool = "biome"
  // src/app.js:12:5 lint/style/noVar  FIXABLE  ━━━━
  //   ✖ Use let or const instead of var.
  // The category may be BARE (`format`, `parse`, `organizeImports` —
  // biome prints those without a slash for formatter/parser/assist
  // diagnostics); the tier-4 deep fixture caught the slash-required
  // form dropping every formatter diagnostic.
  private val head =
    """^([^:\s]+):(\d+):(\d+)\s+((?:lint|suppressions?)/[\w/.-]+|(?:format|parse|organizeImports|assists?)(?:/[\w/.-]+)?)(?:\s.*)?$""".r
  private val msgLine = """^\s*[✖⚠ℹ]\s+(.*)$""".r
  private val summary = """^Checked \d+ files? in .*$""".r

  def sniff(lines: Array[String]): Int = {
    val h = lines.count(l => head.findFirstIn(l).isDefined)
    if (h == 0) 0
    else h * 2 + lines.count(l => summary.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, Int, Int, String, Int)] = None
    def flush(msg: Option[String]): Unit =
      pending.foreach { case (file, line, colN, rule, ln) =>
        out += mk(idx, ln, Severity.Warning, msg.getOrElse(rule), rule, "lint",
          rule = Some(rule), file = Some(file), line = Some(line), col = Some(colN))
        idx += 1; pending = None
      }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case head(file, line, colN, rule) =>
        flush(None); pending = Some((file, line.toInt, colN.toInt, rule, i + 1))
      case msgLine(msg) if pending.isDefined => flush(Some(msg))
      case _ =>
    }
    flush(None)
    out.result()
  }
}

object KubeEventsParser extends LogParser {
  val format = "kube_events"
  val tool = "kubectl"
  // 2m    Warning   BackOff   pod/app-1   Back-off restarting failed container
  private val row =
    """^(\S+)\s+(Normal|Warning)\s+(\w+)\s+((?:pod|node|deployment|replicaset|service|job|cronjob|statefulset|daemonset)/\S+)\s+(.*)$""".r
  private val header = """^LAST SEEN\s+TYPE\s+REASON\s+OBJECT\s+MESSAGE\s*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => row.findFirstIn(l).isDefined) +
      lines.count(l => header.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case row(_, typ, reason, obj, msg) =>
        val severity = if (typ == "Warning") Severity.Warning else Severity.Info
        out += mk(idx, i + 1, severity, msg, raw, "k8s",
          code = Some(reason), file = Some(obj))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object NpmParser extends LogParser {
  val format = "npm_err"
  val tool = "npm"
  // npm ERR! code ELIFECYCLE  /  npm WARN deprecated left-pad@1.0.0
  private val diag = """^npm (ERR!|WARN)\s*(\S*)\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      // bare "npm ERR!" separator lines carry no content — not events
      case diag(level, kind, msg) if kind.nonEmpty || msg.trim.nonEmpty =>
        val severity = if (level == "ERR!") Severity.Error else Severity.Warning
        val code = if (kind == "code") msg.split("\\s+").headOption else None
        out += mk(idx, i + 1, severity,
          if (kind.isEmpty) msg else s"$kind $msg".trim, raw, "deps",
          code = code)
        idx += 1
      case _ =>
    }
    out.result()
  }
}
