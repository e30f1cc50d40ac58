package graft.parse

import graft.model.Severity

/** Eighth wave of format parsers — Python lint/format, JS test, CI and
  * SQL tiers: flake8, black, mocha/chai, GitHub Actions annotations,
  * hadolint, sqlfluff. Pattern knowledge is from the tools' public
  * output formats; no reference code is reproduced.
  */

object Flake8Parser extends LogParser {
  val format = "flake8_text"
  val tool = "flake8"
  // app.py:12:1: E302 expected 2 blank lines, got 1
  // (distinct from pylint: no colon after the code, no (symbolic) suffix)
  private val diag =
    """^([^:\s]+\.pyi?):(\d+):(\d+):\s*([EWF]\d{1,3}|C\d{3})\s+(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, code, msg) =>
        val severity = code.head match {
          case 'E' | 'F' => Severity.Error
          case _ => Severity.Warning // W, C
        }
        out += mk(idx, i + 1, severity, msg, raw, "lint", code = Some(code),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object BlackParser extends LogParser {
  val format = "black_text"
  val tool = "black"
  // would reformat app.py   /  reformatted app.py
  // error: cannot format bad.py: Cannot parse: 12:4: x =
  private val would = """^would reformat\s+(\S+)$""".r
  private val did = """^reformatted\s+(\S+)$""".r
  private val cantParse =
    """^error: cannot format\s+([^:\s]+):\s*Cannot parse:\s*(\d+):(\d+):\s*(.*)$""".r
  private val summary =
    """^(?:\d+ files? (?:would be )?reformatted)?(?:, )?(?:\d+ files? (?:would be )?left unchanged)?\.$""".r
  private val allDone = """^All done! .*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => would.findFirstIn(l).isDefined || did.findFirstIn(l).isDefined ||
      cantParse.findFirstIn(l).isDefined || allDone.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case would(file) =>
        out += mk(idx, i + 1, Severity.Warning, s"would reformat $file", raw,
          "format", file = Some(file))
        idx += 1
      case did(file) =>
        out += mk(idx, i + 1, Severity.Info, s"reformatted $file", raw,
          "format", file = Some(file))
        idx += 1
      case cantParse(file, line, colN, msg) =>
        out += mk(idx, i + 1, Severity.Error, s"cannot parse: $msg", raw,
          "format", file = Some(file), line = Some(line.toInt),
          col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object MochaParser extends LogParser {
  val format = "mocha_chai_text"
  val tool = "mocha"
  //   ✓ adds numbers            /  ✗ or:
  //   1) Calculator add subtracts instead:
  //      AssertionError: expected 2 to equal 0
  private val pass = """^\s+[✓√]\s+(.*?)(?:\s+\(\d+ms\))?$""".r
  private val failHead = """^\s+(\d+)\)\s+(.*?):?$""".r
  private val summaryPass = """^\s*(\d+) passing.*$""".r
  private val summaryFail = """^\s*(\d+) (?:failing|pending).*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => pass.findFirstIn(l).isDefined) +
      lines.count(l => summaryPass.findFirstIn(l).isDefined ||
        summaryFail.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val buf = scala.collection.mutable.ArrayBuffer[ParsedEvent]()
    val byNumber = scala.collection.mutable.Map[String, Int]()
    var idx = 0L
    // (failure number, test, log line, head indent)
    var pending: Option[(String, String, Int, Int)] = None
    def indentOf(l: String): Int = l.indexWhere(!_.isWhitespace) max 0
    def flush(msg: Option[String]): Unit = pending.foreach { case (num, test, ln, _) =>
      byNumber.get(num) match {
        // The spec reporter prints every failure TWICE: a bare numbered
        // line inline in the running list, then a suite-qualified head
        // with the assertion message in the bottom failure list. Same
        // number = same failure — adopt the fuller name/message instead
        // of emitting a duplicate event.
        case Some(pos) =>
          val prev = buf(pos)
          buf(pos) = prev.copy(test_name = Some(test),
            message = msg.orElse(prev.message))
        case None =>
          buf += mk(idx, ln, Severity.TestFail, msg.getOrElse(s"$test failed"),
            test, "test", test = Some(test))
          byNumber(num) = buf.length - 1
          idx += 1
      }
      pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case failHead(num, test) =>
        flush(None); pending = Some((num, test, i + 1, indentOf(raw)))
      // A pass marker is never a failure message — flush any pending
      // failure without one, then emit the pass (interleaved ✓ after a
      // numbered failure is normal spec-reporter output).
      case pass(test) =>
        flush(None)
        buf += mk(idx, i + 1, Severity.TestPass, s"$test passed", test,
          "test", test = Some(test))
        idx += 1
      case l if pending.isDefined && l.trim.nonEmpty =>
        // Only a line indented DEEPER than the failure head is its
        // message; suite headers / summaries at equal-or-lesser indent
        // are unrelated output (the inline-list case).
        if (indentOf(l) > pending.get._4) flush(Some(l.trim)) else flush(None)
      case _ =>
    }
    flush(None)
    buf.toSeq
  }
}

object GithubActionsParser extends LogParser {
  val format = "github_actions"
  val tool = "github-actions"
  // ##[error]Process completed with exit code 1.
  // 2026-08-12T10:00:00.0000000Z ##[warning]Cache not found
  private val annot =
    """^(?:\S+Z\s+)?##\[(error|warning|notice)\](.*)$""".r
  private val group = """^(?:\S+Z\s+)?##\[(?:group|endgroup|section)\].*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => annot.findFirstIn(l).isDefined || group.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case annot(level, msg) =>
        val severity = if (level == "notice") Severity.Note else level
        out += mk(idx, i + 1, severity, msg.trim, raw, "ci")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object HadolintParser extends LogParser {
  val format = "hadolint_text"
  val tool = "hadolint"
  // Dockerfile:3 DL3006 warning: Always tag the version of an image explicitly
  private val diag =
    """^(\S*Dockerfile\S*):(\d+)\s+(DL\d{4}|SC\d{4})\s+(error|warning|info|style):\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, code, sev, msg) =>
        val severity = sev match {
          case "style" | "info" => Severity.Info
          case other => other
        }
        out += mk(idx, i + 1, severity, msg, raw, "lint", code = Some(code),
          file = Some(file), line = Some(line.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object SqlfluffParser extends LogParser {
  val format = "sqlfluff_text"
  val tool = "sqlfluff"
  // == [models/orders.sql] FAIL
  // L:  12 | P:   5 | L010 | Keywords must be consistently upper case.
  private val fileHead = """^==\s*\[(\S+)\]\s*(PASS|FAIL)\s*$""".r
  private val diag =
    """^L:\s*(\d+)\s*\|\s*P:\s*(\d+)\s*\|\s*([A-Z]{1,4}\d{2,3})\s*\|\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined || fileHead.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var currentFile: Option[String] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case fileHead(file, _) => currentFile = Some(file)
      case diag(line, pos, code, msg) =>
        out += mk(idx, i + 1, Severity.Warning, msg, raw, "lint",
          code = Some(code), file = currentFile,
          line = Some(line.toInt), col = Some(pos.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}
