package graft.parse

import graft.model.Severity

/** Fifth wave of format parsers — the static-analysis tier by
  * real-world frequency (duck_hunt catalog coverage,
  * /root/reference/src/blq/commands/core.py:976-1029): pylint,
  * clippy (dense/short mode), checkstyle, spotbugs, ktlint. Pattern
  * knowledge is from the tools' public output formats; no reference
  * code is reproduced.
  */

object PylintParser extends LogParser {
  val format = "pylint_text"
  val tool = "pylint"
  // app/models.py:42:8: E1101: Instance of 'User' has no 'emial' member (no-member)
  private val diag =
    """^([^:\s]+\.pyi?):(\d+):(\d+):\s*([CRWEF]\d{4}):\s*(.*?)\s*\(([\w-]+)\)$""".r
  private val module = """^\*+ Module\s+(\S+)$""".r
  private val score = """^Your code has been rated at .*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined || module.findFirstIn(l).isDefined ||
      score.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, code, msg, symbolic) =>
        val severity = code.head match {
          case 'E' | 'F' => Severity.Error
          case 'W' => Severity.Warning
          case _ => Severity.Info // C(onvention), R(efactor)
        }
        out += mk(idx, i + 1, severity, msg, raw, "lint", code = Some(code),
          rule = Some(symbolic), file = Some(file), line = Some(line.toInt),
          col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object ClippyDenseParser extends LogParser {
  val format = "clippy_dense"
  val tool = "clippy"
  // rustc --error-format=short / clippy dense:
  // src/main.rs:4:5: warning: this expression borrows a value ... [clippy::needless_borrow]
  // src/lib.rs:12:7: error[E0308]: mismatched types
  private val diag =
    """^([^:\s]+\.rs):(\d+):(\d+):\s*(error|warning|note)(?:\[(E\d{4})\])?:\s*(.*?)(?:\s+\[([\w:]+)\])?$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, code, msg, lint) =>
        out += mk(idx, i + 1, sev, msg, raw, "lint",
          code = Option(code), rule = Option(lint),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object CheckstyleParser extends LogParser {
  val format = "checkstyle_text"
  val tool = "checkstyle"
  // [ERROR] /src/Main.java:12:5: Missing a Javadoc comment. [JavadocMethod]
  private val diag =
    """^\[(ERROR|WARN|INFO)\]\s+([^:\s]+\.java):(\d+)(?::(\d+))?:\s*(.*?)\s*\[(\w+)\]$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(sev, file, line, colN, msg, check) =>
        val severity = sev match {
          case "ERROR" => Severity.Error
          case "WARN" => Severity.Warning
          case _ => Severity.Info
        }
        out += mk(idx, i + 1, severity, msg, raw, "lint", rule = Some(check),
          file = Some(file), line = Some(line.toInt),
          col = Option(colN).map(_.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object SpotbugsParser extends LogParser {
  val format = "spotbugs_text"
  val tool = "spotbugs"
  // M C NP_NULL_ON_SOME_PATH: Possible null pointer dereference of x in Foo.bar()  At Foo.java:[line 42]
  private val diag =
    """^([HML])\s+([A-Z])\s+([A-Z_0-9]+):\s*(.*?)\s+At\s+([\w.$]+\.java):\[line\s+(\d+)\]$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(priority, _, bugType, msg, file, line) =>
        // H(igh) priority → error; M/L → warning (spotbugs reports are
        // all defects; priority is confidence, not severity class)
        val severity = if (priority == "H") Severity.Error else Severity.Warning
        out += mk(idx, i + 1, severity, msg, raw, "static-analysis",
          code = Some(bugType), file = Some(file), line = Some(line.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object KtlintParser extends LogParser {
  val format = "ktlint_text"
  val tool = "ktlint"
  // src/main/kotlin/Main.kt:12:1: Unexpected blank line(s) before "}" (no-blank-line-before-rbrace)
  private val diag =
    """^([^:\s]+\.kts?):(\d+):(\d+):\s*(.*?)\s*\(([\w:-]+)\)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, msg, rule) =>
        // ktlint reports style violations; all are errors by default
        // (it exits non-zero on any finding)
        out += mk(idx, i + 1, Severity.Error, msg, raw, "lint",
          rule = Some(rule), file = Some(file), line = Some(line.toInt),
          col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}
