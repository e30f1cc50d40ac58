package graft.parse

import graft.model.Severity

/** Fourteenth wave of format parsers — the long tail that takes the
  * registry to 100 formats: puppet, helm lint, dart analyze, kotlinc,
  * luacheck, zig, OCaml/dune, R CMD check. Pattern knowledge is from
  * the tools' public output formats; no reference code is reproduced.
  */

object PuppetParser extends LogParser {
  val format = "puppet_text"
  val tool = "puppet"
  // Error: Could not parse ...: Syntax error at '}' (file: /m/site.pp, line: 12, column: 1)
  private val diag =
    """^(Error|Warning): (.*?) \(file: ([^,)]+), line: (\d+)(?:, column: (\d+))?\)$""".r
  private val notice = """^Notice: (?:Compiled catalog|Applied catalog).*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2 +
      lines.count(l => notice.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(sev, msg, file, line, colN) =>
        out += mk(idx, i + 1, sev.toLowerCase, msg, raw, "infra",
          file = Some(file), line = Some(line.toInt),
          col = Option(colN).map(_.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object HelmParser extends LogParser {
  val format = "helm_lint"
  val tool = "helm"
  // ==> Linting mychart
  // [ERROR] templates/deployment.yaml: unable to parse YAML
  // Error: 1 chart(s) linted, 1 chart(s) failed
  private val linting = """^==> Linting (\S+)$""".r
  private val diag = """^\[(ERROR|WARNING|INFO)\]\s+(\S+?):\s*(.*)$""".r
  private val outcome = """^Error: \d+ chart\(s\) linted, \d+ chart\(s\) failed$""".r

  def sniff(lines: Array[String]): Int = {
    val l = lines.count(x => linting.findFirstIn(x).isDefined)
    if (l == 0) 0
    else l * 3 + lines.count(x => diag.findFirstIn(x).isDefined ||
      outcome.findFirstIn(x).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var chart: Option[String] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case linting(c) => chart = Some(c)
      case diag(sev, file, msg) =>
        val severity = sev match {
          case "ERROR" => Severity.Error
          case "WARNING" => Severity.Warning
          case _ => Severity.Info
        }
        out += mk(idx, i + 1, severity, msg, raw, "infra",
          rule = chart, file = Some(file))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object DartParser extends LogParser {
  val format = "dart_analyze"
  val tool = "dart"
  //   error • Undefined name 'foo' • lib/main.dart:12:5 • undefined_identifier
  private val diag =
    """^\s*(error|warning|info)\s+•\s+(.*?)\s+•\s+([^:\s]+):(\d+):(\d+)\s+•\s+([\w_]+)\s*$""".r
  private val summary = """^\d+ issues? found\.$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2 +
      lines.count(l => summary.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(sev, msg, file, line, colN, rule) =>
        out += mk(idx, i + 1, sev, msg, raw, "lint", rule = Some(rule),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object KotlincParser extends LogParser {
  val format = "kotlinc_text"
  val tool = "kotlinc"
  // src/Main.kt:12:5: error: unresolved reference: foo
  // (gcc-shaped; .kt anchor + doubled score resolve ties, same
  // strategy as SwiftParser — ktlint's form carries a (rule) suffix
  // instead of a severity keyword, so the two never collide)
  private val diag =
    """^([^:\s]+\.kts?):(\d+):(\d+):\s*(error|warning):\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, msg) =>
        out += mk(idx, i + 1, sev, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object LuacheckParser extends LogParser {
  val format = "luacheck_text"
  val tool = "luacheck"
  //     app/init.lua:12:10: unused variable 'x'
  // Total: 2 warnings / 0 errors in 1 files
  private val diag = """^\s*([^:\s]+\.lua):(\d+):(\d+):\s*(.*)$""".r
  private val total = """^Total: (\d+) warnings? / (\d+) errors? in \d+ files?$""".r

  def sniff(lines: Array[String]): Int = {
    val t = lines.count(l => total.findFirstIn(l).isDefined)
    if (t == 0) 0 else t * 3 + lines.count(l => diag.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, msg) =>
        val sev = if (msg.contains("error") || msg.contains("syntax"))
          Severity.Error else Severity.Warning
        out += mk(idx, i + 1, sev, msg, raw, "lint",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object ZigParser extends LogParser {
  val format = "zig_text"
  val tool = "zig"
  // src/main.zig:12:5: error: use of undeclared identifier 'foo'
  private val diag =
    """^([^:\s]+\.zig):(\d+):(\d+):\s*(error|note|warning):\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, msg) =>
        out += mk(idx, i + 1, sev, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object OcamlParser extends LogParser {
  val format = "ocaml_text"
  val tool = "ocaml"
  // File "bin/main.ml", line 12, characters 4-7:
  // Error: Unbound value foo
  private val loc =
    """^File "([^"]+)", line (\d+), characters (\d+)-\d+:\s*$""".r
  private val sev = """^(Error|Warning)(?: \d+)?(?: \[[\w-]+\])?: (.*)$""".r

  def sniff(lines: Array[String]): Int = {
    val l = lines.count(x => loc.findFirstIn(x).isDefined)
    if (l == 0) 0 else l * 2 + lines.count(x => sev.findFirstIn(x).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, Int, Int, Int)] = None // file, line, col, lineNo
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case loc(file, line, colN) =>
        pending = Some((file, line.toInt, colN.toInt, i + 1))
      case sev(kind, msg) if pending.isDefined =>
        val (file, line, colN, ln) = pending.get
        out += mk(idx, ln, kind.toLowerCase, msg, raw, "compile",
          file = Some(file), line = Some(line), col = Some(colN))
        idx += 1; pending = None
      case _ =>
    }
    out.result()
  }
}

object RCheckParser extends LogParser {
  val format = "r_check"
  val tool = "R"
  // * checking R code for possible problems ... NOTE
  // * checking examples ... ERROR
  private val check = """^\* checking (.*?) \.\.\.\s*(OK|NOTE|WARNING|ERROR)\s*$""".r
  private val status = """^Status: (.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => check.findFirstIn(l).isDefined) +
      lines.count(l => status.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case check(what, outcome) if outcome != "OK" =>
        val severity = outcome match {
          case "ERROR" => Severity.Error
          case "WARNING" => Severity.Warning
          case _ => Severity.Note
        }
        out += mk(idx, i + 1, severity, s"$what: $outcome", raw, "check")
        idx += 1
      case status(s) =>
        val severity = if (s.contains("ERROR")) Severity.Error
        else if (s.contains("WARNING")) Severity.Warning else Severity.Info
        out += mk(idx, i + 1, severity, s"status: $s", raw, "check-summary")
        idx += 1
      case _ =>
    }
    out.result()
  }
}
