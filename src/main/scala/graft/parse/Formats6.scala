package graft.parse

import graft.model.Severity

/** Sixth wave of format parsers — test/infra/service tier: JUnit
  * (surefire console text), swiftc/xcodebuild, ansible playbook,
  * pip/uv install, nginx error log, syslog (RFC 3164). Pattern
  * knowledge is from the tools' public output formats; no reference
  * code is reproduced.
  */

object JunitTextParser extends LogParser {
  val format = "junit_text"
  val tool = "junit"
  // Maven surefire console text:
  // testBar(com.example.FooTest)  Time elapsed: 0.01 s  <<< FAILURE!
  // java.lang.AssertionError: expected:<1> but was:<2>
  // Tests run: 5, Failures: 1, Errors: 0, Skipped: 1, ...
  private val result =
    """^(\w+)\(([\w.$]+)\)\s+Time elapsed:\s*[\d.]+\s*s(?:ec)?\s*(?:<<<\s*(FAILURE|ERROR)!)?\s*$""".r
  private val summary =
    """^Tests run:\s*(\d+),\s*Failures:\s*(\d+),\s*Errors:\s*(\d+),\s*Skipped:\s*(\d+).*$""".r
  private val runningHeader = """^Running\s+[\w.$]+$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => result.findFirstIn(l).isDefined ||
      summary.findFirstIn(l).isDefined || runningHeader.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, String, Int)] = None // test, kind, line
    def flush(msg: Option[String]): Unit = pending.foreach { case (test, kind, ln) =>
      out += mk(idx, ln, Severity.TestFail,
        msg.getOrElse(s"$test $kind"), test, "test", test = Some(test))
      idx += 1; pending = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case result(test, cls, marker) =>
        flush(None)
        val name = s"$cls.$test"
        if (marker != null) pending = Some((name, marker.toLowerCase, i + 1))
        else {
          out += mk(idx, i + 1, Severity.TestPass, s"$name passed", name,
            "test", test = Some(name))
          idx += 1
        }
      case summary(run, failures, errors, skipped) =>
        flush(None)
        val sev = if (failures.toInt + errors.toInt > 0) Severity.Error else Severity.Info
        out += mk(idx, i + 1, sev,
          s"tests run: $run, failures: $failures, errors: $errors, skipped: $skipped",
          raw, "test-summary")
        idx += 1
      case l if pending.isDefined && l.trim.nonEmpty => flush(Some(l.trim))
      case _ =>
    }
    flush(None)
    out.result()
  }
}

object SwiftParser extends LogParser {
  val format = "swift_text"
  val tool = "swiftc"
  // /App/Sources/Main.swift:10:15: error: use of unresolved identifier 'foo'
  private val diag =
    """^([^:\s]+\.swift):(\d+):(\d+):\s*(error|warning|note):\s*(.*)$""".r
  private val xcodeMarker =
    """^\*\* (BUILD|TEST|ARCHIVE) (FAILED|SUCCEEDED) \*\*$""".r

  // Swift diagnostics are a strict subset of the gcc shape; the .swift
  // extension anchor keeps gcc fixtures from matching here, and the
  // registry orders this parser before gcc so ties on swift logs
  // resolve to the more specific tool.
  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2 +
      lines.count(l => xcodeMarker.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, msg) =>
        out += mk(idx, i + 1, sev, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case xcodeMarker(phase, outcome) =>
        val sev = if (outcome == "FAILED") Severity.Error else Severity.Info
        out += mk(idx, i + 1, sev, s"$phase $outcome", raw, "build")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object AnsibleParser extends LogParser {
  val format = "ansible_text"
  val tool = "ansible"
  // TASK [install nginx] *****
  // fatal: [web3]: FAILED! => {"changed": false, "msg": "No package nginx available."}
  // web1 : ok=3 changed=1 unreachable=0 failed=1 skipped=0
  private val task = """^TASK \[(.*)\] \*+$""".r
  private val fatal = """^fatal:\s*\[([^\]]+)\]:\s*(\w+)!\s*=>\s*(.*)$""".r
  private val recap =
    """^(\S+)\s*:\s*ok=(\d+)\s+changed=(\d+)\s+unreachable=(\d+)\s+failed=(\d+).*$""".r
  private val playRecap = """^PLAY RECAP \*+$""".r
  private val jsonMsg = """"msg":\s*"([^"]*)"""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => task.findFirstIn(l).isDefined || fatal.findFirstIn(l).isDefined ||
      playRecap.findFirstIn(l).isDefined || recap.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var currentTask: Option[String] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case task(name) => currentTask = Some(name)
      case fatal(host, kind, payload) =>
        val msg = jsonMsg.findFirstMatchIn(payload).map(_.group(1))
          .getOrElse(s"$kind on $host")
        out += mk(idx, i + 1, Severity.Error,
          s"[$host] $msg", raw, "deploy",
          code = Some(kind.toLowerCase), test = currentTask)
        idx += 1
      case recap(host, _, _, unreach, failed) =>
        val u = unreach.toInt; val f = failed.toInt
        if (u + f > 0) {
          out += mk(idx, i + 1, Severity.Warning,
            s"$host: failed=$f unreachable=$u", raw, "deploy-recap")
          idx += 1
        }
      case _ =>
    }
    out.result()
  }
}

object PipParser extends LogParser {
  val format = "pip_text"
  val tool = "pip"
  // ERROR: Could not find a version that satisfies the requirement foo==9.9
  // uv lowercase: error: Failed to download `foo==9.9`
  private val pipDiag = """^(ERROR|WARNING):\s*(.*)$""".r
  private val uvDiag = """^(error|warning):\s*(.*)$""".r
  private val installed = """^Successfully installed\s+(.*)$""".r
  private val collecting = """^(?:Collecting|Downloading|Resolved|Installing collected packages)[:\s].*$""".r

  // Bare "ERROR:" lines appear in many tools' output — only claim the
  // format when pip/uv install-context lines are present too.
  def sniff(lines: Array[String]): Int = {
    val ctx = lines.count(l => installed.findFirstIn(l).isDefined ||
      collecting.findFirstIn(l).isDefined)
    if (ctx == 0) 0
    else ctx + lines.count(l => pipDiag.findFirstIn(l).isDefined)
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case pipDiag(sev, msg) =>
        out += mk(idx, i + 1, sev.toLowerCase, msg, raw, "deps")
        idx += 1
      case uvDiag(sev, msg) =>
        out += mk(idx, i + 1, sev, msg, raw, "deps")
        idx += 1
      case installed(pkgs) =>
        out += mk(idx, i + 1, Severity.Info, s"installed: $pkgs", raw, "deps")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object NginxParser extends LogParser {
  val format = "nginx_error"
  val tool = "nginx"
  // 2026/08/12 10:00:01 [error] 1234#0: *1 open() "/var/www/x" failed (2: ...), client: 1.2.3.4
  private val diag =
    """^\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2} \[(\w+)\] \d+#\d+:\s*(?:\*\d+\s*)?(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(level, msg) =>
        val severity = level match {
          case "emerg" | "alert" | "crit" | "error" => Severity.Error
          case "warn" => Severity.Warning
          case "notice" => Severity.Note
          case _ => Severity.Info
        }
        out += mk(idx, i + 1, severity, msg, raw, "service")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object SyslogParser extends LogParser {
  val format = "syslog_text"
  val tool = "syslog"
  // Aug 12 10:00:01 host1 sshd[1234]: Failed password for root from 1.2.3.4
  private val entry =
    """^([A-Z][a-z]{2}\s+\d{1,2}\s+\d{2}:\d{2}:\d{2})\s+(\S+)\s+([\w\-/.]+)(?:\[(\d+)\])?:\s*(.*)$""".r
  private val errWords = """(?i)\b(error|fail|failed|failure|panic|fatal|denied|refused|killed|segfault|oom)\b""".r
  private val warnWords = """(?i)\b(warn|warning|timeout|retry|deprecated)\b""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => entry.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case entry(_, host, proc, _, msg) =>
        val severity =
          if (errWords.findFirstIn(msg).isDefined) Severity.Error
          else if (warnWords.findFirstIn(msg).isDefined) Severity.Warning
          else Severity.Info
        out += mk(idx, i + 1, severity, s"[$host] $proc: $msg", raw, "service",
          rule = Some(proc))
        idx += 1
      case _ =>
    }
    out.result()
  }
}
