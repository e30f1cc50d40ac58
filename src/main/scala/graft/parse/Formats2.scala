package graft.parse

import graft.model.Severity

/** Second wave of format parsers, continuing Formats.scala: tsc, go
  * test, maven/javac, jest, python tracebacks, junit-style XML-less
  * summaries. Pattern knowledge is from the public output formats of
  * the tools; no reference code reproduced.
  */

object TscParser extends LogParser {
  val format = "tsc_text"
  val tool = "tsc"
  // src/app.ts(10,5): error TS2322: Type 'string' is not assignable...
  private val diag =
    """^([^(\s]+)\((\d+),(\d+)\):\s*(error|warning)\s+(TS\d+):\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, code, msg) =>
        out += mk(idx, i + 1, sev, msg, raw, "type-check", code = Some(code),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object GoTestParser extends LogParser {
  val format = "go_test"
  val tool = "go"
  // --- FAIL: TestFoo (0.03s)   /  --- PASS: TestBar (0.00s)
  private val result = """^\s*--- (FAIL|PASS|SKIP): (\S+) \(([\d.]+)s\)$""".r
  // foo_test.go:42: assertion failed
  private val loc = """^\s+([\w./-]+_test\.go):(\d+):\s*(.*)$""".r
  private val pkgFail = """^FAIL\s+(\S+)\s+[\d.]+s$""".r
  // === RUN / === CONT precede a test's log lines — in real -v output
  // t.Log/t.Error locations print UNDER the RUN header, BEFORE the
  // --- FAIL line, so the running test must be tracked from here, not
  // only from result lines (which would attribute them to the previous
  // finished test).
  private val runHead = """^=== (?:RUN|CONT)\s+(\S+)\s*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => result.findFirstIn(l).isDefined || pkgFail.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var lastTest: Option[String] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case runHead(name) => lastTest = Some(name)
      case result(status, name, _) =>
        val sev = status match {
          case "FAIL" => Severity.TestFail
          case "PASS" => Severity.TestPass
          case _ => Severity.Info
        }
        lastTest = Some(name)
        out += mk(idx, i + 1, sev, s"$status: $name", raw, "test", test = Some(name))
        idx += 1
      case loc(file, line, msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "test",
          test = lastTest, file = Some(file), line = Some(line.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object MavenParser extends LogParser {
  val format = "maven_build"
  val tool = "maven"
  // [ERROR] /path/App.java:[10,5] cannot find symbol
  private val javac =
    """^\[(ERROR|WARNING)\]\s+([^\[\s]+\.java):\[(\d+)(?:,(\d+))?\]\s*(.*)$""".r
  private val plain = """^\[(ERROR|WARNING)\]\s+(.*)$""".r
  private val marker = """^\[INFO\] BUILD (SUCCESS|FAILURE)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => javac.findFirstIn(l).isDefined || marker.findFirstIn(l).isDefined)

  // `[ERROR]   symbol: ...` (≥2 spaces after the tag) is javac detail
  // continuation belonging to the PREVIOUS diagnostic, not an event.
  private val continuation = """^\[(?:ERROR|WARNING)\]\s{2,}\S.*$""".r
  // terminal boilerplate maven prints after every failure — noise, not
  // diagnostics
  private val boilerplate = Seq("-> [Help", "[Help", "To see the full stack trace",
    "Re-run Maven", "For more information about the errors")

  def parse(content: String): Seq[ParsedEvent] = {
    val buf = scala.collection.mutable.ArrayBuffer[ParsedEvent]()
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case javac(sev, file, line, colN, msg) =>
        buf += mk(idx, i + 1, sev.toLowerCase, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt),
          col = Option(colN).map(_.toInt))
        idx += 1
      case plain(sev, msg) if msg.nonEmpty && !msg.startsWith("BUILD") =>
        if (continuation.findFirstIn(raw).isDefined && buf.nonEmpty) {
          val prev = buf.last
          buf(buf.length - 1) = prev.copy(
            message = Some(prev.message.fold(msg.trim)(_ + "; " + msg.trim)),
            log_line_end = Some(i + 1))
        } else if (!boilerplate.exists(msg.startsWith)) {
          buf += mk(idx, i + 1, sev.toLowerCase, msg, raw, "build")
          idx += 1
        }
      case _ =>
    }
    buf.toSeq
  }
}

object JestParser extends LogParser {
  val format = "jest_text"
  val tool = "jest"
  // ✓ renders correctly (5 ms) / ✕ handles errors (12 ms)
  private val pass = """^\s*(?:✓|√)\s+(.+?)(?:\s+\((\d+)\s*m?s\))?$""".r
  private val fail = """^\s*(?:✕|×)\s+(.+?)(?:\s+\((\d+)\s*m?s\))?$""".r
  private val suite = """^\s*(PASS|FAIL)\s+(\S+\.(?:test|spec)\.[jt]sx?)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => suite.findFirstIn(l).isDefined ||
      pass.findFirstIn(l).isDefined || fail.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var curFile: Option[String] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case suite(status, file) =>
        curFile = Some(file)
        if (status == "FAIL") {
          out += mk(idx, i + 1, Severity.Error, s"suite failed: $file", raw,
            "test", file = Some(file))
          idx += 1
        }
      case fail(name, _) =>
        out += mk(idx, i + 1, Severity.TestFail, name, raw, "test",
          test = Some(name), file = curFile)
        idx += 1
      case pass(name, _) =>
        out += mk(idx, i + 1, Severity.TestPass, name, raw, "test",
          test = Some(name), file = curFile)
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object PythonTracebackParser extends LogParser {
  val format = "python_traceback"
  val tool = "python"
  private val header = """^Traceback \(most recent call last\):$""".r
  private val frame = """^\s+File "([^"]+)", line (\d+), in (.+)$""".r
  private val exc = """^([A-Za-z_][\w.]*(?:Error|Exception|Interrupt|Exit|Warning)):?\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => header.findFirstIn(l).isDefined || frame.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var inTb = false
    var lastFrame: Option[(String, Int)] = None
    var tbStart = 0
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case header() => inTb = true; tbStart = i + 1; lastFrame = None
      case frame(file, line, _) if inTb => lastFrame = Some((file, line.toInt))
      case exc(name, msg) if inTb =>
        out += ParsedEvent(idx, Severity.Error,
          Some(if (msg.nonEmpty) s"$name: $msg" else name), Some(raw),
          Some(tool), Some("runtime"), Some(name), None, None,
          lastFrame.map(_._1), lastFrame.map(_._2), None,
          Some(tbStart), Some(i + 1))
        idx += 1; inTb = false
      case _ =>
    }
    out.result()
  }
}
