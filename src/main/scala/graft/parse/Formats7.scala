package graft.parse

import graft.model.Severity

/** Seventh wave of format parsers — JVM/native build tier: sbt/scalac,
  * javac, java stack traces, cmake, bazel, valgrind. Pattern knowledge
  * is from the tools' public output formats; no reference code is
  * reproduced.
  */

object SbtParser extends LogParser {
  val format = "sbt_text"
  val tool = "scalac"
  // [error] /work/src/main/scala/Foo.scala:12:34: not found: value bar
  private val diag =
    """^\[(error|warn)\]\s+([^:\s]+\.(?:scala|java)):(\d+)(?::(\d+))?:\s*(.*)$""".r
  // [error] (Compile / compileIncremental) Compilation failed
  private val phase = """^\[(error)\]\s+\((.+?)\)\s+(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2 +
      lines.count(l => phase.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(sev, file, line, colN, msg) =>
        val severity = if (sev == "warn") Severity.Warning else Severity.Error
        out += mk(idx, i + 1, severity, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt),
          col = Option(colN).map(_.toInt))
        idx += 1
      case phase(_, task, msg) =>
        out += mk(idx, i + 1, Severity.Error, s"$task: $msg", raw, "build")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object JavacParser extends LogParser {
  val format = "javac_text"
  val tool = "javac"
  // Foo.java:12: error: cannot find symbol  (no column)
  private val diag =
    """^([^:\s]+\.java):(\d+):\s*(error|warning):\s*(.*)$""".r
  private val detail = """^\s+(symbol|location):\s*(.*)$""".r
  private val summary = """^\d+ (?:errors?|warnings?)$""".r

  // gcc/mypy regexes also match the javac shape; the .java anchor plus
  // the doubled diag score and symbol/summary bonus win the tie.
  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined) * 2 +
      lines.count(l => detail.findFirstIn(l).isDefined ||
        summary.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, sev, msg) =>
        out += mk(idx, i + 1, sev, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object JavaStackTraceParser extends LogParser {
  val format = "java_stacktrace"
  val tool = "java"
  // Exception in thread "main" java.lang.NullPointerException: boom
  //     at com.example.Foo.bar(Foo.java:42)
  // Caused by: java.io.IOException: io broke
  private val header =
    """^(?:Exception in thread "[^"]*"\s+|Caused by:\s+)([\w.$]+(?:Exception|Error|Throwable))(?::\s*(.*))?$""".r
  private val frame = """^\s+at\s+([\w.$/]+)\(([\w.]+):(\d+)\)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => frame.findFirstIn(l).isDefined) +
      lines.count(l => header.findFirstIn(l).isDefined) * 2

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    // one event per exception header; first frame supplies file:line
    var pending: Option[(String, String, Int)] = None // class, msg, lineNo
    def flush(file: Option[String], line: Option[Int]): Unit =
      pending.foreach { case (cls, msg, ln) =>
        out += mk(idx, ln, Severity.Error,
          if (msg.isEmpty) cls else s"$cls: $msg", cls, "crash",
          code = Some(cls), file = file, line = line)
        idx += 1; pending = None
      }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case header(cls, msg) =>
        flush(None, None)
        pending = Some((cls, Option(msg).getOrElse(""), i + 1))
      case frame(_, file, line) if pending.isDefined =>
        flush(Some(file), Some(line.toInt))
      case _ =>
    }
    flush(None, None)
    out.result()
  }
}

object CmakeParser extends LogParser {
  val format = "cmake_build"
  val tool = "cmake"
  // CMake Error at CMakeLists.txt:14 (add_executable):
  private val head =
    """^CMake (Error|Warning)(?: \(dev\))?(?: at ([^:\s]+):(\d+)(?: \(([\w_]+)\))?)?:\s*(.*)$""".r
  private val genDone = """^-- (?:Configuring|Generating) (?:done|incomplete).*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => head.findFirstIn(l).isDefined) * 2 +
      lines.count(l => genDone.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, Option[String], Option[Int], Option[String], Int)] = None
    var message: Option[String] = None
    def flush(): Unit = pending.foreach { case (sev, file, line, cmd, ln) =>
      out += mk(idx, ln, sev.toLowerCase,
        message.getOrElse(cmd.map(c => s"in $c").getOrElse("cmake diagnostic")),
        message.getOrElse(""), "build", rule = cmd, file = file, line = line)
      idx += 1; pending = None; message = None
    }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case head(sev, file, line, cmd, rest) =>
        flush()
        pending = Some((sev, Option(file), Option(line).map(_.toInt), Option(cmd), i + 1))
        if (rest.nonEmpty) message = Some(rest)
      case l if pending.isDefined && l.trim.nonEmpty && message.isEmpty =>
        message = Some(l.trim)
      case l if pending.isDefined && l.trim.isEmpty && message.isDefined =>
        flush()
      case _ =>
    }
    flush()
    out.result()
  }
}

object BazelParser extends LogParser {
  val format = "bazel_build"
  val tool = "bazel"
  // ERROR: /work/pkg/BUILD:12:1: Compiling pkg/foo.cc failed: ...
  private val diag =
    """^(ERROR|WARNING):\s+([^:\s]*BUILD(?:\.bazel)?):(\d+):(\d+):\s*(.*)$""".r
  private val testResult = """^(FAIL|PASS|TIMEOUT|FLAKY):\s+(//\S+)\s*.*$""".r
  private val info = """^INFO: (?:Build|Analyzed|Found).*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined ||
      testResult.findFirstIn(l).isDefined) * 2 +
      lines.count(l => info.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(sev, file, line, colN, msg) =>
        out += mk(idx, i + 1, sev.toLowerCase, msg, raw, "build",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case testResult(res, target) =>
        val severity = res match {
          case "PASS" => Severity.TestPass
          case "FLAKY" => Severity.Warning
          case _ => Severity.TestFail
        }
        out += mk(idx, i + 1, severity, s"$res $target", raw, "test",
          test = Some(target))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object ValgrindParser extends LogParser {
  val format = "valgrind"
  val tool = "valgrind"
  // ==1234== Invalid read of size 4
  // ==1234==    at 0x4005E4: main (foo.c:42)
  // byte counts carry thousands separators in real valgrind output
  // ("1,024 bytes in 1 blocks are definitely lost") — [\d,]+ not \d+
  private val issue =
    """^==\d+==\s+(Invalid (?:read|write).*|Conditional jump.*|[\d,]+ bytes in [\d,]+ blocks.*(?:lost|reachable).*|Use of uninitialised.*|Mismatched free.*|Invalid free.*|Source and destination overlap.*)$""".r
  private val frame = """^==\d+==\s+(?:at|by)\s+0x[0-9A-Fa-f]+:\s+(\S+)\s+\(([^:)]+):(\d+)\)$""".r
  private val summary = """^==\d+== ERROR SUMMARY: (\d+) errors? from .*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => l.startsWith("==") &&
      (issue.findFirstIn(l).isDefined || frame.findFirstIn(l).isDefined ||
        summary.findFirstIn(l).isDefined))

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, Int)] = None
    def flush(file: Option[String], line: Option[Int]): Unit =
      pending.foreach { case (msg, ln) =>
        out += mk(idx, ln, Severity.Error, msg, msg, "memory",
          file = file, line = line)
        idx += 1; pending = None
      }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case issue(msg) => flush(None, None); pending = Some((msg, i + 1))
      case frame(_, file, line) if pending.isDefined =>
        flush(Some(file), Some(line.toInt))
      case summary(n) =>
        flush(None, None)
        val sev = if (n.toInt > 0) Severity.Error else Severity.Info
        out += mk(idx, i + 1, sev, s"error summary: $n errors", raw, "memory-summary")
        idx += 1
      case _ =>
    }
    flush(None, None)
    out.result()
  }
}
