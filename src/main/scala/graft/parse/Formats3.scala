package graft.parse

import graft.model.Severity

/** Third wave of format parsers: shellcheck, gradle, JUnit XML, rspec,
  * golangci-lint, msbuild. Pattern knowledge from the tools' public
  * output formats.
  */

object ShellcheckParser extends LogParser {
  val format = "shellcheck_text"
  val tool = "shellcheck"
  // In deploy.sh line 12:  /  SC2086 (info): Double quote to prevent ...
  private val header = """^In (\S+) line (\d+):$""".r
  private val code = """^\s*(?:\^[-~^ ]*\^?\s*)?(SC\d+)(?:\s*\((error|warning|info|style)\))?:\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => header.findFirstIn(l).isDefined ||
      l.matches(""".*\bSC\d{4}\b.*"""))

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var loc: Option[(String, Int)] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case header(file, line) => loc = Some((file, line.toInt))
      case code(sc, sev, msg) if loc.isDefined =>
        val severity = Option(sev).getOrElse("warning") match {
          case "error" => Severity.Error
          case "info" | "style" => Severity.Info
          case _ => Severity.Warning
        }
        out += mk(idx, i + 1, severity, msg, raw, "lint", code = Some(sc),
          rule = Some(sc), file = loc.map(_._1), line = loc.map(_._2))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object GradleParser extends LogParser {
  val format = "gradle_build"
  val tool = "gradle"
  // e: file.kt: (12, 5): Unresolved reference  /  > Task :app:compileKotlin FAILED
  private val kotlinc = """^([ew]):\s+(?:file://)?([^:\s]+):\s*\((\d+),\s*(\d+)\):\s*(.*)$""".r
  private val taskFail = """^> Task (\S+) FAILED$""".r
  private val buildFail = """^FAILURE: (.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => kotlinc.findFirstIn(l).isDefined ||
      taskFail.findFirstIn(l).isDefined || l.startsWith("> Task "))

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case kotlinc(sev, file, line, colN, msg) =>
        val severity = if (sev == "e") Severity.Error else Severity.Warning
        out += mk(idx, i + 1, severity, msg, raw, "compile",
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case taskFail(task) =>
        out += mk(idx, i + 1, Severity.Error, s"task failed: $task", raw, "build",
          test = Some(task))
        idx += 1
      case buildFail(msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "build")
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object JunitXmlParser extends LogParser {
  val format = "junit_xml"
  val tool = "junit"
  private val caseRe =
    """<testcase\b[^>]*?\bname="([^"]*)"[^>]*?(/?)>""".r
  private val classRe = """classname="([^"]*)"""".r
  private val failRe = """<(failure|error)\b[^>]*?(?:\bmessage="([^"]*)"[^>]*)?>""".r

  /** XML attribute values carry escaped entities (&lt;4&gt; in every
    * assertEquals message); unescape the five predefined ones so event
    * messages read as the original text. &amp; last, so "&amp;lt;"
    * round-trips correctly. */
  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")

  def sniff(lines: Array[String]): Int =
    lines.count(l => l.contains("<testsuite") || l.contains("<testcase"))

  def parse(content: String): Seq[ParsedEvent] = {
    // line-spanning XML: work on the whole content, attribute line
    // numbers by match offset.
    val lineOf: Int => Int = {
      val starts = content.split("\n", -1).scanLeft(0)(_ + _.length + 1)
      off => starts.count(_ <= off)
    }
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var m = caseRe.findAllMatchIn(content).toSeq
    for (c <- m) {
      val name = unescape(c.group(1))
      val cls = classRe.findFirstMatchIn(c.matched).map(m => unescape(m.group(1)))
      val selfClosed = c.group(2) == "/"
      val rest = content.substring(c.end,
        math.min(content.length, content.indexOf("</testcase>", c.end) match {
          case -1 => c.end
          case e => e
        }))
      val fail = if (selfClosed) None else failRe.findFirstMatchIn(rest)
      val ln = lineOf(c.start)
      fail match {
        case Some(f) =>
          out += mk(idx, ln, Severity.TestFail,
            Option(f.group(2)).map(unescape).getOrElse(s"$name failed"),
            c.matched.take(120),
            "test", test = Some(name), file = cls)
        case None =>
          out += mk(idx, ln, Severity.TestPass, name, c.matched.take(120),
            "test", test = Some(name), file = cls)
      }
      idx += 1
    }
    out.result()
  }
}

object RspecParser extends LogParser {
  val format = "rspec_text"
  val tool = "rspec"
  // rspec ./spec/user_spec.rb:42 # User validates email
  private val rerun = """^rspec (\S+):(\d+) # (.*)$""".r
  private val counts = """^(\d+) examples?, (\d+) failures?(?:, (\d+) pending)?$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => rerun.findFirstIn(l).isDefined || counts.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case rerun(file, line, desc) =>
        out += mk(idx, i + 1, Severity.TestFail, desc, raw, "test",
          test = Some(desc), file = Some(file), line = Some(line.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object GolangciParser extends LogParser {
  val format = "golangci_lint"
  val tool = "golangci-lint"
  // main.go:10:2: ineffectual assignment to x (ineffassign)
  private val diag = """^([^:\s]+\.go):(\d+):(\d+):\s*(.*?)\s*\(([\w-]+)\)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, msg, linter) =>
        out += mk(idx, i + 1, Severity.Warning, msg, raw, "lint",
          rule = Some(linter), file = Some(file), line = Some(line.toInt),
          col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object MsbuildParser extends LogParser {
  val format = "msbuild"
  val tool = "msbuild"
  // Program.cs(12,34): error CS1002: ; expected [/path/proj.csproj]
  private val diag =
    """^\s*([^(\s][^(]*)\((\d+),(\d+)\):\s*(error|warning)\s+([A-Z]+\d+):\s*(.*?)(?:\s*\[[^\]]*\])?$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    // MSBuild re-echoes every diagnostic after "Build FAILED."/"Build
    // succeeded." — one event per distinct diagnostic, not two. Keyed
    // on the full identity tuple so genuinely repeated diagnostics at
    // different sites still both emit.
    val seen = scala.collection.mutable.Set.empty[(String, Int, Int, String, String)]
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, code, msg) =>
        val key = (file.trim, line.toInt, colN.toInt, code, msg)
        if (seen.add(key)) {
          out += mk(idx, i + 1, sev, msg, raw, "compile", code = Some(code),
            file = Some(file.trim), line = Some(line.toInt), col = Some(colN.toInt))
          idx += 1
        }
      case _ =>
    }
    out.result()
  }
}
