package graft.parse

import graft.model.Severity

/** Fourth wave of format parsers: phpunit, rubocop, yamllint,
  * terraform, docker build. Pattern knowledge from the tools' public
  * output formats.
  */

object PhpunitParser extends LogParser {
  val format = "phpunit_text"
  val tool = "phpunit"
  // 1) UserTest::testEmail  /  Failed asserting that false is true.
  private val item = """^\d+\)\s+([\w\\]+)::(\w+)$""".r
  private val loc = """^(/[^:\s]+\.php):(\d+)$""".r
  // Section headers restart item numbering and set item severity:
  // failures/errors → test_fail, skipped/incomplete → info, warnings/
  // risky → warning (phpunit prints each as its own "There were N …:"
  // block with 1)-numbered items).
  private val section =
    """^There (?:were \d+|was \d+|was one|were) (failure|error|skipped test|incomplete test|warning|risky test)s?.*:$""".r
  private val tally = """^Tests: \d+.*$""".r
  private val ok = """^OK \(\d+ tests?.*\)$""".r
  private val summary = """^(?:OK \(\d+ tests?|FAILURES!|Tests: \d+).*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => item.findFirstIn(l).isDefined || summary.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var current: Option[(String, String, Int)] = None // class, test, line no
    var message: Option[String] = None
    var sectionSev: String = Severity.TestFail
    def flush(file: Option[String], line: Option[Int]): Unit =
      current.foreach { case (cls, test, ln) =>
        out += mk(idx, ln, sectionSev,
          message.getOrElse(s"$cls::$test failed"), s"$cls::$test", "test",
          test = Some(s"$cls::$test"), file = file, line = line)
        idx += 1
        current = None; message = None
      }
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case section(kind) =>
        flush(None, None)
        sectionSev = kind match {
          case "failure" | "error" => Severity.TestFail
          case "warning" | "risky test" => Severity.Warning
          case _ => Severity.Info // skipped / incomplete
        }
      case item(cls, test) => flush(None, None); current = Some((cls, test, i + 1))
      case loc(file, line) => flush(Some(file), Some(line.toInt))
      case l if tally.findFirstIn(l).isDefined =>
        flush(None, None)
        out += mk(idx, i + 1, Severity.Error, l.trim, l, "test-summary")
        idx += 1
      case l if ok.findFirstIn(l).isDefined =>
        flush(None, None)
        out += mk(idx, i + 1, Severity.Info, l.trim, l, "test-summary")
        idx += 1
      case l if current.isDefined && l.trim.nonEmpty && message.isEmpty =>
        message = Some(l.trim)
      case _ =>
    }
    flush(None, None)
    out.result()
  }
}

object RubocopParser extends LogParser {
  val format = "rubocop_text"
  val tool = "rubocop"
  // app/user.rb:12:3: C: Style/Documentation: Missing top-level docs
  // (rubocop also lints .rake/.gemspec/config.ru out of the box)
  private val diag =
    """^([^:\s]+\.(?:rb|rake|gemspec|ru)):(\d+):(\d+):\s*([CWEF]):\s*(?:\[Correctable\]\s*)?([\w/]+):\s*(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, cop, msg) =>
        val severity = sev match {
          case "E" | "F" => Severity.Error
          case "W" => Severity.Warning
          case _ => Severity.Info // C(onvention)
        }
        out += mk(idx, i + 1, severity, msg, raw, "lint", rule = Some(cop),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object YamllintParser extends LogParser {
  val format = "yamllint_text"
  val tool = "yamllint"
  // deploy.yaml:12:3: [warning] wrong indentation (indentation)
  private val diag =
    """^([^:\s]+\.ya?ml):(\d+):(\d+):\s*\[(error|warning)\]\s*(.*?)\s*\(([\w-]+)\)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, sev, msg, rule) =>
        out += mk(idx, i + 1, sev, msg, raw, "lint", rule = Some(rule),
          file = Some(file), line = Some(line.toInt), col = Some(colN.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

object TerraformParser extends LogParser {
  val format = "terraform_text"
  val tool = "terraform"
  // Error: Invalid resource type  /    on main.tf line 12:
  private val head = """^(Error|Warning):\s*(.*)$""".r
  private val loc = """^\s*on\s+(\S+)\s+line\s+(\d+).*$""".r
  private val plan = """^Plan:\s+\d+ to add.*$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => loc.findFirstIn(l).isDefined || plan.findFirstIn(l).isDefined) +
      (if (lines.exists(l => loc.findFirstIn(l).isDefined)) 1 else 0)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    var pending: Option[(String, String, Int)] = None
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case head(sev, msg) =>
        pending.foreach { case (s, m, ln) =>
          out += mk(idx, ln, s.toLowerCase, m, m, "infra"); idx += 1
        }
        pending = Some((sev, msg, i + 1))
      case loc(file, line) if pending.isDefined =>
        val (s, m, ln) = pending.get
        out += mk(idx, ln, s.toLowerCase, m, m, "infra",
          file = Some(file), line = Some(line.toInt))
        idx += 1; pending = None
      case _ =>
    }
    pending.foreach { case (s, m, ln) =>
      out += mk(idx, ln, s.toLowerCase, m, m, "infra"); idx += 1
    }
    out.result()
  }
}

object DockerBuildParser extends LogParser {
  val format = "docker_build"
  val tool = "docker"
  // #8 ERROR: process "/bin/sh -c make" did not complete successfully: exit code: 2
  private val buildkitErr = """^#\d+ ERROR:\s*(.*)$""".r
  private val step = """^#\d+ \[[^\]]*\d+/\d+\]\s+(.*)$""".r
  private val classicErr =
    """^The command '(.*)' returned a non-zero code:\s*(\d+)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => step.findFirstIn(l).isDefined ||
      buildkitErr.findFirstIn(l).isDefined || classicErr.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case buildkitErr(msg) =>
        out += mk(idx, i + 1, Severity.Error, msg, raw, "build")
        idx += 1
      case classicErr(cmd, code) =>
        out += mk(idx, i + 1, Severity.Error,
          s"command failed (exit $code): $cmd", raw, "build", code = Some(code))
        idx += 1
      case _ =>
    }
    out.result()
  }
}
