package graft.parse

import com.fasterxml.jackson.databind.JsonNode
import scala.util.Try
import graft.model.Severity

/** Second wave of JSON tool formats (reference hint names:
  * shellcheck_json, gotest_json, bandit_json, rubocop_json,
  * hadolint_json, trivy_json). Shapes are from the tools' public
  * `--format json` documentation. All parsers are tolerant — wrong
  * shapes yield zero events, never an exception.
  */
private[parse] object JsonWalk {
  def arr(n: JsonNode): Iterator[JsonNode] = {
    val it = n.elements()
    new Iterator[JsonNode] {
      def hasNext: Boolean = it.hasNext
      def next(): JsonNode = it.next()
    }
  }
  def field(n: JsonNode, name: String): Option[JsonNode] =
    Option(n.get(name)).filterNot(_.isNull)
  def doc(content: String): Option[JsonNode] =
    Try(Json.mapper.readTree(content.trim)).toOption.filter(_ != null)
}

/** `shellcheck -f json`: array of {file, line, column, level, code, message}. */
object ShellcheckJsonParser extends LogParser {
  val format = "shellcheck_json"
  val tool = "shellcheck"
  import JsonWalk._

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n").trim
    if (joined.startsWith("[") && joined.contains("\"level\"") &&
      joined.contains("\"code\"") && joined.contains("\"column\"")) 5
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = doc(content).filter(_.isArray).getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for (c <- arr(root); if field(c, "message").isDefined) {
      val sev = Json.str(c, "level") match {
        case Some("error") => Severity.Error
        case Some("warning") => Severity.Warning
        case _ => Severity.Info // info | style
      }
      out += mk(idx, Json.int(c, "line").getOrElse(0), sev,
        Json.str(c, "message").getOrElse(""), "", "lint",
        code = Json.int(c, "code").map(n => s"SC$n"),
        file = Json.str(c, "file"), line = Json.int(c, "line"),
        col = Json.int(c, "column"))
      idx += 1
    }
    out.result()
  }
}

/** `go test -json`: ndjson of {Time, Action, Package, Test, Output}.
  * pass/fail actions with a Test field become test events; fail
  * messages are the last non-frame output line seen for that test. */
object GoTestJsonParser extends LogParser {
  val format = "gotest_json"
  val tool = "go"
  import JsonWalk._

  def sniff(lines: Array[String]): Int =
    lines.count(l => l.startsWith("{") && l.contains("\"Action\"") &&
      (l.contains("\"Test\"") || l.contains("\"Package\"")))

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    val lastOutput = scala.collection.mutable.Map.empty[String, String]
    for ((raw, i) <- content.linesIterator.zipWithIndex; n <- Json.parse(raw)) {
      val action = Json.str(n, "Action")
      val test = Json.str(n, "Test")
      (action, test) match {
        case (Some("output"), Some(t)) =>
          val line = Json.str(n, "Output").getOrElse("").trim
          if (line.nonEmpty && !line.startsWith("===") && !line.startsWith("---"))
            lastOutput(t) = line
        case (Some("pass"), Some(t)) =>
          out += mk(idx, i + 1, Severity.TestPass, s"$t passed", raw.take(200),
            "test", test = Some(t))
          idx += 1
        case (Some("fail"), Some(t)) =>
          out += mk(idx, i + 1, Severity.TestFail,
            lastOutput.getOrElse(t, s"$t failed"), raw.take(200), "test",
            test = Some(t))
          idx += 1
        case _ =>
      }
    }
    out.result()
  }
}

/** `bandit -f json`: {results: [{filename, line_number, issue_severity,
  * issue_text, test_id, test_name}]}. */
object BanditJsonParser extends LogParser {
  val format = "bandit_json"
  val tool = "bandit"
  import JsonWalk._

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n")
    if (joined.contains("\"issue_severity\"") && joined.contains("\"results\"")) 5
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = doc(content).getOrElse(return Seq.empty)
    val results = field(root, "results").filter(_.isArray).getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for (r <- arr(results)) {
      val sev = Json.str(r, "issue_severity") match {
        case Some("HIGH") => Severity.Error
        case Some("MEDIUM") => Severity.Warning
        case _ => Severity.Info
      }
      out += mk(idx, Json.int(r, "line_number").getOrElse(0), sev,
        Json.str(r, "issue_text").getOrElse(""), "", "security",
        code = Json.str(r, "test_id"), rule = Json.str(r, "test_name"),
        file = Json.str(r, "filename"), line = Json.int(r, "line_number"))
      idx += 1
    }
    out.result()
  }
}

/** `rubocop --format json`: {files: [{path, offenses: [{severity,
  * message, cop_name, location: {line, column}}]}]}. */
object RubocopJsonParser extends LogParser {
  val format = "rubocop_json"
  val tool = "rubocop"
  import JsonWalk._

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n")
    if (joined.contains("\"offenses\"") && joined.contains("\"cop_name\"")) 5
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = doc(content).getOrElse(return Seq.empty)
    val files = field(root, "files").filter(_.isArray).getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for (f <- arr(files); path = Json.str(f, "path");
         offs <- field(f, "offenses").toSeq; o <- arr(offs)) {
      val sev = Json.str(o, "severity") match {
        case Some("error") | Some("fatal") => Severity.Error
        case Some("warning") => Severity.Warning
        case _ => Severity.Info // convention | refactor | info
      }
      val loc = field(o, "location")
      out += mk(idx, loc.flatMap(Json.int(_, "line")).getOrElse(0), sev,
        Json.str(o, "message").getOrElse(""), "", "lint",
        rule = Json.str(o, "cop_name"), file = path,
        line = loc.flatMap(Json.int(_, "line")),
        col = loc.flatMap(Json.int(_, "column")))
      idx += 1
    }
    out.result()
  }
}

/** `hadolint -f json`: array of {file, line, column, level, code, message}.
  * Same shape as shellcheck_json but DL/SC string codes. */
object HadolintJsonParser extends LogParser {
  val format = "hadolint_json"
  val tool = "hadolint"
  import JsonWalk._

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n").trim
    if (joined.startsWith("[") && joined.contains("\"code\"") &&
      (joined.contains("\"DL") || joined.contains("Dockerfile"))) 6
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = doc(content).filter(_.isArray).getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for (c <- arr(root); if field(c, "message").isDefined) {
      val sev = Json.str(c, "level") match {
        case Some("error") => Severity.Error
        case Some("warning") => Severity.Warning
        case _ => Severity.Info
      }
      out += mk(idx, Json.int(c, "line").getOrElse(0), sev,
        Json.str(c, "message").getOrElse(""), "", "lint",
        code = Json.str(c, "code"), file = Json.str(c, "file"),
        line = Json.int(c, "line"), col = Json.int(c, "column"))
      idx += 1
    }
    out.result()
  }
}

/** pytest-json-report plugin: one document with
  * {tests: [{nodeid, outcome, call: {longrepr}}]} (public plugin
  * format; the reference registers "pytest_json" as a command format). */
object PytestJsonParser extends LogParser {
  val format = "pytest_json"
  val tool = "pytest"
  import JsonWalk._

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n")
    if (joined.contains("\"nodeid\"") && joined.contains("\"outcome\"")) 5
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = doc(content).getOrElse(return Seq.empty)
    val tests = field(root, "tests").filter(_.isArray).getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for (t <- arr(tests); nodeid <- Json.str(t, "nodeid")) {
      val outcome = Json.str(t, "outcome")
      val sev = outcome match {
        case Some("passed") => Severity.TestPass
        case Some("failed") | Some("error") => Severity.TestFail
        case _ => Severity.Info // skipped/xfailed/xpassed
      }
      val longrepr = field(t, "call").flatMap(Json.str(_, "longrepr"))
      val file = nodeid.split("::").headOption
      out += mk(idx, 0, sev,
        longrepr.map(_.linesIterator.toSeq.lastOption.getOrElse("").trim)
          .filter(_.nonEmpty)
          .getOrElse(s"$nodeid ${outcome.getOrElse("ran")}"),
        "", "test", test = Some(nodeid), file = file)
      idx += 1
    }
    out.result()
  }
}

/** `trivy -f json`: {Results: [{Target, Vulnerabilities: [{
  * VulnerabilityID, Severity, PkgName, Title}]}]}. */
object TrivyJsonParser extends LogParser {
  val format = "trivy_json"
  val tool = "trivy"
  import JsonWalk._

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n")
    if (joined.contains("\"VulnerabilityID\"") || joined.contains("\"Vulnerabilities\"")) 5
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = doc(content).getOrElse(return Seq.empty)
    val results = field(root, "Results").filter(_.isArray).getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for (r <- arr(results); target = Json.str(r, "Target");
         vulns <- field(r, "Vulnerabilities").toSeq; v <- arr(vulns)) {
      val sev = Json.str(v, "Severity") match {
        case Some("CRITICAL") | Some("HIGH") => Severity.Error
        case Some("MEDIUM") => Severity.Warning
        case _ => Severity.Info
      }
      val pkg = Json.str(v, "PkgName").getOrElse("?")
      out += mk(idx, 0, sev,
        s"$pkg: ${Json.str(v, "Title").getOrElse(Json.str(v, "VulnerabilityID").getOrElse(""))}",
        "", "security", code = Json.str(v, "VulnerabilityID"),
        rule = Json.str(v, "PkgName"), file = target)
      idx += 1
    }
    out.result()
  }
}
