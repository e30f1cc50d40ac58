package graft.parse

import scala.util.Try
import graft.model.Severity

/** SARIF 2.1.0 (`*.sarif` — the OASIS static-analysis interchange
  * format emitted by CodeQL, semgrep --sarif, trivy, clang-tidy
  * --export-sarif, …): one JSON document with
  * `runs[].tool.driver.name`, `runs[].results[]` each carrying
  * `ruleId`, `level` (error|warning|note, default warning per spec
  * §3.27.10), `message.text` and physical locations. */
object SarifParser extends LogParser {
  val format = "sarif_json"
  val tool = "sarif"

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n").trim
    if (joined.startsWith("{") && joined.contains("\"runs\"") &&
      (joined.contains("sarif") || joined.contains("\"results\""))) 6
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = Try(Json.mapper.readTree(content.trim)).toOption
      .filter(n => n != null && n.isObject && n.has("runs"))
      .getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    val runs = root.get("runs").elements()
    while (runs.hasNext) {
      val run = runs.next()
      val driver = Option(run.get("tool")).flatMap(t => Option(t.get("driver")))
        .flatMap(d => Json.str(d, "name")).getOrElse("sarif")
      Option(run.get("results")).filterNot(_.isNull).foreach { results =>
        val it = results.elements()
        while (it.hasNext) {
          val r = it.next()
          val sev = Json.str(r, "level") match {
            case Some("error") => Severity.Error
            case Some("note") => Severity.Note
            case _ => Severity.Warning // spec default when absent
          }
          val text = Option(r.get("message")).flatMap(m => Json.str(m, "text"))
            .getOrElse("")
          val loc = Option(r.get("locations")).filterNot(_.isNull)
            .flatMap(ls => if (ls.elements().hasNext) Some(ls.elements().next()) else None)
            .flatMap(l => Option(l.get("physicalLocation")))
          val file = loc.flatMap(pl => Option(pl.get("artifactLocation")))
            .flatMap(Json.str(_, "uri"))
          val region = loc.flatMap(pl => Option(pl.get("region")))
          val startLine = region.flatMap(Json.int(_, "startLine"))
          out += mk(idx, startLine.getOrElse(1), sev,
            s"[$driver] $text", "", "static-analysis",
            rule = Json.str(r, "ruleId"),
            file = file,
            line = startLine,
            col = region.flatMap(Json.int(_, "startColumn")))
          idx += 1
        }
      }
    }
    out.result()
  }
}

/** Test Anything Protocol text (prove, node-tap, bats, pytest-tap):
  * `ok N - desc` / `not ok N - desc` result lines, a `1..N` plan,
  * `# SKIP`/`# TODO` directives, and indented YAML diagnostic blocks
  * after failures. */
object TapParser extends LogParser {
  val format = "tap_text"
  val tool = "tap"
  // the test number is OPTIONAL per the TAP spec (`ok - desc`,
  // `not ok desc` are valid and common in node-tap subtest output)
  private val result = """^(ok|not ok)(?:\s+(\d+))?(?:\s+-?\s*([^#]*?))?\s*(?:#\s*(SKIP|TODO)\b.*)?$""".r
  private val plan = """^1\.\.(\d+)$""".r
  private val version = """^TAP version \d+$""".r
  private val yamlMsg = """^\s+message:\s*['"]?(.*?)['"]?\s*$""".r

  def sniff(lines: Array[String]): Int = {
    // Detection requires a plan (1..N) or version anchor: with the
    // test number optional, a lone "ok <words>" line in some OTHER
    // tool's output would otherwise auto-detect as TAP whenever the
    // hinted format yields no events (the registry's fallback).
    val anchors = lines.count(l => plan.findFirstIn(l).isDefined ||
      version.findFirstIn(l).isDefined)
    if (anchors == 0) 0
    else lines.count(l => result.findFirstIn(l).isDefined) + anchors * 2
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val buf = scala.collection.mutable.ArrayBuffer[ParsedEvent]()
    var idx = 0L
    var lastFail = -1 // buf index of the most recent failure
    var seq = 0 // running count for unnumbered results
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case result(okNot, num, desc, directive) =>
        seq += 1
        val name = Option(desc).map(_.trim).filter(_.nonEmpty)
          .getOrElse(s"test ${Option(num).getOrElse(seq.toString)}")
        val sev =
          if (directive != null) Severity.Info // SKIP / TODO
          else if (okNot == "ok") Severity.TestPass
          else Severity.TestFail
        lastFail = if (sev == Severity.TestFail) buf.length else lastFail
        buf += mk(idx, i + 1, sev,
          (if (directive != null) s"$name [$directive]" else name),
          raw, "test", test = Some(name))
        idx += 1
      case yamlMsg(m) if lastFail >= 0 && lastFail == buf.length - 1 =>
        // YAML diagnostic block: attach the message to the failure above
        val prev = buf(lastFail)
        buf(lastFail) = prev.copy(message = Some(m),
          log_line_end = Some(i + 1))
      case _ =>
    }
    buf.toSeq
  }
}

/** markdownlint CLI default output:
  * `README.md:12:1 MD013/line-length Line length [Expected: 80; Actual: 104]`
  * (column optional). */
object MarkdownlintParser extends LogParser {
  val format = "markdownlint_text"
  val tool = "markdownlint"
  private val diag =
    """^([^:\s]+\.(?:md|markdown)):(\d+)(?::(\d+))?\s+(MD\d+)/([\w-]+(?:/[\w-]+)*)\s+(.*)$""".r

  def sniff(lines: Array[String]): Int =
    lines.count(l => diag.findFirstIn(l).isDefined)

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) raw match {
      case diag(file, line, colN, code, alias, msg) =>
        out += mk(idx, i + 1, Severity.Warning, msg, raw, "lint",
          code = Some(code), rule = Some(alias), file = Some(file),
          line = Some(line.toInt), col = Option(colN).map(_.toInt))
        idx += 1
      case _ =>
    }
    out.result()
  }
}

/** `gcc -fdiagnostics-format=json`: a JSON array of diagnostic objects
  * (`kind`, `message`, `option`, `locations[].caret.{file,line,column}`),
  * one array per compiler invocation (public GCC docs). */
object GccJsonParser extends LogParser {
  val format = "gcc_json"
  val tool = "gcc"

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n").trim
    if (joined.startsWith("[") && joined.contains("\"kind\"") &&
      joined.contains("\"caret\"")) 5
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    // one array per compiler invocation. Line-delimited arrays FIRST:
    // Jackson's readTree on concatenated documents silently parses only
    // the first value, so whole-content parsing would drop every unit
    // after the first. The whole-content path is the fallback for a
    // single pretty-printed (multi-line) array.
    val arrays: Seq[com.fasterxml.jackson.databind.JsonNode] = {
      val perLine = content.linesIterator.flatMap(l =>
        Try(Json.mapper.readTree(l.trim)).toOption
          .filter(n => n != null && n.isArray)).toSeq
      if (perLine.nonEmpty) perLine
      else Try(Json.mapper.readTree(content.trim)).toOption
        .filter(n => n != null && n.isArray).toSeq
    }
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for (arr <- arrays) {
      val it = arr.elements()
      while (it.hasNext) {
        val d = it.next()
        for (kind <- Json.str(d, "kind");
             msg <- Json.str(d, "message")) {
          val sev = kind match {
            case "error" | "fatal error" => Severity.Error
            case "warning" => Severity.Warning
            case _ => Severity.Note
          }
          val caret = Option(d.get("locations")).filterNot(_.isNull)
            .flatMap(ls => if (ls.elements().hasNext) Some(ls.elements().next()) else None)
            .flatMap(l => Option(l.get("caret")))
          out += mk(idx, caret.flatMap(Json.int(_, "line")).getOrElse(0).max(1),
            sev, msg, "", "compile",
            rule = Json.str(d, "option").filter(_.nonEmpty),
            file = caret.flatMap(Json.str(_, "file")),
            line = caret.flatMap(Json.int(_, "line")),
            col = caret.flatMap(Json.int(_, "column")))
          idx += 1
        }
      }
    }
    out.result()
  }
}
