package graft.parse

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.util.Try
import graft.model.Severity

/** JSON-emitting tool formats (cargo --message-format=json, eslint
  * --format json). Uses Jackson from Spark's own classpath — no extra
  * dependency. Each parser is tolerant: non-JSON lines and unknown
  * shapes are skipped, never fatal (the reference's parse path treats
  * unparseable content as zero events).
  */
object Json {
  private[parse] val mapper = new ObjectMapper()
  private[parse] def parse(line: String): Option[JsonNode] =
    Try(mapper.readTree(line)).toOption.filter(n => n != null && n.isObject)
  private[parse] def str(n: JsonNode, field: String): Option[String] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
  private[parse] def int(n: JsonNode, field: String): Option[Int] =
    Option(n.get(field)).filterNot(_.isNull).map(_.asInt)
}

/** `cargo build --message-format=json`: ndjson with
  * `{"reason":"compiler-message","message":{"level":…,"code":{"code":…},
  * "message":…,"spans":[{"file_name":…,"line_start":…,"column_start":…,
  * "is_primary":true}]}}` (public cargo book format). */
object CargoJsonParser extends LogParser {
  val format = "cargo_json"
  val tool = "cargo"

  def sniff(lines: Array[String]): Int =
    lines.count(l => l.startsWith("{") && l.contains("\"reason\"") &&
      l.contains("compiler-message"))

  def parse(content: String): Seq[ParsedEvent] = {
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    for ((raw, i) <- content.linesIterator.zipWithIndex) {
      for {
        n <- Json.parse(raw)
        if Json.str(n, "reason").contains("compiler-message")
        msg <- Option(n.get("message")).filterNot(_.isNull)
        level <- Json.str(msg, "level")
        if level == "error" || level == "warning"
        text <- Json.str(msg, "message")
      } {
        val code = Option(msg.get("code")).filterNot(_.isNull)
          .flatMap(c => Json.str(c, "code"))
        val primary = Option(msg.get("spans")).filterNot(_.isNull)
          .flatMap(spans => spans.elements().asScala()
            .find(s => Option(s.get("is_primary")).exists(_.asBoolean(false))))
        out += mk(idx, i + 1, level, text, raw.take(200), "compile",
          code = code,
          file = primary.flatMap(Json.str(_, "file_name")),
          line = primary.flatMap(Json.int(_, "line_start")),
          col = primary.flatMap(Json.int(_, "column_start")))
        idx += 1
      }
    }
    out.result()
  }

  private implicit class IterAdapter[T](it: java.util.Iterator[T]) {
    def asScala(): Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}

/** `eslint --format json`: one JSON array of
  * `{"filePath":…,"messages":[{"ruleId":…,"severity":1|2,"message":…,
  * "line":…,"column":…}]}` (public eslint formatter docs). */
object EslintJsonParser extends LogParser {
  val format = "eslint_json"
  val tool = "eslint"

  def sniff(lines: Array[String]): Int = {
    val joined = lines.mkString("\n").trim
    if (joined.startsWith("[") && joined.contains("\"filePath\"") &&
      joined.contains("\"messages\"")) 5
    else 0
  }

  def parse(content: String): Seq[ParsedEvent] = {
    val root = Try(Json.mapper.readTree(content.trim)).toOption
      .filter(n => n != null && n.isArray)
      .getOrElse(return Seq.empty)
    val out = Seq.newBuilder[ParsedEvent]
    var idx = 0L
    val files = root.elements()
    while (files.hasNext) {
      val f = files.next()
      val file = Json.str(f, "filePath")
      val msgs = Option(f.get("messages")).filterNot(_.isNull)
      msgs.foreach { ms =>
        val it = ms.elements()
        while (it.hasNext) {
          val m = it.next()
          val sev = Json.int(m, "severity") match {
            case Some(2) => Severity.Error
            case _ => Severity.Warning
          }
          out += mk(idx, Json.int(m, "line").getOrElse(0), sev,
            Json.str(m, "message").getOrElse(""), "", "lint",
            rule = Json.str(m, "ruleId"),
            file = file, line = Json.int(m, "line"),
            col = Json.int(m, "column"))
          idx += 1
        }
      }
    }
    out.result()
  }
}
