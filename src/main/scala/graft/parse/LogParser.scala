package graft.parse

/** One diagnostic parsed out of raw log text, before it is joined with
  * run context and written as a [[graft.model.Event]]. Column contract =
  * the BIRD spec names the reference's parser emits
  * (/root/reference/src/blq/commands/core.py:2055-2060: ref_file/
  * ref_line/ref_column, severity/message/error_code, tool/category).
  * Fingerprints are NOT assigned here — they are added as a Catalyst
  * expression ([[graft.functions.BlqFunctions.fingerprint]]) when the
  * parse result becomes a DataFrame, so driver-side and distributed
  * parses share one implementation.
  */
case class ParsedEvent(
    event_index: Long,
    severity: String,
    message: Option[String],
    raw_text: Option[String],
    tool_name: Option[String],
    category: Option[String],
    code: Option[String],
    rule: Option[String],
    test_name: Option[String],
    ref_file: Option[String],
    ref_line: Option[Int],
    ref_column: Option[Int],
    log_line_start: Option[Int],
    log_line_end: Option[Int])

/** A log-format parser (duck_hunt replacement, SURVEY.md §2.10 F3).
  * Implementations are pure Scala objects — Serializable so they ship
  * into executor closures for distributed parsing (S4). */
trait LogParser extends Serializable {
  /** Format name, e.g. "gcc_text" (matches reference hint names where
    * the reference has an equivalent, core.py:976-1029). */
  def format: String

  def tool: String

  /** Detection score for auto-detect (S6): how many lines this parser
    * recognizes. Auto picks the highest-scoring format. */
  def sniff(lines: Array[String]): Int

  def parse(content: String): Seq[ParsedEvent]

  protected def mk(idx: Long, lineNo: Int, sev: String, msg: String,
      raw: String, cat: String, code: Option[String] = None,
      rule: Option[String] = None, test: Option[String] = None,
      file: Option[String] = None, line: Option[Int] = None,
      col: Option[Int] = None): ParsedEvent =
    ParsedEvent(idx, sev, Some(msg), Some(raw), Some(tool), Some(cat),
      code, rule, test, file, line, col, Some(lineNo), Some(lineNo))
}
