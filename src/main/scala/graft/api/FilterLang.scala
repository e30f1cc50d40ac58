package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The CLI filter mini-language (P5) shared by `blq filter` and the MCP
  * `query(filter=…)` tool. Semantics mirror
  * /root/reference/src/blq/commands/query_cmd.py:124-169,221-294:
  *
  *  - `k~p`    → k ILIKE '%p%'       (contains, checked FIRST)
  *  - `k!=v`   → k != 'v'
  *  - `k=v1,v2`→ k IN ('v1','v2')
  *  - `k=v`    → k = 'v'   (LOWER(k)=LOWER(v) when ignoreCase)
  *  - all expressions AND-ed; `invert` wraps the whole thing in NOT(…)
  */
object FilterLang {

  final case class ParseError(expr: String)
    extends IllegalArgumentException(
      s"Invalid filter expression: $expr. Use key=value, key~pattern, or key!=value")

  def parse(e: String, ignoreCase: Boolean = false): Column = {
    val expr = e.trim
    // Totality contract (PropertySpec): any invalid expression raises
    // ParseError and nothing else. col() itself parses the key (dots =
    // nested fields, backticks = quoting) and throws Spark analysis
    // errors on malformed names — an untrusted MCP filter string must
    // surface as the documented ParseError, not a raw parser error.
    try {
      if (expr.contains("~")) {
        val Array(k, v) = expr.split("~", 2)
        col(k.trim).ilike(s"%${v.trim}%")
      } else if (expr.contains("!=")) {
        val Array(k, v) = expr.split("!=", 2)
        col(k.trim) =!= v.trim
      } else if (expr.contains("=")) {
        val Array(k, v) = expr.split("=", 2)
        val (key, value) = (k.trim, v.trim)
        if (value.contains(","))
          col(key).isin(value.split(",").map(_.trim).toSeq: _*)
        else if (ignoreCase) lower(col(key)) === value.toLowerCase
        else col(key) === value
      } else throw ParseError(expr)
    } catch {
      case p: ParseError => throw p
      case scala.util.control.NonFatal(_) => throw ParseError(expr)
    }
  }

  /** AND-combine; None when no expressions. `invert` = the CLI `-v`. */
  def parseAll(exprs: Seq[String], ignoreCase: Boolean = false,
      invert: Boolean = false): Option[Column] = {
    val combined = exprs.map(parse(_, ignoreCase)).reduceOption(_ && _)
    if (invert) combined.map(!_) else combined
  }

  /** CLI arg split: expressions contain = or ~; everything else is a
    * file path (query_cmd.py:224-232). */
  def splitArgs(args: Seq[String]): (Seq[String], Seq[String]) =
    args.partition(a => a.contains("=") || a.contains("~"))
}
