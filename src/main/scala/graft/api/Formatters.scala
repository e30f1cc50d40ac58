package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StringType, StructField}

/** Result renderers (S12, SURVEY.md §2.1: output.py:115-451 behavior) —
  * table with width-aware column dropping, JSON (null-stripped), CSV,
  * markdown. Driver-side presentation over a bounded `collect()`;
  * callers limit first (every reference surface does: default 10-100
  * rows), so this is never a distributed concern.
  */
object Formatters {

  private def cells(df: DataFrame, limit: Int): (Seq[String], Seq[Seq[Option[String]]]) = {
    val cols = df.columns.toSeq
    val rows = df.limit(limit).collect().toSeq
      .map(r => cols.indices.map(i => Option(r.get(i)).map(_.toString)))
    (cols, rows)
  }

  /** Fixed-width table; columns dropped lowest-priority-first when the
    * rendered width exceeds `maxWidth` (reference's priority model:
    * leftmost columns are most important). */
  def table(df: DataFrame, limit: Int = 20, maxWidth: Int = 160): String = {
    val (cols, rows) = cells(df, limit)
    def widths(keep: Int): Seq[Int] =
      cols.take(keep).zipWithIndex.map { case (c, i) =>
        (c.length +: rows.map(_(i).map(_.length).getOrElse(0))).max
      }
    val keep = (cols.length to 1 by -1)
      .find(k => widths(k).map(_ + 3).sum + 1 <= maxWidth || k == 1)
      .getOrElse(cols.length)
    val ws = widths(keep)
    def line(vals: Seq[String]): String =
      vals.zip(ws).map { case (v, w) => v.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val sep = ws.map("-" * _).mkString("|-", "-|-", "-|")
    val body = rows.map(r => line(r.take(keep).map(_.getOrElse(""))))
    (line(cols.take(keep)) +: sep +: body).mkString("\n")
  }

  /** JSON array of objects; null fields stripped (output.py JSON mode). */
  def json(df: DataFrame, limit: Int = 100): String = {
    val (cols, rows) = cells(df, limit)
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val schema = df.schema.fields
    def value(i: Int, v: String): String = schema(i) match {
      case StructField(_, StringType, _, _) => "\"" + esc(v) + "\""
      case _ if v == "true" || v == "false" => v
      case _ if v.matches("-?\\d+(\\.\\d+([eE][+-]?\\d+)?)?") => v
      case _ => "\"" + esc(v) + "\""
    }
    rows.map { r =>
      cols.indices.flatMap(i => r(i).map(v => "\"" + esc(cols(i)) + "\": " + value(i, v)))
        .mkString("{", ", ", "}")
    }.mkString("[", ",\n ", "]")
  }

  def csv(df: DataFrame, limit: Int = 1000): String = {
    val (cols, rows) = cells(df, limit)
    def esc(v: String): String =
      // '\r' included: a bare carriage return in an unquoted field
      // splits the record for RFC-4180 readers
      if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + v.replace("\"", "\"\"") + "\""
      else v
    (cols.map(esc).mkString(",") +:
      rows.map(_.map(_.map(esc).getOrElse("")).mkString(","))).mkString("\n")
  }

  def markdown(df: DataFrame, limit: Int = 20): String = {
    val (cols, rows) = cells(df, limit)
    // pipes/newlines in cell values would split the table structure
    def esc(v: String): String =
      v.replace("|", "\\|").replace("\r", " ").replace("\n", " ")
    val header = cols.map(esc).mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    val body = rows.map(_.map(_.map(esc).getOrElse("")).mkString("| ", " | ", " |"))
    (header +: sep +: body).mkString("\n")
  }
}
