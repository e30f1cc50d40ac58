package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.parse.{FormatRegistry, ParsedEvent}

/** `parse_log(content, format)` — a Catalyst `Generator` (table-valued
  * expression) wrapping the parser library, so log parsing composes
  * inside SQL exactly like the reference's `parse_duck_hunt_log`
  * extension function (F3, SURVEY.md §2.10; query.py:178-229):
  *
  * {{{
  *   SELECT l.log_file, p.severity, p.ref_file, p.message
  *   FROM logs l LATERAL VIEW parse_log(l.content, 'auto') p
  * }}}
  *
  * A Generator (not a UDF returning an array) because one content blob
  * yields many rows and Spark streams generator output without
  * materializing the whole event list per row. CodegenFallback is the
  * honest choice: the parser is regex-driven JVM code that would not
  * benefit from codegen, and a fallback expression in a generate node
  * does not break whole-stage codegen for the surrounding plan.
  */
case class ParseLog(content: Expression, format: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(content, format)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ParseLog =
    copy(content = newChildren(0), format = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_log expects (string content, string format), got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def elementSchema: StructType = ParseLog.schema

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val c = content.eval(input)
    if (c == null) return Iterator.empty
    val fmt = format.eval(input) match {
      case null => "auto"
      case s => s.toString
    }
    FormatRegistry.parse(c.toString, fmt).iterator.map(ParseLog.toRow)
  }
}

object ParseLog {

  /** Output columns = the ParsedEvent contract (graft.parse). */
  val schema: StructType = StructType(Seq(
    StructField("event_index", LongType, nullable = false),
    StructField("severity", StringType, nullable = false),
    StructField("message", StringType),
    StructField("raw_text", StringType),
    StructField("tool_name", StringType),
    StructField("category", StringType),
    StructField("code", StringType),
    StructField("rule", StringType),
    StructField("test_name", StringType),
    StructField("ref_file", StringType),
    StructField("ref_line", IntegerType),
    StructField("ref_column", IntegerType),
    StructField("log_line_start", IntegerType),
    StructField("log_line_end", IntegerType)))

  private def utf8(o: Option[String]): AnyRef =
    o.map(UTF8String.fromString).orNull

  private def boxed(o: Option[Int]): AnyRef =
    o.map(Int.box).orNull

  def toRow(e: ParsedEvent): InternalRow =
    InternalRow(
      e.event_index,
      UTF8String.fromString(e.severity),
      utf8(e.message), utf8(e.raw_text), utf8(e.tool_name),
      utf8(e.category), utf8(e.code), utf8(e.rule), utf8(e.test_name),
      utf8(e.ref_file),
      boxed(e.ref_line), boxed(e.ref_column),
      boxed(e.log_line_start), boxed(e.log_line_end))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ParseLog].getName, null, "parse_log",
    "_FUNC_(content, format) - parses build/test/lint log text into diagnostic event rows.",
    "", "", "", "generator_funcs", "1.0.0", "", "built-in")

  def builder(args: Seq[Expression]): ParseLog = args match {
    case Seq(c) => ParseLog(c, org.apache.spark.sql.catalyst.expressions.Literal("auto"))
    case Seq(c, f) => ParseLog(c, f)
    case _ => throw new IllegalArgumentException(
      s"parse_log takes 1 or 2 arguments, got ${args.length}")
  }

  /** Imperative registration for an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("parse_log"), info, builder _)
}
