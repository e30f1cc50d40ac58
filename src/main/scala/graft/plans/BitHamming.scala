package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bit_hamming(a, b)` — Hamming distance between two equal-length
  * bit-string signatures (SimHash's hot comparison). A native
  * `BinaryExpression` WITH `doGenCode`: the generated code is a tight
  * byte-compare loop that stays inside whole-stage codegen, replacing
  * the 32-term `substring(a,i,1) != substring(b,i,1)` expression chain
  * (32 allocations per row per side) the pure-Column form needs.
  * Null-safe: null in, null out. Unequal lengths compare the common
  * prefix and count the length difference as mismatches.
  */
case class BitHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bit_hamming expects (string, string), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitHamming =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitHamming.distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      code"${ev.value} = graft.plans.BitHamming.distance($a, $b);".toString)
}

object BitHamming {

  /** ASCII byte compare over the UTF8String payloads — bit strings are
    * '0'/'1' so byte identity == char identity. */
  def distance(a: UTF8String, b: UTF8String): Int = {
    val la = a.numBytes(); val lb = b.numBytes()
    val n = math.min(la, lb)
    var d = math.abs(la - lb)
    var i = 0
    while (i < n) {
      if (a.getByte(i) != b.getByte(i)) d += 1
      i += 1
    }
    d
  }

  /** Column-API entry: registers the function on the active session
    * (idempotent) and routes through the SQL function registry —
    * Column↔Expression bridges are private to Spark's sql packages
    * in Spark 4, and registry routing is the supported path. */
  def apply(a: Column, b: Column): Column = {
    SparkSession.active.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("bit_hamming"), info, builder _)
    org.apache.spark.sql.functions.call_udf("bit_hamming", a, b)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BitHamming].getName, null, "bit_hamming",
    "_FUNC_(a, b) - Hamming distance between two bit-string signatures.",
    "", "", "", "misc_funcs", "1.0.0", "", "built-in")

  def builder(args: Seq[Expression]): BitHamming = args match {
    case Seq(a, b) => BitHamming(a, b)
    case _ => throw new IllegalArgumentException(
      s"bit_hamming takes 2 arguments, got ${args.length}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bit_hamming"), info, builder _)
}
