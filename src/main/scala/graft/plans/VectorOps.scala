package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector arithmetic for the similarity family (reference
  * behavior: embedding cosine / L2 over `Array[Float]` columns —
  * blq-cli delegates to DuckDB's vectorized `list_dot_product`;
  * this is the Spark-native equivalent).
  *
  * The pure-Column form `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * allocates a zipped intermediate array PER ROW PER PAIR and walks it
  * through two interpreted lambda evaluators — the measured hot path
  * of every all-pairs/bucketed scoring query. These expressions
  * generate a tight primitive loop inside whole-stage codegen: no
  * allocation, no lambda dispatch, same left-to-right accumulation
  * order, so results are BIT-IDENTICAL to the fold form (and to
  * DuckDB's list_dot_product over DOUBLE[], which the oracles use).
  *
  * Null semantics match the fold they replace: null array → null;
  * mismatched lengths or any null element → null (zip_with pads with
  * null and null poisons the fold).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  // result is null for non-null inputs on length mismatch / null element
  override def nullable: Boolean = true
}

/** `vec_dot(a, b)` — sequential-fold dot product. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.plans.VectorOps.dot($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })
}

/** `vec_l2sq(a, b)` — squared L2 distance, one pass, no diff array. */
case class L2Squared(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "vec_l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""java.lang.Double r = graft.plans.VectorOps.l2sq($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
         |""".stripMargin
    })
}

object VectorOps {

  /** Boxed so the generated code can signal the null cases the fold
    * form produces (length mismatch, null element). */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  private def reg(name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    SparkSession.active.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)

  private val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getName, null, "vec_dot",
    "_FUNC_(a, b) - sequential-fold dot product of two double arrays.",
    "", "", "", "misc_funcs", "1.0.0", "", "built-in")
  private val l2Info = new ExpressionInfo(
    classOf[L2Squared].getName, null, "vec_l2sq",
    "_FUNC_(a, b) - squared L2 distance of two double arrays.",
    "", "", "", "misc_funcs", "1.0.0", "", "built-in")

  private def dotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => DotProduct(a, b)
    case _ => throw new IllegalArgumentException("vec_dot takes 2 arguments")
  }
  private def l2Builder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => L2Squared(a, b)
    case _ => throw new IllegalArgumentException("vec_l2sq takes 2 arguments")
  }

  /** Extension-point registration (spark.sql.extensions path). */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"), dotInfo, dotBuilder _))
    ext.injectFunction((FunctionIdentifier("vec_l2sq"), l2Info, l2Builder _))
  }

  /** Column-API entries; registry routing as in [[BitHamming.apply]]. */
  def dotCol(a: Column, b: Column): Column = {
    reg("vec_dot", dotInfo, dotBuilder)
    org.apache.spark.sql.functions.call_udf("vec_dot", a, b)
  }
  def l2sqCol(a: Column, b: Column): Column = {
    reg("vec_l2sq", l2Info, l2Builder)
    org.apache.spark.sql.functions.call_udf("vec_l2sq", a, b)
  }
}
