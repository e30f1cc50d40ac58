package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application (reference behavior: the tokenizer
  * encode step — apply a learned merge table to a token sequence,
  * each rule a greedy left-to-right non-overlapping fuse; Sennrich et
  * al. 2016, public literature).
  *
  * The Column form ([[graft.ml.Bpe.mergePair]]) is one `aggregate`
  * higher-order fold PER RULE, each fold rebuilding the accumulator
  * array per element — measured as the whole cost of q104/q105
  * (8.9×/9.5× paired at r7). This expression applies the ENTIRE merge
  * table in one codegen'd call: per rule one linear pass over a plain
  * UTF8String array, no per-element allocation, no lambda dispatch,
  * no nested-fold Janino blowup (so no localCheckpoint lineage
  * truncation needed either). Same precedent as
  * [[graft.plans.VectorOps]] / [[graft.plans.BitHamming]].
  *
  * Semantics are BIT-IDENTICAL to the fold chain (differential-tested
  * in BpeSpec): rules apply in table order; within a rule, a pair
  * (a, b) fuses to `a + Sep + b` and the fused token is atomic for
  * the remainder of that pass ("a a a" + (a,a) → [aa, a]); null
  * elements never match and pass through; a null array is null.
  */
case class BpeApplyMerges(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bpe_apply"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, false))
          if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _))
          if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<string>, foldable array<string> " +
          s"flat merge pairs), got ${l.simpleString}, ${r.simpleString}")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeApplyMerges =
    copy(left = newLeft, right = newRight)

  /** (a, b, fused) per rule, precompiled ONCE per expression instance
    * from the foldable merge literal — comparisons in the hot loop are
    * UTF8String equals on interned objects, no per-row decode. */
  @transient private lazy val mergeTable: Array[Array[UTF8String]] = {
    val flat = right.eval(null).asInstanceOf[ArrayData]
    require(flat != null && flat.numElements() % 2 == 0,
      "bpe_apply merge table must be a non-null flat [a1,b1,a2,b2,...] array")
    Array.tabulate(flat.numElements() / 2) { i =>
      val a = flat.getUTF8String(2 * i)
      val b = flat.getUTF8String(2 * i + 1)
      Array(a, b, UTF8String.concat(a, BpeOps.SepU8, b))
    }
  }

  override protected def nullSafeEval(toks: Any, ignored: Any): Any =
    BpeOps.applyMerges(toks.asInstanceOf[ArrayData], mergeTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeMergeTable", mergeTable,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.plans.BpeOps.applyMerges($t, $tableRef);")
  }
}

object BpeOps {

  /** Separator inside fused tokens — must equal [[graft.ml.Bpe.Sep]]
    * (asserted in BpeSpec). */
  val Sep = ""
  val SepU8: UTF8String = UTF8String.fromString(Sep)

  /** Apply the whole merge table: for each rule one pass, fusing
    * non-overlapping (a, b) pairs greedy left-to-right. The fused
    * token is appended and the scan resumes AFTER it, so it can match
    * `a` of the same rule only as a fresh left element — exactly the
    * fold's "accumulator last" semantics. */
  def applyMerges(toks: ArrayData,
      table: Array[Array[UTF8String]]): ArrayData = {
    var n = toks.numElements()
    var cur = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      cur(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    var r = 0
    while (r < table.length) {
      val a = table(r)(0); val b = table(r)(1); val fused = table(r)(2)
      val out = new Array[UTF8String](n)
      var m = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && cur(i) != null && cur(i).equals(a) &&
            cur(i + 1) != null && cur(i + 1).equals(b)) {
          out(m) = fused; m += 1; i += 2
        } else {
          out(m) = cur(i); m += 1; i += 1
        }
      }
      cur = out; n = m
      r += 1
    }
    val res = new Array[AnyRef](n)
    i = 0
    while (i < n) { res(i) = cur(i); i += 1 }
    new GenericArrayData(res)
  }

  private val info = new ExpressionInfo(
    classOf[BpeApplyMerges].getName, null, "bpe_apply",
    "_FUNC_(toks, merges) - apply a flat [a1,b1,...] BPE merge table " +
      "to a token array, greedy left-to-right per rule.",
    "", "", "", "misc_funcs", "1.0.0", "", "built-in")

  private def builder(args: Seq[Expression]): Expression = args match {
    case Seq(t, m) => BpeApplyMerges(t, m)
    case _ => throw new IllegalArgumentException("bpe_apply takes 2 arguments")
  }

  /** Extension-point registration (spark.sql.extensions path). */
  def injectInto(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction((FunctionIdentifier("bpe_apply"), info, builder _))

  /** Column-API entry; registry routing as in [[BitHamming.apply]].
    * The merge table becomes a foldable CreateArray of string
    * literals, flat [a1,b1,a2,b2,...]. */
  def applyCol(toks: Column, merges: Seq[(String, String)]): Column = {
    // empty table = identity tokenizer (and array() would type as
    // array<void>, failing the expression's check)
    if (merges.isEmpty) return toks
    SparkSession.active.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("bpe_apply"), info, builder _)
    val flat = merges.flatMap { case (a, b) => Seq(a, b) }
      .map(org.apache.spark.sql.functions.lit)
    org.apache.spark.sql.functions.call_udf("bpe_apply", toks,
      org.apache.spark.sql.functions.array(flat: _*))
  }
}
