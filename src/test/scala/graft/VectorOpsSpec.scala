package graft

import org.apache.spark.sql.functions._
import graft.plans.VectorOps

/** Specs for the codegen'd vector expressions (vec_dot / vec_l2sq):
  * bit-exact differential against the aggregate(zip_with(...)) fold
  * form they replace, null semantics, and codegen-path proof. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def foldDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  private def foldL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  test("vec_dot / vec_l2sq are bit-identical to the fold form") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(200)(i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      VectorOps.dotCol($"a", $"b").as("nd"), foldDot($"a", $"b").as("fd"),
      VectorOps.l2sqCol($"a", $"b").as("nl"), foldL2($"a", $"b").as("fl"))
      .collect()
    // exact bit equality, not approximate: same accumulation order
    assert(cmp.forall(r => r.getDouble(0) == r.getDouble(1)))
    assert(cmp.forall(r => r.getDouble(2) == r.getDouble(3)))
  }

  test("null semantics: null array, length mismatch, null element") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0, 2.0, 3.0))))
      .toDF("a", "b")
    val out = df.select(VectorOps.dotCol($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq === Seq(Some(11.0), None, None, None))
  }

  test("codegen path: vec_dot fuses into whole-stage codegen") {
    val df = spark.range(100)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), lit(4.0)).as("b"))
    val total = df.select(sum(VectorOps.dotCol($"a", $"b"))).head().getDouble(0)
    assert(total === (0 until 100).map(i => i * 3.0 + 8.0).sum)
    val cg = org.apache.spark.sql.execution.debug.codegenString(
      df.select(VectorOps.dotCol($"a", $"b")).queryExecution.executedPlan)
    assert(cg.contains("WholeStageCodegen"))
    assert(cg.contains("graft.plans.VectorOps.dot"))
  }

  test("SQL registration: usable from spark.sql") {
    VectorOps.dotCol(lit(null), lit(null)) // ensures registration
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) === 11.0)
    VectorOps.l2sqCol(lit(null), lit(null))
    assert(spark.sql("SELECT vec_l2sq(array(1.0d, 3.0d), array(1.0d, 1.0d)) AS d")
      .head().getDouble(0) === 4.0)
  }
}
