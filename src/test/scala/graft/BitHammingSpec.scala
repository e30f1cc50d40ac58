package graft

import org.apache.spark.sql.functions._
import graft.plans.BitHamming

/** Specs for the codegen'd bit_hamming expression. */
class BitHammingSpec extends SparkSpec {
  import spark.implicits._

  test("hamming distance: equal, differing, unequal-length, nulls") {
    val df = Seq(
      ("0000", Some("0000")),
      ("0000", Some("0101")),
      ("1111", Some("0000")),
      ("0000", Some("000011")), // length diff counts as mismatches
      ("0000", None))
      .toDF("a", "b")
    val out = df.select(BitHamming($"a", $"b").as("d"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(out.toSeq === Seq(0, 2, 4, 2, -1))
  }

  test("codegen path: expression inside whole-stage codegen, matches eval") {
    val n = 1000
    // spark.range is a codegen'd source, so the projection fuses into a
    // WholeStageCodegen stage (a LocalTableScan would not).
    val df = spark.range(n)
      .selectExpr("lpad(bin(id), 11, '0') AS a", "'00000000000' AS b")
    val total = df.select(sum(BitHamming($"a", $"b")).as("s")).head().getLong(0)
    // sum of popcounts of 0..999
    val expected = (0 until n).map(Integer.bitCount).sum.toLong
    assert(total === expected)
    // the generated whole-stage code must call the native distance fn
    // (i.e. doGenCode was used, not the interpreted fallback)
    val cg = org.apache.spark.sql.execution.debug.codegenString(
      df.select(BitHamming($"a", $"b")).queryExecution.executedPlan)
    assert(cg.contains("WholeStageCodegen"))
    assert(cg.contains("graft.plans.BitHamming.distance"))
  }

  test("bit_hamming registered as SQL function") {
    BitHamming.register(spark)
    assert(spark.sql("SELECT bit_hamming('0110', '0000') AS d").head().getInt(0) === 2)
  }

  test("simhash pairs via bit_hamming match the pure-column form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content about query engines"))
      .toDF("doc_id", "text")
    val pairs = graft.ml.TextDedup.simhashPairs(docs, prefixBits = 1, maxHamming = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // sanity: near-dup pair is closer than the unrelated pair
    val near = pairs.find(p => p._1 == 1L && p._2 == 2L)
    val far = pairs.find(p => p._1 == 1L && p._2 == 3L)
    assert(near.isDefined)
    for (n <- near; f <- far) assert(n._3 < f._3)
  }
}
