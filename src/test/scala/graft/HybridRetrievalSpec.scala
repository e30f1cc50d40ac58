package graft

import org.apache.spark.sql.functions._
import graft.ml.HybridRetrieval

/** RRF fusion: the fused ranking must equal the hand-computed
  * reciprocal-rank arithmetic, candidates present in one leg only
  * must carry exactly one term, and ties must break deterministically
  * on cand_id (q129 gates the same math against DuckDB at data
  * scale; this spec pins it at unit scale where the expectation is
  * computable by hand). */
class HybridRetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def legDf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("query_id", "cand_id", "rnk")

  test("fused scores equal the hand-computed RRF sum; both-leg candidates outrank single-leg ones at comparable depth") {
    // query 0: doc 10 is lex#1 + vec#2, doc 11 is lex#2 only,
    // doc 12 is vec#1 only
    val lex = legDf(Seq((0L, 10L, 1L), (0L, 11L, 2L)))
    val vec = legDf(Seq((0L, 12L, 1L), (0L, 10L, 2L)))
    val out = HybridRetrieval.rrfFuse(lex, vec, kRrf = 60, topK = 10)
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._2).toSeq
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val expected = Seq(
      // (query, rnk, cand, lex_rnk, vec_rnk, score) — by rnk
      (0L, 1L, 10L, 1L, 2L, r6(1.0 / 61 + 1.0 / 62)),
      (0L, 2L, 12L, 0L, 1L, r6(1.0 / 61)),
      (0L, 3L, 11L, 2L, 0L, r6(1.0 / 62)))
    assert(out.sortBy(_._2) === expected)
  }

  test("symmetric-swap ties break on cand_id; topK truncates per query") {
    // docs 20/21 have swapped leg ranks → identical RRF score →
    // cand_id order decides; doc 22 trails and must be cut by topK=2
    val lex = legDf(Seq((7L, 21L, 1L), (7L, 20L, 2L), (7L, 22L, 3L)))
    val vec = legDf(Seq((7L, 20L, 1L), (7L, 21L, 2L)))
    val out = HybridRetrieval.rrfFuse(lex, vec, kRrf = 60, topK = 2)
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().sortBy(_._2).toSeq
    assert(out.map(r => (r._2, r._3)) === Seq((1L, 20L), (2L, 21L)),
      s"tie must break on cand_id: $out")
    assert(!out.exists(_._3 == 22L), "topK=2 must cut the third candidate")
  }

  test("queries are independent: a query present in one leg only still ranks; per-query output never exceeds topK") {
    val lex = legDf((1L to 8L).map(c => (1L, c, c)) ++ Seq((2L, 50L, 1L)))
    val vec = legDf((1L to 8L).map(c => (1L, c + 4, c)))
    val out = HybridRetrieval.rrfFuse(lex, vec, kRrf = 60, topK = 3)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ(1L).length === 3 && byQ(2L).length === 1)
    assert(byQ(2L).head._3 === 50L && byQ(2L).head._5 === 0L)
    // rnk is dense 1..n within each query
    byQ.values.foreach(rows =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length).toSeq))
  }

  test("a 0-based leg rank is refused loudly, never silently treated as absent") {
    val lex = legDf(Seq((0L, 10L, 0L))) // rank 0 = a 0-based caller bug
    val vec = legDf(Seq((0L, 11L, 1L)))
    val e = intercept[Exception] {
      HybridRetrieval.rrfFuse(lex, vec, 60, 5).collect()
    }
    assert(e.getMessage.contains("1-based"),
      s"expected the 1-based guard, got: ${e.getMessage}")
  }

  test("fusion is invariant under leg row order and partitioning") {
    val r = new scala.util.Random(3)
    val lex = (0L until 5L).flatMap(q =>
      r.shuffle((1L to 20L).toList).take(8).zipWithIndex
        .map { case (c, i) => (q, c, i + 1L) })
    val vec = (0L until 5L).flatMap(q =>
      r.shuffle((1L to 20L).toList).take(6).zipWithIndex
        .map { case (c, i) => (q, c, i + 1L) })
    val a = HybridRetrieval.rrfFuse(legDf(lex), legDf(vec), 60, 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    val b = HybridRetrieval.rrfFuse(
        legDf(r.shuffle(lex)).repartition(7),
        legDf(r.shuffle(vec)).repartition(3), 60, 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(a === b)
  }
}
