package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of a lexical and a
  * vector leg, the standard way a training-data/RAG pipeline combines
  * BM25 relevance with embedding similarity without score calibration
  * (ranks are scale-free; raw BM25 and cosine live on incomparable
  * scales). Fuses the repo's two stored retrieval indexes:
  * [[LexIndex]] (term postings → BM25 top-k) and [[IvfIndex]]
  * (bucketed cells → cosine top-k).
  *
  * Reference behavior frame: blq-cli composes multiple query signals
  * over one stored corpus (fingerprint filters + text search + field
  * predicates in one query, /root/reference/src/blq/query.py) — the
  * ranked-retrieval generalization: two independent rankers over the
  * same documents, one fused ranking out.
  *
  * RRF (Cormack/Clarke/Buettcher 2009): score(d) = Σ_legs 1/(K + r)
  * over the legs that ranked d, K = 60 conventionally. Determinism is
  * exact cross-engine: each term is one IEEE division of
  * exact-integer-derived doubles, and the two-term sum is a single
  * commutative addition — both engines compute bit-identical scores,
  * so the fused ranking carries an EXACT DuckDB gate (q129). Emission
  * rounds via the integer-target contract (q71): round(x·10⁶, 0) is
  * engine-safe where round(x, 6) is not.
  *
  * Scale shape: both legs are k-bounded index probes (≤ k·|queries|
  * rows by construction — the corpus never reaches this operator), so
  * the fusion is one tiny full-outer join plus a |queries|-partition
  * window over ≤ 2k rows per query. The at-100 TB cost lives entirely
  * in the index probes, which carry their own plan pins
  * (LexIndex.probeLocal exchange shaping, Ivf.probeShaped build-side
  * pick). The few-distinct-key window exchange that is a trap on
  * corpus-sized frames (CLAUDE.md r11) is harmless here because the
  * window input is k-bounded BEFORE the exchange. */
object HybridRetrieval {

  /** Fuse two ranked legs, each (query_id, cand_id, rnk) with rnk
    * 1-based within query. Returns the top `topK` fused candidates per
    * query: (query_id, rnk, cand_id, lex_rnk, vec_rnk, rrf_score),
    * leg ranks 0 when the leg did not rank the candidate. Ties on the
    * fused score (e.g. the symmetric swap lex=1/vec=2 vs lex=2/vec=1)
    * break on cand_id — deterministic both engines. */
  def rrfFuse(lex: DataFrame, vec: DataFrame, kRrf: Int = 60,
      topK: Int = 10): DataFrame = {
    require(kRrf >= 1, s"RRF constant must be >= 1, got $kRrf")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // ranks must be 1-based: 0 is the fused output's "leg absent"
    // convention, so a 0-based leg would silently drop its BEST
    // candidate per query — fail loudly at the first offending row
    def leg(df: DataFrame, as: String) =
      df.select(col("query_id").cast("long").as("query_id"),
        col("cand_id").cast("long").as("cand_id"),
        when(col("rnk").cast("long") >= 1, col("rnk").cast("long"))
          .otherwise(raise_error(concat(
            lit(s"rrfFuse: leg rank must be 1-based, got "),
            col("rnk").cast("string")))).as(as))
    def term(rnk: String) =
      when(col(rnk) > 0, lit(1.0) / (lit(kRrf.toLong) + col(rnk)))
        .otherwise(lit(0.0))
    val fused = leg(lex, "lex_rnk")
      .join(leg(vec, "vec_rnk"), Seq("query_id", "cand_id"), "full")
      .select(col("query_id"), col("cand_id"),
        coalesce(col("lex_rnk"), lit(0L)).as("lex_rnk"),
        coalesce(col("vec_rnk"), lit(0L)).as("vec_rnk"))
      .withColumn("rrf", term("lex_rnk") + term("vec_rnk"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("cand_id"))
    fused
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      // integer-target round then one exact-long division (the q71
      // emission contract — round(double, 6) diverges cross-engine
      // near decimal boundaries, scale-0 round does not)
      .select(col("query_id"), col("rnk"), col("cand_id"),
        col("lex_rnk"), col("vec_rnk"),
        (round(col("rrf") * 1000000, 0).cast("long") / lit(1000000.0))
          .as("rrf_score"))
  }
}
