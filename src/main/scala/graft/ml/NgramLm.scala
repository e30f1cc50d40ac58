package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-corpus n-gram LM scoring — the CCNet-style quality
  * filter (Wenzek et al. 2020: score the crawl by perplexity under an
  * LM trained on a REFERENCE corpus; Brants et al. 2007 for the
  * backoff rule): documents whose token transitions look unlike the
  * reference score high surprisal and are filtered or bucketed
  * (CCNet's head/middle/tail split). [[graft.queries]] q48 is the
  * degenerate self-trained unigram form; this is the real primitive —
  * the LM trains on `isRef` rows only and scores the REST, so the
  * backoff path is live (a scored doc can carry transitions the
  * reference never saw).
  *
  * Model: bigram Stupid Backoff (Brants et al.: no discounting,
  * S(w|v) = c(v,w)/c(v) when the bigram was seen in the reference,
  * else α·P_uni(w) — "stupid" because the score is not a normalized
  * probability, which is exactly why it distributes: scoring needs
  * only count lookups, no held-out EM). The unigram backoff is add-1
  * smoothed over the reference vocabulary (P_uni(w) =
  * (c(w)+1)/(N+V+1), the +1 vocabulary slot carrying every unseen
  * word's mass) so an out-of-vocabulary token scores finite instead
  * of log(0) — totality the way qualityScore guards the empty string.
  *
  * Cross-engine exactness: all counts are exact integers; each score
  * is ONE IEEE division of exact integers (+ the α multiply), each
  * log is ln() of that rational — the q48 emission precedent — and
  * the per-doc mean emits through round(·, 4). Deterministic: no RNG,
  * no floats before the final division.
  *
  * Scale shape: bigram extraction is per-row array math (transform
  * over the split-token array — no self-join, no positional explode
  * join); the reference LM tables are bounded by the REFERENCE's
  * vocabulary, not the scored corpus, and attach to the scored bigram
  * stream with two left joins that AQE broadcasts while the reference
  * is small and shuffle-joins when it is not — at 100 TB the
  * reference (a curated corpus) is orders smaller than the crawl
  * being scored, which is the whole point of the recipe. One explode
  * pass over the scored side; the doc-level agg is map-side
  * combinable. */
object NgramLm {

  /** (prev, cur) bigram rows from a docs frame — per-row array math:
    * zip the token array with itself shifted by one. Docs with fewer
    * than 2 tokens contribute no rows. */
  private def bigrams(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode_outer(
        transform(slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
          (cur, i) => struct(element_at(toks, i + 1).as("prev"),
            cur.as("cur")))).as("bg"))
      .filter(col("bg").isNotNull)
      .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
  }

  /** Per-document mean bigram surprisal under the reference LM:
    * (doc_id, surprisal, n_bigrams, n_backoff) for every NON-reference
    * doc with at least one bigram. `surprisal` = −mean ln S rounded to
    * 4 dp; `n_backoff` counts transitions the reference never saw —
    * the OOV-pressure signal a mixture monitor watches alongside the
    * score itself. */
  def bigramSurprisal(docs: DataFrame, isRef: Column,
      alpha: Double = 0.4): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val flagged = docs.select(col("doc_id"), col("text"), isRef.as("is_ref"))
    val ref = flagged.filter(col("is_ref"))
    val refBg = bigrams(ref)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_bg"))
    val refUni = ref
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_uni"))
    // reference totals: one bounded agg, broadcast as a 1-row frame
    val stats = refUni.agg(sum(col("c_uni")).as("n_total"),
      count(lit(1)).as("v"))
    val scoredBg = bigrams(flagged.filter(!col("is_ref")))
    scoredBg
      .join(refBg, Seq("prev", "cur"), "left")
      .join(refUni.withColumnRenamed("tok", "prev")
        .withColumnRenamed("c_uni", "c_prev"), Seq("prev"), "left")
      .join(refUni.withColumnRenamed("tok", "cur")
        .withColumnRenamed("c_uni", "c_cur"), Seq("cur"), "left")
      .crossJoin(broadcast(stats))
      // seen bigram: exact ratio of reference counts (c_prev is
      // always present when c_bg is); backoff: α · add-1 unigram
      .withColumn("s",
        when(col("c_bg").isNotNull,
          col("c_bg").cast("double") / col("c_prev"))
          .otherwise(lit(alpha) *
            (coalesce(col("c_cur"), lit(0L)) + lit(1L)).cast("double") /
            (col("n_total") + col("v") + lit(1L))))
      .withColumn("backoff", col("c_bg").isNull)
      .groupBy(col("doc_id"))
      .agg(
        round(sum(-log(col("s"))) / count(lit(1)), 4).as("surprisal"),
        count(lit(1)).as("n_bigrams"),
        sum(when(col("backoff"), 1L).otherwise(0L)).as("n_backoff"))
  }
}
