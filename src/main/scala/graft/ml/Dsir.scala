package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (the published
  * recipe: hashed n-gram bag-of-features language models for a TARGET
  * distribution and the raw SOURCE corpus; per-document importance
  * weight = Σ_features tf·(ln p_target − ln p_source); select
  * high-weight documents). Reference behavior frame: the reference
  * engine's quality-filter surface (arbitrary scored SELECTs over
  * stored tables, /root/reference/src/blq/query.py:77-96) — the
  * scoring recipe itself is from the public method.
  *
  * Scale design: features are hashed-BIGRAM buckets (md5 → first 8 hex
  * digits → mod `buckets`), so BOTH language models are bounded at
  * `buckets` rows regardless of corpus size — they broadcast at any
  * scale, and the whole operator is the q48 docpart shape: ONE
  * tokenize+explode pass into a persisted (doc, feature) tf table,
  * two bounded aggregations off it, one broadcast scoring join, one
  * per-doc aggregation. No corpus-sized shuffle beyond the tf groupBy.
  * md5 (not xxhash) is the feature hash because the DuckDB oracle must
  * bucket identically (the q61 hash-split precedent).
  *
  * Counts are exact integers with add-1 smoothing; each probability is
  * ONE double division of exact integers and the weight is a
  * tf-weighted sum of their log difference — the q48 emission
  * contract, parity-checked at multiple scale points.
  */
object Dsir {

  /** Per-document importance weights against a target subset.
    * `isTarget` marks the target-distribution documents (a Column
    * predicate over the input columns, e.g. lang = 'en').
    * Returns (doc_id, logw, selected): logw rounded to 4 decimals,
    * selected = 1 when the ROUNDED weight is positive (deriving the
    * flag from the emitted rounding keeps the cross-engine boundary
    * deterministic). */
  def hashedBigramWeights(docs: DataFrame, isTarget: Column,
      buckets: Int = 256): DataFrame = {
    val toks = split(col("text"), " ")
    // adjacent-pair grams via the q84 zip_with/slice pattern — no
    // posexplode self-join, one pass
    val grams = slice(
      zip_with(toks, slice(concat(toks, array(lit(null).cast("string"))),
        lit(2), size(toks)),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), size(toks) - 1)
    val feats = docs
      .select(col("doc_id"), isTarget.as("is_t"), grams.as("grams"))
      .filter(size(col("grams")) >= 1)
      .select(col("doc_id"), col("is_t"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), col("is_t"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
          % buckets).as("f"))
      .groupBy(col("doc_id"), col("is_t"), col("f"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sstat = feats.groupBy(col("f")).agg(sum(col("tf")).as("ns"))
    val tstat = feats.filter(col("is_t"))
      .groupBy(col("f")).agg(sum(col("tf")).as("nt"))
    val totals = sstat.agg(sum(col("ns")).cast("double").as("st"))
      .crossJoin(tstat.agg(sum(col("nt")).cast("double").as("tt")))
    // bounded: ≤ `buckets` rows after the left join — broadcast side
    val lm = sstat.join(tstat, Seq("f"), "left").crossJoin(broadcast(totals))
      .select(col("f"),
        (log((coalesce(col("nt"), lit(0L)) + 1) / (col("tt") + buckets)) -
          log((col("ns") + 1) / (col("st") + buckets))).as("lr"))
    feats.join(broadcast(lm), Seq("f"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("tf") * col("lr")), 4).as("logw"))
      .select(col("doc_id"), col("logw"),
        when(col("logw") > 0, 1L).otherwise(0L).as("selected"))
  }
}
