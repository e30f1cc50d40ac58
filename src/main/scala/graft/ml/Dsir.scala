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
  * `buckets` rows regardless of corpus size. The operator is exactly
  * TWO jobs over the corpus — a bounded groupBy(feature) for the LMs
  * (collected driver-side, inlined as a literal log-ratio array) and a
  * per-doc scoring aggregation — each one tokenize+explode pass with a
  * single exchange. Tokenizing twice beats caching the intermediate
  * feature table: the per-doc weight is algebraically a plain sum of
  * per-instance log-ratios, and the (doc, feature) tf persist the
  * first formulation cached cost more than the second pass it saved
  * (measured r11, DsirProbe). md5 (not xxhash) is the feature hash
  * because the DuckDB oracle must bucket identically (the q61
  * hash-split precedent).
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
    // Spread the two tokenize+explode passes when the input arrives
    // under-parallel (single-file testdata = ONE partition, the
    // CLAUDE.md narrow-work trap): the r11 pin measured its isolates
    // on a repartitioned helper frame and missed that the SHIPPED
    // path ran both passes on one core — r13 interleaved A/B: 1.04
    // vs 1.42 s min at sf0.1. Guarded so a real multi-split scan
    // never pays a corpus-wide text shuffle; only the three needed
    // columns ride the exchange when it does fire.
    val narrow = docs.select(col("doc_id"), isTarget.as("is_t"), col("text"))
    val spark = docs.sparkSession
    val spread =
      if (narrow.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
        narrow.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      else narrow
    val toks = split(col("text"), " ")
    // adjacent-pair grams via the q84 zip_with/slice pattern — no
    // posexplode self-join, one pass
    val grams = slice(
      zip_with(toks, slice(concat(toks, array(lit(null).cast("string"))),
        lit(2), size(toks)),
        (a, b) => concat_ws(" ", a, b)),
      lit(1), size(toks) - 1)
    val instances = spread
      .select(col("doc_id"), col("is_t"), grams.as("grams"))
      .filter(size(col("grams")) >= 1)
      .select(col("doc_id"), col("is_t"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), col("is_t"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
          % buckets).as("f"))
    // Shape (r11 decomposition, AbBench/DsirProbe): EXACTLY TWO lean
    // jobs, each scan→explode→one exchange. The per-doc weight is
    // algebraically Σ_instances lr(f) — no (doc, f) tf pre-aggregation
    // is needed anywhere, so the intermediate tf table (and its
    // persist, whose cache write cost more than a second tokenize
    // pass at bench scale: the 3-stage persist+stats job measured
    // ~1.0 s vs 0.2 s for the bare pipeline) is gone. Both LMs come
    // from ONE bounded groupBy(f) over instances, collected
    // driver-side (≤ `buckets` rows — the IVF-centroid precedent) and
    // inlined as a dense lr array: scoring is a pure projection +
    // per-doc sum. Math.log is the same java.lang.Math.log Spark's
    // log codegen calls — identical doubles to the DuckDB oracle's ln.
    val stats = instances.groupBy(col("f"))
      .agg(count(lit(1)).as("ns"),
        sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val st = stats.map(_._2).sum.toDouble
    val tt = stats.map(_._3).sum.toDouble
    val byF = stats.map(s => s._1 -> s).toMap
    val lrArr = array((0 until buckets).map { f =>
      val (ns, nt) = byF.get(f.toLong).map(s => (s._2, s._3)).getOrElse((0L, 0L))
      lit(math.log((nt + 1) / (tt + buckets)) -
        math.log((ns + 1) / (st + buckets)))
    }: _*)
    instances
      .groupBy(col("doc_id"))
      .agg(round(sum(element_at(lrArr, col("f").cast("int") + 1)), 4).as("logw"))
      .select(col("doc_id"), col("logw"),
        when(col("logw") > 0, 1L).otherwise(0L).as("selected"))
  }
}
