package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicated-substring removal — the span-granularity complement of
  * document-level dedup (q30-q32): instead of dropping whole near-dup
  * documents, remove the REPEATED PASSAGES (boilerplate, license
  * headers, navigation chrome, mirrored quotes) from otherwise-unique
  * documents, keeping the unique remainder. This is the operation
  * "exact substring deduplication" from Lee et al. 2022 (Deduplicating
  * Training Data Makes Language Models Better), here at token-k-gram
  * granularity: any k-token span whose k-gram occurs in more than
  * `dfMax` distinct documents is excised from every document.
  *
  * The paper's suffix-array formulation is inherently single-machine
  * (one global sort of every corpus position); the equivalent
  * distributed shape is an inverted count over positional k-grams:
  *
  *  1. positional gram keys per document — per-row array math, no
  *     shuffle; keys are xxhash64 over the window's token hashes
  *     (fixed 8k-byte input, no gram string ever allocated — the
  *     q31-measured concat trap);
  *  2. ONE shuffle groups gram occurrences to count distinct docs
  *     (map-side partial aggregation bounds it by distinct grams per
  *     partition);
  *  3. hot grams join back to positions (left-semi on the gram key;
  *     hot-gram cardinality ≪ corpus grams because dfMax kills the
  *     long unique tail), and covered token indices are resolved
  *     per-row from the collected hot start positions.
  *
  * No pair of documents is ever joined — cost is O(corpus positions),
  * never O(docs²), and every stage is either per-row or a key-grouped
  * shuffle: the shape survives 100 TB. (A true suffix-array dedup adds
  * arbitrary-length maximal matches; k-gram granularity with k chosen
  * at the paper's 50-token threshold is the standard distributed
  * approximation — spans ≥ k are removed in full, modulo the < k-1
  * token fringe at span edges.)
  *
  * Reference scope note: the reference engine (teaguesterling/blq-cli)
  * has no span-dedup operator; this extends the training-data pipeline
  * surface per the build brief.
  */
object SpanDedup {

  /** Remove every k-token span whose k-gram appears in more than
    * `dfMax` distinct documents.
    *
    * Input: (doc_id, text) with single-space token separation.
    * Output: (doc_id, n_tokens, n_removed, cleaned_hash) — counts of
    * original and excised tokens plus md5 of the cleaned text, one row
    * per input document (docs shorter than k tokens pass through
    * unchanged: a span shorter than k cannot be a duplicated k-span).
    *
    * The token-hash array is materialized as its own projection before
    * the gram lambda references it (Catalyst does no subexpression
    * elimination inside higher-order-function lambdas — see
    * TextDedup.tokTable), and the token array persists because both
    * the gram pass and the reassembly pass consume it. */
  def removeDuplicateSpans(docs: DataFrame, k: Int, dfMax: Int = 1): DataFrame =
    withCleaned(docs, k, dfMax)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(concat_ws(" ", col("kept"))).as("cleaned_hash"))

  /** [[removeDuplicateSpans]] emitting the cleaned TEXT itself:
    * (doc_id, text, n_removed) with every other input column carried
    * through — the form a pipeline stage consumes (the hash form
    * exists for the oracle gate, where a text column would bloat the
    * compared payload for no extra evidence). */
  def cleanDocs(docs: DataFrame, k: Int, dfMax: Int = 1): DataFrame = {
    val carried = docs.columns.filter(c => c != "doc_id" && c != "text").toSeq
    val cleaned = withCleaned(docs.select(col("doc_id"), col("text")), k, dfMax)
      .select(col("doc_id"), concat_ws(" ", col("kept")).as("text"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"))
    if (carried.isEmpty) cleaned
    else cleaned.join(docs.select((col("doc_id") +: carried.map(col)): _*), Seq("doc_id"))
  }

  /** Shared core: (doc_id, toks, kept) per document. */
  private def withCleaned(docs: DataFrame, k: Int, dfMax: Int): DataFrame = {
    val sess = docs.sparkSession
    val toks = docs
      .repartition(sess.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Positional gram keys: key(i) = xxhash64(th[i], ..., th[i+k-1]),
    // 0-based start positions, trailing partial windows sliced off.
    // NOT distinct (unlike shingleKeyTable): position matters here.
    val th = col("th")
    val gramKeys = transform(th, (x, i) =>
      xxhash64(x +: (1 until k).map(j => get(th, i + lit(j))): _*))
    val positions = toks
      .select(col("doc_id"), transform(col("toks"), t => xxhash64(t)).as("th"))
      .filter(size(th) >= k)
      .select(col("doc_id"),
        posexplode(slice(gramKeys, lit(1), size(th) - (k - 1))).as(Seq("pos", "gram")))

    // Gram keys occurring in more than dfMax distinct documents. The
    // groupBy is the pipeline's one corpus-wide shuffle; countDistinct
    // (not count) so within-doc repetition alone never triggers
    // removal — that is q50's repetition filter, a different policy.
    val hot = positions.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > dfMax)
      .select(col("gram"))

    // Hot span start positions per doc. Semi join: hot is the small
    // side after the df filter (AQE broadcasts it when it measures
    // small; no forced hint — a boilerplate-heavy corpus can make it
    // big, and the hint would OOM where a shuffle join just works).
    val hotStarts = positions.join(hot, Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("starts"))

    // Reassemble: token i survives unless some hot span [s, s+k-1]
    // covers it. Per-row cost O(n_tokens · hot_starts_in_doc); the
    // starts array is doc-local and bounded by n_tokens/1.
    val starts = col("starts")
    toks.join(hotStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("toks"),
        coalesce(starts, array().cast("array<int>")).as("starts"))
      .withColumn("kept", filter(col("toks"), (tok, i) =>
        !exists(starts, s => i >= s && i < s + lit(k))))
      .select(col("doc_id"), col("toks"), col("kept"))
  }
}
