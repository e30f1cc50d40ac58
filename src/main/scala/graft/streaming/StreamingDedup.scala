package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ml.TextDedup

/** Continuous near-duplicate screening: incoming documents checked
  * against a PRECOMPUTED corpus index as they arrive — the deploy
  * shape of [[graft.ml.TextDedup.minhashLshPairsIncremental]]. A
  * 100 TB corpus is indexed once (signatures + band keys + 63-bit
  * verify-key sets, all per-row expressions over one scan); each
  * arriving micro-batch then:
  *
  *  1. computes its own signatures/bands (narrow, per-row),
  *  2. equi-joins (band, key) against the corpus band table — a
  *     stream-static join, broadcast or bucketed at scale, never a
  *     corpus self-join,
  *  3. drops candidates whose in-row slot-agreement estimate falls
  *     under `minAgree` before anything is verified,
  *  4. verifies survivors with exact Jaccard on 63-bit key arrays,
  *  5. ALSO pairs the batch against itself (batch×batch duplicates),
  *     via the existing batch pipeline.
  *
  * Corpus×corpus work is never generated, matching the incremental
  * batch operator's contract. Processing runs inside `foreachBatch` —
  * each micro-batch is a plain DataFrame there, so the checker reuses
  * the differential-tested batch code verbatim instead of a parallel
  * streaming reimplementation (and distinct/joins are unrestricted).
  * The index should be refreshed whenever accepted batches are folded
  * into the corpus (same cadence as any store compaction).
  */
object StreamingDedup {

  /** Precomputed corpus side: band keys + signatures for candidate
    * generation, 63-bit key sets for exact verification. Both frames
    * are one scan of the corpus, no shuffle; persist or write them
    * out — at scale, bucket `bands` by (band, key) so the per-batch
    * probe is co-located. */
  final case class CorpusIndex(bands: DataFrame, keySets: DataFrame)

  def indexCorpus(docs: DataFrame, n: Int, k: Int, bands: Int): CorpusIndex = {
    require(bands * (k / bands) == k, "k must divide into bands evenly")
    val withDig = TextDedup.shingleDigests(TextDedup.shingleSets(docs, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    CorpusIndex(
      bands = TextDedup.bandKeyTable(
        TextDedup.minhashSignaturesFromDigests(withDig, k), k, bands),
      keySets = TextDedup.keySetsFromDigests(withDig))
  }

  /** Check ONE batch of new documents (doc_id, text) against the
    * corpus index plus itself. Returns (doc_id, dup_id, jaccard,
    * source): `source` = "corpus" for batch×corpus matches (dup_id is
    * the corpus doc) or "batch" for batch×batch pairs (dup_id the
    * other new doc, doc_id < dup_id). Usable directly on a static
    * frame or inside foreachBatch. */
  def checkBatch(newDocs: DataFrame, index: CorpusIndex, n: Int, k: Int,
      bands: Int, threshold: Double, minAgree: Int = 0): DataFrame = {
    val withDig = TextDedup.shingleDigests(TextDedup.shingleSets(newDocs, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val newBands = TextDedup.bandKeyTable(
        TextDedup.minhashSignaturesFromDigests(withDig, k), k, bands)
        .withColumnsRenamed(Map("doc_id" -> "new_id", "sig" -> "new_sig"))
      // batch×corpus candidates: equi-join on the band key, estimate
      // screened in-row, self-matches excluded (a re-ingested doc id
      // is "already in the corpus", not a duplicate of itself)
      val cand = newBands
        .join(index.bands.withColumnsRenamed(
          Map("doc_id" -> "dup_id", "sig" -> "corpus_sig")), Seq("band", "key"))
        .filter(col("new_id") =!= col("dup_id") &&
          TextDedup.sigAgreement(col("new_sig"), col("corpus_sig")) >= minAgree)
        .select(col("new_id"), col("dup_id"))
        .distinct()
      val newKeys = TextDedup.keySetsFromDigests(withDig)
      val vs = cand
        .join(newKeys.select(col("doc_id").as("new_id"), col("sh").as("sh_a")),
          Seq("new_id"))
        .join(index.keySets.select(col("doc_id").as("dup_id"), col("sh").as("sh_b")),
          Seq("dup_id"))
        .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard",
          round(col("shared") / (size(col("sh_a")) + size(col("sh_b")) - col("shared")), 4))
        .filter(col("jaccard") >= threshold)
        .select(col("new_id").as("doc_id"), col("dup_id"), col("jaccard"),
          lit("corpus").as("source"))
      // batch×batch: the proven batch operator, fed THIS method's
      // already-persisted digest frame. Calling minhashLshPairs(docs)
      // here would persist a SECOND internal digest frame per
      // micro-batch that nothing ever unpersists — on a continuous
      // stream that is one pinned cache entry per batch until the
      // executors drown (the exact accumulated-persist failure
      // CLAUDE.md records from the r2 bench).
      val inBatch = TextDedup
        .minhashLshPairsFromDigests(withDig, k, bands, threshold, minAgree)
        .select(col("doc_a").as("doc_id"), col("doc_b").as("dup_id"),
          col("jaccard"), lit("batch").as("source"))
      // materialize before unpersisting the shared digest frame
      val rows = vs.unionByName(inBatch)
      rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      rows
    } finally withDig.unpersist()
  }

  /** Corpus side of the containment screen: df-capped postings
    * (shingle → corpus doc list), the HOT gram list (df > dfCap —
    * needed so a batch doc's denominator excludes grams the corpus
    * index deliberately dropped; Zipf keeps this the short head of
    * the distribution), and per-corpus-doc rare-gram counts. One
    * corpus scan + one groupBy; persist/write under caller control. */
  final case class ContainmentIndex(postings: DataFrame, hot: DataFrame,
      sizes: DataFrame)

  def indexCorpusContainment(docs: DataFrame, n: Int,
      dfCap: Int): ContainmentIndex = {
    // the shared corpus groupBy is persisted (indexCorpus's withDig
    // pattern): postings, hot and sizes all derive from it, and every
    // batch check re-reads two of them — without this, each probe
    // re-pays the full-corpus shingle groupBy per consumer. Lifetime =
    // index lifetime (rebuild at corpus-compaction cadence; the old
    // entry is reclaimed when the index frames become unreachable).
    val grouped = TextDedup.shingleKeyTable(docs, n)
      .groupBy(col("shingle")).agg(collect_list(col("doc_id")).as("docs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = grouped.filter(size(col("docs")) <= dfCap)
    ContainmentIndex(
      postings = postings,
      hot = grouped.filter(size(col("docs")) > dfCap).select(col("shingle")),
      sizes = postings.select(explode(col("docs")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup")))
  }

  /** Containment screen for ONE batch against the corpus index: for
    * each (new doc, corpus doc) sharing a rare gram, containment =
    * shared / min(new doc's non-hot gram count, corpus doc's rare
    * count). Returns (doc_id, dup_id, shared, containment) with
    * containment >= threshold — the ingest-time complement of
    * [[checkBatch]] for the short-doc-inside-long-doc duplication
    * Jaccard under-scores.
    *
    * Screen semantics, deliberately: document frequency is the
    * CORPUS's (the index predates the batch), so a gram rare in the
    * corpus but repeated within the batch still screens, and a batch
    * gram novel to the corpus counts toward the denominator. On a
    * corpus+batch whose combined dfs stay under the cap this equals
    * `containmentPairsPostings` over the union restricted to
    * new×corpus pairs (StreamingSpec pins that differential);
    * batch×batch containment is intentionally out of scope here —
    * fold accepted batches into the corpus and the next index refresh
    * covers them.
    *
    * The RETURNED frame is persisted (it must not lazily re-read the
    * batch gram cache released on exit): the caller owns its
    * unpersist. On a continuous stream use [[runContainment]], which
    * releases each batch's result after the callback — hand-rolled
    * foreachBatch loops that skip the unpersist pin one cache entry
    * per micro-batch forever. */
  def checkBatchContainment(newDocs: DataFrame, index: ContainmentIndex,
      n: Int, threshold: Double): DataFrame = {
    // cold feeds both the denominator count and the postings probe —
    // persisted so the hot anti-join (and the hot frame's corpus
    // lineage) runs once per batch, not once per consumer
    val cold = TextDedup.shingleKeyTable(newDocs, n)
      .join(index.hot, Seq("shingle"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nNew = cold.groupBy(col("doc_id")).agg(count(lit(1)).as("n_new"))
      val shared = cold.join(index.postings, Seq("shingle"))
        .select(col("doc_id"), explode(col("docs")).as("dup_id"))
        .filter(col("doc_id") =!= col("dup_id"))
        .groupBy(col("doc_id"), col("dup_id"))
        .agg(count(lit(1)).as("shared"))
      val rows = shared
        .join(nNew, Seq("doc_id"))
        .join(index.sizes.withColumnRenamed("doc_id", "dup_id"), Seq("dup_id"))
        .withColumn("containment",
          round(col("shared") / least(col("n_new"), col("n_dup")), 4))
        .filter(col("containment") >= threshold)
        .select(col("doc_id"), col("dup_id"), col("shared"), col("containment"))
      // materialize before the batch gram cache unpersists
      rows.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      rows
    } finally cold.unpersist()
  }

  /** Wire a streaming documents frame (doc_id, text) through
    * [[checkBatchContainment]]; each batch's persisted result is
    * released after `onMatches` returns (the [[run]] discipline). */
  def runContainment(stream: DataFrame, index: ContainmentIndex, n: Int,
      threshold: Double)(
      onMatches: (Long, DataFrame) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val matches = checkBatchContainment(batch, index, n, threshold)
        try onMatches(batchId, matches) finally matches.unpersist()
      }
      .start()

  /** Wire a streaming documents frame (doc_id, text) through
    * [[checkBatch]]; `onMatches(batchId, matches)` receives each
    * micro-batch's verified duplicates. */
  def run(stream: DataFrame, index: CorpusIndex, n: Int, k: Int, bands: Int,
      threshold: Double, minAgree: Int = 0)(
      onMatches: (Long, DataFrame) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val matches = checkBatch(batch, index, n, k, bands, threshold, minAgree)
        try onMatches(batchId, matches) finally matches.unpersist()
      }
      .start()
}
