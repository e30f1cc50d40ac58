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
