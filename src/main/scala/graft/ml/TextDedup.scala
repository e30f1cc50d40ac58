package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash-groupBy), n-gram Jaccard (inverted index), MinHash+LSH
  * (shingle → signature → band → bucket-join), and SimHash.
  *
  * Portability contract: every hash primitive is built from `md5` +
  * string ops that exist identically in Spark and DuckDB, so each
  * pipeline has an exact SQL oracle (see graft.queries.PipelineQueries).
  * MinHash uses the *lexicographic minimum of salted md5 hex digests* —
  * deterministic, engine-independent, and an unbiased permutation-min
  * approximation (each salt defines an independent pseudo-permutation
  * of shingle space).
  *
  * Scale design (the point of these over a naive cross join):
  *  - exact dedup: one shuffle on the 128-bit content hash; no pairs.
  *  - inverted-index Jaccard: pairs are generated only for docs sharing
  *    a shingle, with hot shingles (df > dfCap) dropped — the classic
  *    "stop-shingle" prefix filter. Cross-join never materializes.
  *  - MinHash+LSH: candidate generation is a groupBy on (band, key) —
  *    O(docs·bands) rows shuffled, independent of pair count. This is
  *    the 100 TB path: banding keys partition uniformly (md5), and the
  *    verify join touches only candidate pairs.
  *  - SimHash: one agg over exploded tokens → 32-bit signature; near-dup
  *    candidates bucket on a signature prefix (hamming ≤ r within
  *    bucket), again avoiding all-pairs.
  */
object TextDedup {

  /** Whitespace tokens of `text` (clean single-space corpus contract). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles as an array column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** (doc_id, shingle) exploded, distinct. Input must have doc_id, text.
    * Repartitions the corpus first: document tables often arrive as few
    * large files (one input split each), and the shingle explode + hash
    * work downstream is the expensive part — spread it across all cores
    * BEFORE it fans out, or everything runs on one task. */
  def shingleTable(docs: DataFrame, n: Int): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(shingles(col("text"), n)).as("shingle"))

  /** Exact duplicate groups: docs keyed by content hash; `keep_id` is
    * the canonical (minimum) doc of each group. One shuffle, no pairs —
    * the only exact-dedup shape that survives 100 TB. */
  def exactDuplicates(docs: DataFrame, keyExpr: Column): DataFrame =
    docs.select(col("doc_id"), md5(keyExpr).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("group_size"),
        array_sort(collect_list(col("doc_id"))).as("members"))

  /** Pairwise n-gram Jaccard via inverted index with stop-shingle cap.
    * Output: (doc_a, doc_b, jaccard) for jaccard >= threshold, a < b.
    * Shingles with document frequency > dfCap are dropped on BOTH the
    * index and the set-size side, so the ratio stays a true Jaccard
    * over the rare-shingle subspace. */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      dfCap: Int = 50): DataFrame = {
    // The exploded shingle table feeds three consumers (df counts, set
    // sizes, both join sides); persist so the text is tokenized once.
    // MEMORY_AND_DISK: spills instead of OOMing at scale.
    val sh = shingleTable(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("shingle"))
    val rareSh = sh.join(rare, Seq("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = rareSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = rareSh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = rareSh.select(col("doc_id").as("doc_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a")), Seq("doc_a"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b")), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("shared") / (col("n_a") + col("n_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Salted portable min-hash over the exploded shingle table:
    * min(md5(salt || '|' || shingle)) per doc per salt. Returns the doc
    * signature frame: doc_id, mh0..mh{k-1}. */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map(j =>
      min(md5(concat(lit(s"$j|"), col("shingle")))).as(s"mh$j"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH band keys: `bands` groups of `rowsPerBand` signature slots,
    * key = md5 of the concatenated slots. Output (doc_id, band, key). */
  def lshBands(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(slots: _*)).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** MinHash+LSH near-duplicate detection: candidates = docs sharing any
    * band bucket; verified with true Jaccard on the shingle table.
    * Output: (doc_a, doc_b, jaccard) with jaccard >= threshold, a < b.
    *
    * k/bands/rowsPerBand tune the recall curve: P(candidate) =
    * 1-(1-j^rows)^bands. Verification cost is bounded by candidate
    * count, never the cross product. */
  def minhashLshPairs(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double): DataFrame = {
    require(bands * (k / bands) == k, "k must divide into bands evenly")
    val rowsPerBand = k / bands
    val sh = shingleTable(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bk = lshBands(minhashSignatures(sh, k), bands, rowsPerBand)
    // Candidate pairs are orders of magnitude smaller than the shingle
    // table (that is the whole point of LSH) — broadcast them so the
    // verify joins never shuffle the shingle table.
    val candidates = bk.as("x").join(bk.as("y"), Seq("band", "key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val shared = broadcast(candidates)
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a")), Seq("doc_a"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b")), Seq("doc_b"))
      .withColumn("jaccard",
        round(col("shared") / (col("n_a") + col("n_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 32-bit SimHash signature as a '0'/'1' bit string (packed-long-free
    * so the exact same computation is expressible in any SQL engine).
    * Bit i of md5(token): hex char i/4, bit (i%4) of its value; per-doc
    * bit = majority vote over tokens (with multiplicity). */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val withDigits = (0 until 8).foldLeft(toks) { (df, c) =>
      df.withColumn(s"d$c",
        (instr(lit("0123456789abcdef"), substring(col("h"), c + 1, 1)) - 1))
    }
    val sums = (0 until 32).map { i =>
      val c = i / 4; val k = i % 4
      sum(shiftright(col(s"d$c"), k) % 2 * 2 - 1).as(s"s$i")
    }
    val agg = withDigits.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val bits = (0 until 32).map(i => when(col(s"s$i") > 0, "1").otherwise("0"))
    agg.select(col("doc_id"), concat(bits: _*).as("simhash"))
  }

  /** SimHash near-dup pairs: bucket on the first `prefixBits` of the
    * signature, pair within bucket, keep hamming <= maxHamming. */
  def simhashPairs(docs: DataFrame, prefixBits: Int, maxHamming: Int): DataFrame = {
    val sig = simhashSignatures(docs)
      .withColumn("bucket", substring(col("simhash"), 1, prefixBits))
    val a = sig.select(col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = sig.select(col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    val hamming = (1 to 32).map(i =>
      when(substring(col("sig_a"), i, 1) =!= substring(col("sig_b"), i, 1), 1).otherwise(0))
      .reduce(_ + _)
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
