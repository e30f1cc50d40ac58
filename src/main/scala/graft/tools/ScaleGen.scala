package graft.tools

import org.apache.spark.sql.SparkSession

/** Deterministic (seed-42) synthetic corpus generator for the scale
  * experiments in SCALING.md: documents + embeddings with the same
  * schemas as the driver testdata (TESTDATA.md) at a chosen multiple
  * of sf0.1's row counts, written under a caller-chosen directory
  * (never /root/testdata — that tree is read-only).
  *
  * Generative shape mirrors the sf0.1 tables:
  *  - documents: 10-100 whitespace tokens/doc, 5 langs with an
  *    en-heavy skew, 20 round-robin sources (so per-source groups grow
  *    linearly with the corpus — exactly what q62/q63/q69's
  *    partition-scoped windows must survive).
  *  - embeddings: 64-dim unit-norm float vectors in 10 label clusters.
  *
  * Two deliberate departures from "just repeat sf0.1 ten times", both
  * required for the experiment to measure the OPERATORS and not a
  * degenerate corpus:
  *  - Vocabulary scales with corpus size (31 base words × `factor`
  *    variant suffixes). Real corpora grow vocabulary roughly with
  *    size (Heaps' law), keeping the document frequency of a typical
  *    shingle bounded; a frozen 31-word vocabulary at 10× the docs
  *    multiplies every shingle's df by 10, and the O(df²) pair
  *    expansion any jaccard engine performs — Spark or DuckDB —
  *    becomes a property of the corpus, not the implementation.
  *  - Near-duplicate structure is PLANTED deterministically (every
  *    doc_id ≡ 1 (mod 200) is a ~5%-token-perturbed copy of doc_id-1;
  *    every vec_id ≡ 1 (mod 1000) is a noise-perturbed copy of
  *    vec_id-1) so dedup/similarity queries have linearly-growing true
  *    positives at every scale instead of relying on accidental
  *    collisions that vanish as the vocabulary widens.
  *
  * Everything is a pure function of the row id (per-row seeded RNG),
  * so output is independent of partitioning and identical across
  * re-runs — the ScaleBench numbers are reproducible.
  *
  * Usage: runMain graft.tools.ScaleGen <outDir> [docsFactor]
  * (factor 10 → 50k docs / 20k vectors).
  */
object ScaleGen {

  private val baseVocab: IndexedSeq[String] = Vector(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg",
    "filter", "query", "big", "key", "window", "row", "table", "stream",
    "merge", "data", "vector", "customer", "join", "the", "of")

  private val langs = Vector("en", "zh", "es", "fr", "de")

  private def rngFor(kind: Long, id: Long): java.util.Random =
    new java.util.Random(42L + kind * 1000003L + id * 2654435761L)

  /** Token list for a BASE document (no near-dup logic). */
  private def baseTokens(id: Long, vocabVariants: Int): Array[String] = {
    val rng = rngFor(1, id)
    val n = 10 + rng.nextInt(91)
    Array.fill(n) {
      val w = baseVocab(rng.nextInt(baseVocab.length))
      val v = rng.nextInt(vocabVariants)
      if (v == 0) w else s"$w$v"
    }
  }

  private def docRow(id: Long, vocabVariants: Int): (Long, String, String, String, Long) = {
    // Planted near-dup: id ≡ 1 (mod 200) perturbs ~5% of the PREVIOUS
    // doc's tokens — 3-gram jaccard lands ~0.5-0.9, well above the 0.3
    // query threshold.
    val toks =
      if (id % 200 == 1) {
        val base = baseTokens(id - 1, vocabVariants)
        val rng = rngFor(2, id)
        base.map(t =>
          if (rng.nextDouble() < 0.05)
            baseVocab(rng.nextInt(baseVocab.length)) + "x" + rng.nextInt(vocabVariants)
          else t)
      } else baseTokens(id, vocabVariants)
    val text = toks.mkString(" ")
    val lrng = rngFor(3, id)
    val lang = {
      val d = lrng.nextDouble()
      if (d < 0.41) "en" else langs(1 + lrng.nextInt(4))
    }
    (id, text, lang, s"src${id % 20}", text.length.toLong)
  }

  private def vecRow(id: Long): (Long, Array[Float], Int) = {
    val rng = rngFor(4, id)
    val label = rng.nextInt(10)
    // Cluster center: unit-ish gaussian from the label seed; member =
    // 0.5·center + noise, normalized (same-label cos ≈ 0.25 — below
    // the 0.45 near-dup bar, so label structure alone plants no pairs).
    val crng = rngFor(5, label.toLong)
    val center = Array.fill(64)(crng.nextGaussian())
    val raw =
      if (id % 1000 == 1) {
        // near-copy of vec_id-1: cos ≈ 0.995
        val prev = vecRaw(id - 1)
        val nrng = rngFor(6, id)
        prev.map(x => x + 0.1 * nrng.nextGaussian() / 8.0)
      } else vecRaw(id, label, center, rng)
    val nrm = math.sqrt(raw.map(x => x * x).sum)
    (id, raw.map(x => (x / nrm).toFloat), label)
  }

  /** Raw (pre-normalization) vector for id, recomputable for the
    * near-copy path. */
  private def vecRaw(id: Long): Array[Double] = {
    val rng = rngFor(4, id)
    val label = rng.nextInt(10)
    val crng = rngFor(5, label.toLong)
    val center = Array.fill(64)(crng.nextGaussian())
    vecRaw(id, label, center, rng)
  }

  private def vecRaw(id: Long, label: Int, center: Array[Double],
      rng: java.util.Random): Array[Double] =
    center.map(c => 0.5 * c / 8.0 + rng.nextGaussian() / 8.0)

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val factor = if (args.length > 1) args(1).toInt else 10
    val nDocs = 5000L * factor
    val nVecs = 2000L * factor
    val vocabVariants = math.max(1, factor)
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nFiles = math.max(8, factor)
    spark.range(0, nDocs, 1, nFiles)
      .map(id => docRow(id, vocabVariants))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    spark.range(0, nVecs, 1, nFiles)
      .map(id => vecRow(id))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"wrote $nDocs docs / $nVecs vecs (vocab ${baseVocab.length}x$vocabVariants) to $out")
    spark.stop()
  }
}
