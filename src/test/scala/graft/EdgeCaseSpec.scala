package graft

import org.apache.spark.sql.functions._
import graft.ml.{Decontaminate, DedupClusters, SpanDedup, TextDedup}

/** Degenerate-input behavior for the pipeline operators: empty corpus,
  * single document, all-duplicate corpus. The parity gate runs only on
  * the populated testdata tables, so an operator that throws on the
  * empty frame a real pipeline's first-ever run (or a fully-filtered
  * branch) produces would pass every other gate and still take down a
  * job at 3am.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")
  private val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("empty corpus: dedup family returns empty, never throws") {
    assert(TextDedup.exactDuplicates(empty, md5($"text")).count() === 0)
    assert(TextDedup.jaccardPairsPostings(empty, 3, 0.3).count() === 0)
    assert(TextDedup.minhashLshPairs(empty, 3, 12, 4, 0.3).count() === 0)
    assert(TextDedup.simhashPairs(empty, 8, 8).count() === 0)
    assert(SpanDedup.removeDuplicateSpans(empty, 5).count() === 0)
  }

  test("single document: no pairs, span dedup passes it through") {
    val one = docs(1L -> "just one lonely document with nothing to match")
    assert(TextDedup.minhashLshPairs(one, 3, 12, 4, 0.3).count() === 0)
    assert(TextDedup.jaccardPairsPostings(one, 3, 0.3).count() === 0)
    val sd = SpanDedup.removeDuplicateSpans(one, 5).collect()
    assert(sd.length === 1 && sd.head.getLong(2) === 0)
  }

  test("all-duplicate corpus: every doc pairs, one cluster, one keeper") {
    val same = docs((1L to 5L).map(i => i -> "identical text repeated in every document here"): _*)
    val pairs = TextDedup.minhashLshPairs(same, 3, 12, 4, 0.9)
    assert(pairs.count() === 10) // C(5,2), all jaccard 1.0
    val clusters = DedupClusters.assign(same.select($"doc_id"), pairs)
    assert(clusters.filter($"keep").count() === 1)
    assert(clusters.select(countDistinct($"cluster_id")).head().getLong(0) === 1)
  }

  test("clusters with no edges: everyone is their own keeper") {
    val solo = docs(1L -> "aa bb cc", 2L -> "dd ee ff")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = DedupClusters.assign(solo.select($"doc_id"), noPairs).collect()
    assert(out.length === 2 && out.forall(_.getBoolean(2)))
  }

  test("decontamination with empty train side returns empty") {
    val allEval = docs(1L -> "every doc is eval here", 2L -> "and this one too")
    assert(Decontaminate.screened(allEval, lit(true), 3, 10).count() === 0)
    assert(Decontaminate.exact(allEval, lit(true), 3).count() === 0)
  }

  test("winnowing: short-document branches (under k tokens, exactly k, under w grams)") {
    val d = docs(
      1L -> "one two",                    // < k tokens → no grams, no fp
      2L -> "one two three four",         // exactly k → 1 gram, 1 fp
      3L -> "one two three four five six",// 3 grams < w → global min, 1 fp
      4L -> "a b c d e f g h i j k l")    // 9 grams ≥ w → windowed minima
    val out = graft.ml.TextAnalysis.winnowFingerprints(d, k = 4, w = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Int]("n_fp"))).toMap
    assert(out(1L) === ((0, 0)))
    assert(out(2L) === ((1, 1)))
    assert(out(3L) === ((3, 1)))
    assert(out(4L)._1 === 9 && out(4L)._2 >= 1 && out(4L)._2 <= 5)
    // empty corpus is total
    val e = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.ml.TextAnalysis.winnowFingerprints(e, 4, 5).count() === 0)
  }

  test("centroid cosine: single-vector labels score 1.0; empty frame is total") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.6f, 0.8f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = graft.ml.Similarity.centroidCosine(embs)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cos")).toMap
    // a label's only vector IS (a rounding of) its centroid
    assert(math.abs(out(1L) - 1.0) < 1e-6 && math.abs(out(2L) - 1.0) < 1e-6)
    val e = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(graft.ml.Similarity.centroidCosine(e).count() === 0)
  }

  test("centroid cosine litmap differential: identical to the join form") {
    val rng = new scala.util.Random(13)
    val embs = (0 until 200).map { i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1), i % 5) }
      .toDF("vec_id", "embedding", "label")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("vec_id")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Double]("cos"))).toSeq
    // EXACT equality: both forms round centroids to 6 dp and fold the
    // dot/norm left-to-right, so no float tolerance is needed
    assert(rows(graft.ml.Similarity.centroidCosineLitmap(embs)) ===
      rows(graft.ml.Similarity.centroidCosine(embs)))
    val e = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(graft.ml.Similarity.centroidCosineLitmap(e).count() === 0)
  }

  test("containment: empty and single-doc corpora yield no pairs; full overlap = 1.0") {
    assert(TextDedup.containmentPairsPostings(empty, 4, 0.1).count() === 0)
    val one = docs(1L -> "a single document cannot be contained in anything")
    assert(TextDedup.containmentPairsPostings(one, 4, 0.1).count() === 0)
    // identical docs: containment exactly 1.0 both ways (emitted once, a<b)
    val twin = docs(1L -> "same words in the same order here",
      2L -> "same words in the same order here")
    val p = TextDedup.containmentPairsPostings(twin, 4, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(p.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("containment screen: empty batch and empty corpus are total") {
    import graft.streaming.StreamingDedup
    val corpus = docs(1L -> "some corpus document with a few plain words here")
    val index = StreamingDedup.indexCorpusContainment(corpus, n = 4, dfCap = 50)
    val emptyBatch = StreamingDedup.checkBatchContainment(empty, index, 4, 0.5)
    assert(emptyBatch.count() === 0)
    emptyBatch.unpersist()
    val emptyIdx = StreamingDedup.indexCorpusContainment(empty, n = 4, dfCap = 50)
    val vsEmpty = StreamingDedup.checkBatchContainment(corpus, emptyIdx, 4, 0.5)
    assert(vsEmpty.count() === 0)
    vsEmpty.unpersist()
  }

  test("fertility: empty merge table is the identity tokenizer") {
    val d = Seq((1L, "three word doc", "en")).toDF("doc_id", "text", "lang")
    val r = graft.ml.Bpe.fertility(d, Seq.empty, "lang").collect()
    assert(r.length === 1)
    // 3 words -> 3 tokens, fertility 1.0; 12 visible chars / 3 tokens
    assert(r.head.getDouble(4) === 1.0)
    assert(r.head.getDouble(5) === 4.0)
  }

  test("RRF fusion: an empty leg degrades to the other leg's ranking; two empty legs yield empty") {
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L)).toDF("query_id", "cand_id", "rnk")
    val emptyLeg = Seq.empty[(Long, Long, Long)].toDF("query_id", "cand_id", "rnk")
    val out = graft.ml.HybridRetrieval.rrfFuse(lex, emptyLeg, 60, 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3, r._5)) === Seq((1L, 10L, 0L), (2L, 11L, 0L)),
      s"lex-only fusion must preserve lex order with vec_rnk 0: ${out.toSeq}")
    assert(graft.ml.HybridRetrieval.rrfFuse(emptyLeg, emptyLeg, 60, 5)
      .count() === 0)
  }

  test("fuzzy join: empty-string values still join within their block; an empty frame yields no pairs") {
    // dist(\"\", s) = |s| — the degenerate DP row must survive the pipeline
    val df = Seq((1L, "k", ""), (2L, "k", "abc"), (3L, "k", ""))
      .toDF("id", "blk", "s")
    val got = graft.ml.FuzzyJoin.blockedCandidates(df, "id", "s",
        col("blk"), maxDist = 3, blockCap = 10)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq((1L, 2L, 3L, true), (1L, 3L, 0L, true),
      (2L, 3L, 3L, true)))
    val none = graft.ml.FuzzyJoin.blockedCandidates(
      Seq.empty[(Long, String, String)].toDF("id", "blk", "s"),
      "id", "s", col("blk"), maxDist = 3, blockCap = 10)
    assert(none.count() === 0)
  }

  test("systematic resample: m far above the row count picks every positive-weight row with copies summing to m") {
    val rows = Seq((1L, 3L), (2L, 1L), (3L, 6L))
    val got = graft.ml.WeightedSample.systematic(rows.toDF("doc_id", "w"),
        "doc_id", "w", m = 1000)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L), "every row must be picked")
    assert(got.map(_._3).sum === 1000L)
    // copies track the weight proportions: 3/10, 1/10, 6/10 of 1000
    assert(got.map(_._3) === Seq(300L, 100L, 600L))
  }

  test("r16 monitors/curation on empty and single-row inputs: total, never throws") {
    val emptyDocs = Seq.empty[(Long, String, String)].toDF("id", "src", "text")
    // drift: empty frame → zero dim rows; single row → one finite row
    assert(graft.ml.Drift.jsDivergence(emptyDocs, col("id") % 2 === 0,
      Seq("src" -> col("src"))).count() === 0)
    val oneDoc = Seq((1L, "a", "t")).toDF("id", "src", "text")
    val oneJs = graft.ml.Drift.jsDivergence(oneDoc, col("id") % 2 === 0,
      Seq("src" -> col("src"))).select(col("js")).as[Double].head()
    assert(!oneJs.isNaN)
    // snapshot diff: both sides empty → empty
    assert(graft.analytics.SnapshotDiff.diff(emptyDocs, emptyDocs, "id",
      Seq("text")).count() === 0)
    // calibration: empty input → empty on BOTH plan shapes
    val emptyCal = Seq.empty[(Long, String, Long)].toDF("id", "g", "m")
    for (plan <- Seq("window", "distributed"))
      assert(graft.ml.Calibrate.keepByPercentile(emptyCal, "g", "m", "id",
        1, 2, plan = plan).count() === 0, plan)
    // heavy hitters: empty stream → empty sketch and empty recount
    val (n0, c0) = graft.ml.HeavyHitters.sketch(
      Seq.empty[String].toDF("v"), "v", 8)
    assert(n0 === 0L && c0.isEmpty)
  }
}
