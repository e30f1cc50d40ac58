package graft

import org.apache.spark.sql.functions._
import graft.ml.{BandIndex, TextDedup}

/** Proves minhashLshPairsIncremental's stored-index claim: the corpus
  * band table bucketed by (band, key) probes with NO corpus-side
  * exchange, and the probe's output equals the in-memory incremental
  * operator on the same corpus/batch split. */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(ids: Seq[Long], base: String): Seq[(Long, String)] =
    ids.map(i => (i, s"$base variant $i tail token stream alpha beta gamma delta"))

  test("bucketed band index: co-located probe join, differential vs incremental operator") {
    // corpus: two near-dup families + singletons; batch: a near-dup of
    // family A, a brand-new pair of near-identical docs, one unrelated
    val corpus = (
      mkDocs(Seq(0L, 1L), "the quick brown fox jumps over the lazy dog again and") ++
      mkDocs(Seq(2L, 3L), "completely different content about spark catalyst plans") ++
      Seq((4L, "a singleton document with its own words entirely unlike others"))
    ).toDF("doc_id", "text")
    val batch = (
      mkDocs(Seq(10L), "the quick brown fox jumps over the lazy dog again and") ++
      Seq(
        (11L, "fresh pair of documents sharing almost every single token here now"),
        (12L, "fresh pair of documents sharing almost every single token here too"),
        (13L, "nothing in common with anything else in this corpus at all"))
    ).toDF("doc_id", "text")
    val (n, k, bands, thr) = (3, 8, 4, 0.3)

    try {
      BandIndex.write(corpus, "g_band_idx", n, k, bands, buckets = 4)

      // plan shape: with broadcast + AQE off, the (band,key) join reads
      // the corpus STRAIGHT from its buckets — the only exchange in the
      // plan is the batch side's
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val batchBands = TextDedup.bandKeyTable(
          TextDedup.minhashSignaturesFromDigests(
            TextDedup.shingleDigests(TextDedup.shingleSets(batch, n)), k), k, bands)
        val cross = spark.table("g_band_idx")
          .join(batchBands.select(col("band"), col("key"),
            col("doc_id").as("new_doc")), Seq("band", "key"))
        val plan = cross.queryExecution.executedPlan.toString()
        assert(plan.contains("SortMergeJoin"), plan.take(3000))
        // the corpus reads straight from its buckets...
        assert(plan.contains("Bucketed: true"), plan.take(3000))
        // ...and only the BATCH side hashes onto (band, key) — one such
        // exchange in the whole plan (the batch pipeline's internal
        // doc_id repartition is unrelated to the join)
        assert("Exchange hashpartitioning\\(band".r.findAllIn(plan).size === 1,
          s"expected only the batch-side (band,key) exchange:\n${plan.take(3000)}")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }

      // result differential: stored-index probe == in-memory
      // incremental operator on the identical corpus/batch split
      val all = corpus.withColumn("is_new", lit(false))
        .union(batch.withColumn("is_new", lit(true)))
      val want = TextDedup.minhashLshPairsIncremental(
          all, col("is_new"), n, k, bands, thr)
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Double)].collect().toSeq
      val got = BandIndex.probe(spark, "g_band_idx", batch, n, k, bands, thr)
        .orderBy("doc_a", "doc_b")
        .as[(Long, Long, Double)].collect().toSeq
      assert(got === want)
      // r10: the verify keys come from the STORED key table — the probe
      // plan must scan g_band_idx_keys, and the only text-processing
      // subtrees are the batch's own (corpus text never re-tokenized)
      val probePlan = BandIndex.probe(spark, "g_band_idx", batch, n, k, bands, thr)
        .queryExecution.optimizedPlan.toString()
      assert(probePlan.contains("g_band_idx_keys"), probePlan.take(3000))
      // and it actually finds the planted cross-batch + in-batch dups
      assert(got.map(p => (p._1, p._2)).contains((11L, 12L)))
      assert(got.exists(p => p._2 == 10L && p._1 <= 1L))
      // corpus×corpus pairs never appear (0,1 are near-dups but both old)
      assert(!got.map(p => (p._1, p._2)).contains((0L, 1L)))
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_band_idx")
      spark.sql("DROP TABLE IF EXISTS g_band_idx_keys")
    }
  }

  test("band index append: folded batch probes identically to a from-scratch index") {
    val (n, k, bands, thr) = (3, 8, 4, 0.3)
    val corpusA = (
      mkDocs(Seq(0L, 1L), "the quick brown fox jumps over the lazy dog again and") ++
      Seq((4L, "a singleton document with its own words entirely unlike others"))
    ).toDF("doc_id", "text")
    val batchB = Seq(
      (11L, "fresh pair of documents sharing almost every single token here now"),
      (12L, "completely separate subject matter concerning tidal estuaries and herons"))
      .toDF("doc_id", "text")
    // C holds a near-dup of an APPENDED doc (11) and a near-dup of an
    // original corpus doc (0) — both index generations must answer
    val batchC = (
      Seq((20L, "fresh pair of documents sharing almost every single token here too")) ++
      mkDocs(Seq(21L), "the quick brown fox jumps over the lazy dog again and")
    ).toDF("doc_id", "text")
    try {
      BandIndex.write(corpusA, "g_band_app", n, k, bands, buckets = 4)
      BandIndex.append(spark, "g_band_app", batchB, n, k, bands)
      BandIndex.write(corpusA.unionByName(batchB), "g_band_ref", n, k, bands,
        buckets = 4)
      val got = BandIndex.probe(spark, "g_band_app", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      val want = BandIndex.probe(spark, "g_band_ref", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      assert(got === want, "appended index diverged from from-scratch index")
      // the appended doc participates: (11, 20) must be found
      assert(got.map(p => (p._1, p._2)).contains((11L, 20L)), got.toString)
      // and so does the original corpus: (0 or 1, 21)
      assert(got.exists(p => p._2 == 21L && p._1 <= 1L), got.toString)
      // appending to a non-bucketed table is refused loudly
      spark.range(1).toDF("x").write.saveAsTable("g_band_plain")
      val ex = intercept[IllegalStateException] {
        BandIndex.append(spark, "g_band_plain", batchB, n, k, bands)
      }
      assert(ex.getMessage.contains("not a bucketed band index"))
    } finally {
      Seq("g_band_app", "g_band_app_keys", "g_band_ref", "g_band_ref_keys",
        "g_band_plain").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  // The r11 residual closed: a crash INSIDE append between its two
  // table writes. The write order is keys FIRST / band LAST, so the
  // crashed state is key rows with no band rows — simulated here by
  // running exactly the first half of append by hand.
  test("append killed between the two table writes: replay completes it, recover reconciles, probe equals never-crashed") {
    val (n, k, bands, thr) = (3, 8, 4, 0.3)
    val corpusA = (
      mkDocs(Seq(0L, 1L), "the quick brown fox jumps over the lazy dog again and") ++
      Seq((4L, "a singleton document with its own words entirely unlike others"))
    ).toDF("doc_id", "text")
    val batchB = Seq(
      (11L, "fresh pair of documents sharing almost every single token here now"),
      (12L, "completely separate subject matter concerning tidal estuaries and herons"))
      .toDF("doc_id", "text")
    val batchC = (
      Seq((20L, "fresh pair of documents sharing almost every single token here too")) ++
      mkDocs(Seq(21L), "the quick brown fox jumps over the lazy dog again and")
    ).toDF("doc_id", "text")
    def keysOnlyHalfAppend(table: String): Unit =
      TextDedup.keySetsFromDigests(
          TextDedup.shingleDigests(TextDedup.shingleSets(batchB, n)))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .option("compression", "zstd")
        .bucketBy(4, "doc_id").sortBy("doc_id")
        .saveAsTable(BandIndex.keysTable(table))
    try {
      BandIndex.write(corpusA, "g_band_crash", n, k, bands, buckets = 4)
      BandIndex.write(corpusA.unionByName(batchB), "g_band_cref", n, k, bands,
        buckets = 4)
      keysOnlyHalfAppend("g_band_crash") // ← "crash" between the writes
      // invariant after the crash: band-docs ⊆ keys-docs (the safe
      // direction — strays are invisible, never verify-missed)
      assert(spark.table("g_band_crash")
        .join(spark.table("g_band_crash_keys"), Seq("doc_id"), "left_anti")
        .count() === 0L)
      // the at-least-once replay (batchB re-accepted because the band
      // table lacks it) completes the append...
      BandIndex.append(spark, "g_band_crash", batchB, n, k, bands)
      // ...with NO duplicate key rows from the crashed first half
      assert(spark.table("g_band_crash_keys")
        .groupBy($"doc_id").count().filter($"count" > 1).count() === 0L)
      // and the probe output equals a never-crashed index
      val got = BandIndex.probe(spark, "g_band_crash", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      val want = BandIndex.probe(spark, "g_band_cref", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      assert(got === want, "crashed+replayed index diverged from never-crashed")
      // a further replay of the SAME batch is a pure no-op (band
      // anti-join) — row counts in both tables unchanged
      val (nb, nk) = (spark.table("g_band_crash").count(),
        spark.table("g_band_crash_keys").count())
      BandIndex.append(spark, "g_band_crash", batchB, n, k, bands)
      assert(spark.table("g_band_crash").count() === nb)
      assert(spark.table("g_band_crash_keys").count() === nk)

      // recover: the NON-replay path (the batch is gone for good) —
      // set-diff reconciliation drops the stray keys and the index
      // equals one that never saw the batch
      BandIndex.write(corpusA, "g_band_rec", n, k, bands, buckets = 4)
      keysOnlyHalfAppend("g_band_rec")
      assert(BandIndex.recover(spark, "g_band_rec") === 2L)
      assert(BandIndex.recover(spark, "g_band_rec") === 0L) // idempotent
      assert(spark.table("g_band_rec_keys").select($"doc_id")
        .except(spark.table("g_band_rec").select($"doc_id")).count() === 0L)
      val gotRec = BandIndex.probe(spark, "g_band_rec", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      BandIndex.write(corpusA, "g_band_rref", n, k, bands, buckets = 4)
      val wantRec = BandIndex.probe(spark, "g_band_rref", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      assert(gotRec === wantRec,
        "recovered index diverged from one that never saw the batch")
    } finally {
      Seq("g_band_crash", "g_band_crash_keys", "g_band_cref",
        "g_band_cref_keys", "g_band_rec", "g_band_rec_keys",
        "g_band_rec_keys__new", "g_band_rec_keys__old",
        "g_band_rref", "g_band_rref_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("recover killed mid-swap: entry repair rolls the keys table forward; probe/append/recover all self-heal") {
    val (n, k, bands, thr) = (3, 8, 4, 0.3)
    val corpusA = (
      mkDocs(Seq(0L, 1L), "the quick brown fox jumps over the lazy dog again and") ++
      Seq((4L, "a singleton document with its own words entirely unlike others"))
    ).toDF("doc_id", "text")
    val batchC = Seq(
      (21L, "the quick brown fox jumps over the lazy dog again and padding"))
      .toDF("doc_id", "text")
    val keysT = "g_band_swap_keys"
    // the mid-swap crash state recover() can leave (between its two
    // RENAMEs): live keys table ABSENT, a complete __new rewrite and
    // the renamed-away __old both present
    def simulateMidSwap(): Unit = {
      spark.table(keysT).write
        .option("compression", "zstd")
        .bucketBy(4, "doc_id").sortBy("doc_id")
        .saveAsTable(keysT + "__new")
      spark.sql(s"ALTER TABLE $keysT RENAME TO ${keysT}__old")
    }
    try {
      BandIndex.write(corpusA, "g_band_swap", n, k, bands, buckets = 4)
      BandIndex.write(corpusA, "g_band_sref", n, k, bands, buckets = 4)
      val want = BandIndex.probe(spark, "g_band_sref", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq

      // probe self-heals the mid-swap state (it runs FIRST in the
      // ingest loop's screen stage) and equals a never-crashed index
      simulateMidSwap()
      val got = BandIndex.probe(spark, "g_band_swap", batchC, n, k, bands, thr)
        .orderBy("doc_a", "doc_b").as[(Long, Long, Double)].collect().toSeq
      assert(got === want, "repaired index diverged from never-crashed")
      assert(spark.catalog.tableExists(keysT))
      assert(!spark.catalog.tableExists(keysT + "__new"))
      assert(!spark.catalog.tableExists(keysT + "__old"))

      // append self-heals it too (a crash could land between probe
      // and append of the same batch)
      simulateMidSwap()
      BandIndex.append(spark, "g_band_swap", batchC, n, k, bands)
      assert(spark.catalog.tableExists(keysT))
      assert(!spark.catalog.tableExists(keysT + "__old"))
      assert(spark.table(keysT).filter($"doc_id" === 21L).count() > 0L)

      // final-drop crash state (swap committed, __old straggler):
      // recover finishes the drop and reads the committed table
      spark.table(keysT).write
        .option("compression", "zstd")
        .bucketBy(4, "doc_id").sortBy("doc_id")
        .saveAsTable(keysT + "__old")
      assert(BandIndex.recover(spark, "g_band_swap") === 0L)
      assert(!spark.catalog.tableExists(keysT + "__old"))
    } finally {
      Seq("g_band_swap", "g_band_swap_keys", "g_band_swap_keys__new",
        "g_band_swap_keys__old", "g_band_sref", "g_band_sref_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("pairsAll from the stored index equals the from-scratch chain at minAgree=0; tombstoned docs pair with nothing") {
    val corpus = (
      mkDocs(Seq(0L, 1L), "the quick brown fox jumps over the lazy dog again and") ++
      mkDocs(Seq(2L, 3L, 4L), "completely different content about spark catalyst plans") ++
      Seq((5L, "a singleton document with its own words entirely unlike others"))
    ).toDF("doc_id", "text")
    val (n, k, bands, thr) = (3, 8, 4, 0.3)
    try {
      BandIndex.write(corpus, "g_band_all", n, k, bands, buckets = 4)
      // bkt_n (the r19 star-edge weight column) is null on every edge
      // of a healthy corpus — assert it, then drop it for the chain
      // differential (the chain has no such column)
      val gotFull = BandIndex.pairsAll(spark, "g_band_all", thr).collect()
      assert(gotFull.forall(_.isNullAt(3)),
        "below the cap every bkt_n must be null")
      val got = BandIndex.pairsAll(spark, "g_band_all", thr)
        .select($"doc_a", $"doc_b", $"jaccard")
        .as[(Long, Long, Double)].collect().sorted.toSeq
      val ref = TextDedup.minhashLshPairs(corpus, n, k, bands, thr,
          minAgree = 0)
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(got === ref, s"got $got vs chain $ref")
      assert(got.nonEmpty, "fixture must produce pairs")
      // tombstone doc 3: every pair mentioning it vanishes, the rest
      // survive untouched
      BandIndex.addTombstones(spark, "g_band_all", Seq(3L).toDF("doc_id"))
      val after = BandIndex.pairsAll(spark, "g_band_all", thr)
        .select($"doc_a", $"doc_b", $"jaccard")
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(after === ref.filterNot(p => p._1 == 3L || p._2 == 3L))
      assert(after.nonEmpty)
    } finally {
      Seq("g_band_all", "g_band_all_keys", "g_band_all_tombstones")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("pairsAll hot-bucket cap: star fan-out on a planted degenerate bucket, exact all-pairs elsewhere") {
    // 120 IDENTICAL docs — every (band, key) bucket they land in holds
    // all 120 (the web-boilerplate skew the cap exists for) — plus one
    // ordinary small near-dup bucket that must keep exact semantics
    val flood = (0L until 120L)
      .map(i => (i, "the same boilerplate sentence repeated across the whole crawl"))
    val corpus = (flood ++
      mkDocs(Seq(200L, 201L), "completely different content about spark catalyst plans")
    ).toDF("doc_id", "text")
    val (n, k, bands, thr) = (3, 8, 4, 0.3)
    try {
      BandIndex.write(corpus, "g_band_cap", n, k, bands, buckets = 4)
      // census: the flood bucket is visible, sized, and representative'd
      val sat = BandIndex.saturatedBuckets(spark, "g_band_cap", 50)
        .select($"bkt_n", $"rep").distinct().as[(Long, Long)].collect().toSeq
      assert(sat.nonEmpty && sat.forall(_ == (120L, 0L)),
        s"expected every saturated bucket at (120, rep=0), got $sat")

      val cappedFull = BandIndex
        .pairsAll(spark, "g_band_cap", thr, bucketCap = 50)
        .select($"doc_a", $"doc_b", $"jaccard", $"bkt_n")
        .as[(Long, Long, Double, Option[Long])].collect().sorted.toSeq
      val capped = cappedFull.map(p => (p._1, p._2, p._3))
      // the saturated bucket emits a STAR on its min-id representative:
      // 119 verified edges (jaccard 1.0 — identical docs), NOT 7140
      val floodEdges = capped.filter(_._2 < 200L)
      assert(floodEdges.size === 119, s"star fan-out, got ${floodEdges.size}")
      assert(floodEdges.forall(p => p._1 == 0L && p._3 == 1.0),
        "every flood edge anchors at the representative")
      // the small bucket below the cap keeps exact all-pairs output
      assert(capped.exists(p => p._1 == 200L && p._2 == 201L),
        "small-bucket pair must survive the cap untouched")
      // r19 (VERDICT r18 #1): star edges carry their bucket size so a
      // rate rollup can reweight; all-pairs edges carry null
      assert(cappedFull.filter(_._2 < 200L).forall(_._4.contains(120L)),
        "every star edge must carry bkt_n = 120")
      assert(cappedFull.filter(_._1 >= 200L).forall(_._4.isEmpty),
        "small-bucket edges must carry a null bkt_n")

      // above the cap the output is bit-identical to the uncapped form
      val uncapped = BandIndex.pairsAll(spark, "g_band_cap", thr, bucketCap = 4096)
        .select($"doc_a", $"doc_b", $"jaccard")
        .as[(Long, Long, Double)].collect().sorted.toSeq
      assert(uncapped.count(_._2 < 200L) === 120 * 119 / 2,
        "uncapped flood bucket is the full quadratic pair set")
      assert(uncapped.exists(p => p._1 == 200L && p._2 == 201L))

      // the q99 reweight (bkt_n/2 per star edge, 1 per plain edge)
      // recovers the uncapped TOTAL pair mass exactly on a fully-
      // verifying bucket: 119 × 120/2 = C(120,2) — the saturated
      // regime reports mass, not the star's edge count (source
      // ATTRIBUTION is approximated to the rep's source; the total is
      // exact, per the pairsAll scaladoc)
      val reweighted = cappedFull
        .map(p => p._4.map(_.toDouble / 2.0).getOrElse(1.0)).sum
      assert(reweighted.toLong === uncapped.size.toLong,
        s"reweighted mass $reweighted must equal uncapped ${uncapped.size}")

      // plan pin: the cap machinery (census agg + broadcast anti-join
      // + star join) must not cost the self-join its zero-exchange
      // property — the band table is bucketed on (band, key) and NO
      // (band, key) hash exchange may appear anywhere in the plan
      // (broadcast exchanges for the hot census are expected and fine)
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = BandIndex.pairsAll(spark, "g_band_cap", thr, bucketCap = 50)
          .queryExecution.executedPlan.toString()
        assert(plan.contains("Bucketed: true"), plan.take(3000))
        assert("Exchange hashpartitioning\\(band".r.findAllIn(plan).isEmpty,
          s"capped pairsAll must stay exchange-free on (band,key):\n${plan.take(3000)}")
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    } finally {
      Seq("g_band_cap", "g_band_cap_keys", "g_band_cap_tombstones")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
