package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ml.LexIndex

/** Specs for the persistent inverted lexical index (ml/LexIndex):
  * content differential vs a from-scratch computation, fingerprint
  * staleness, and the probe's single-shuffle plan shape. */
class LexIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(): Seq[(Long, String)] = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the log"),
    (2L, "a cat and a dog"),
    (3L, "logs and mats and cats"),
    (4L, "completely unrelated words here"),
    (5L, "the the the cat cat mat"))

  test("postings match a from-scratch tf/dl/df computation") {
    val dir = Files.createTempDirectory("lexidx").toString
    val docs = corpus().toDF("doc_id", "text")
    LexIndex.build(docs, dir)
    val got = spark.read.parquet(s"$dir/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // reference computation, in memory
    val toks = corpus().map { case (id, t) => (id, t.split(" ").toSeq) }
    val tf = toks.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, id, g.size.toLong, ts.size.toLong) }
    }
    val df = tf.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = tf.map { case (t, id, f, dl) => (t, id, f, dl, df(t)) }.toSet
    assert(got === want)
    val st = spark.read.parquet(s"$dir/stats").head()
    assert(st.getAs[Long]("n_docs") === 6L)
    assert(math.abs(st.getAs[Double]("avgdl") -
      toks.map(_._2.size).sum / 6.0) < 1e-12)
  }

  test("appendBatch equals a from-scratch build: postings, stats, probe output") {
    val incDir = Files.createTempDirectory("lexinc").toString
    val allDir = Files.createTempDirectory("lexall").toString
    val (seed, batch) = corpus().splitAt(4)
    // incremental: build on the seed, fold in the batch (batch doc_ids
    // disjoint — the appendBatch contract); only the batch tokenizes
    LexIndex.build(seed.toDF("doc_id", "text"), incDir)
    LexIndex.appendBatch(spark, incDir, batch.toDF("doc_id", "text"))
    // reference: one build over everything
    LexIndex.build(corpus().toDF("doc_id", "text"), allDir)
    def postings(d: String) = spark.read.parquet(s"$d/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(postings(incDir) === postings(allDir))
    val (si, sa) = (spark.read.parquet(s"$incDir/stats").head(),
      spark.read.parquet(s"$allDir/stats").head())
    // exact equality, not tolerance: stats are integer-merged and the
    // one double division is over identical exact longs
    assert(si.getAs[Long]("n_docs") === sa.getAs[Long]("n_docs"))
    assert(si.getAs[Long]("sum_dl") === sa.getAs[Long]("sum_dl"))
    assert(si.getAs[Double]("avgdl") === sa.getAs[Double]("avgdl"))
    // probe through both indexes: identical scores (cache invalidation
    // on append is exercised implicitly — stale stats would skew idf)
    def top(d: String) = LexIndex.probeIndexed(spark, d, col("doc_id") < 2, k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(top(incDir) === top(allDir))
    // empty batch is a no-op, not a corrupting swap
    val m = Files.getLastModifiedTime(java.nio.file.Paths.get(incDir, "postings"))
    LexIndex.appendBatch(spark, incDir,
      Seq.empty[(Long, String)].toDF("doc_id", "text"))
    assert(Files.getLastModifiedTime(
      java.nio.file.Paths.get(incDir, "postings")) === m)
    // r11: at-least-once REPLAY of an already-appended batch is a
    // no-op (same postings, same stats — not double-counted), and a
    // mixed batch folds in only its genuinely-new docs
    LexIndex.appendBatch(spark, incDir, batch.toDF("doc_id", "text"))
    assert(postings(incDir) === postings(allDir))
    assert(spark.read.parquet(s"$incDir/stats").head().getAs[Long]("n_docs")
      === sa.getAs[Long]("n_docs"))
    val extra = Seq((90L, "a brand new replay document"))
    LexIndex.appendBatch(spark, incDir,
      (batch ++ extra).toDF("doc_id", "text"))
    assert(spark.read.parquet(s"$incDir/stats").head().getAs[Long]("n_docs")
      === sa.getAs[Long]("n_docs") + 1)
    assert(spark.read.parquet(s"$incDir/postings")
      .filter(col("doc_id") === 90L).count() > 0)
  }

  test("probeText (ad-hoc query strings) equals probe over the same term sets") {
    val dir = Files.createTempDirectory("lexadhoc").toString
    LexIndex.build(corpus().toDF("doc_id", "text"), dir)
    val texts = Seq((100L, "cat mat"), (101L, "dog log dog"),
      (102L, "nosuchword cat"))
    val got = LexIndex.probeText(spark, dir, texts, k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    val qdf = texts.flatMap { case (id, t) =>
      t.split(" ").distinct.toSeq.map(w => (id, w)) }.toDF("query_id", "term")
    val want = LexIndex.probe(spark, dir, qdf, k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("probe scores equal the index-less BM25 form; one shuffle; ensure is stale-aware") {
    // a corpus dir shaped like the driver's (documents.parquet)
    val sfDir = Files.createTempDirectory("lexsf").toString
    corpus().toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet("file:" + sfDir + "/documents.parquet")
    def docs = spark.read.parquet(sfDir + "/documents.parquet")
    val idx = LexIndex.ensure(spark, sfDir, docs)
    // second ensure is a no-op (fingerprint unchanged): postings mtime stable
    val postingsPath = java.nio.file.Paths.get(idx, "postings")
    val m1 = Files.getLastModifiedTime(postingsPath)
    assert(LexIndex.ensure(spark, sfDir, docs) === idx)
    assert(Files.getLastModifiedTime(postingsPath) === m1)

    val queries = LexIndex.queryTermsFromIndex(spark, idx, col("doc_id") < 2)
    val got = LexIndex.probe(spark, idx, queries, k = 3)
    // index-less reference: q83's exact pipeline on the same frame
    val tfq = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("term"))))
    val qt = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("query_id"),
        explode(split(col("text"), " ")).as("term")).distinct()
    val stats = docs
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("score"), 6).desc, col("doc_id"))
    val want = tfq.join(broadcast(qt), Seq("term")).crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c", col("idf") * col("tf") * 2.2 /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        round(col("score"), 4).as("score"))
    assert(got.orderBy("query_id", "rnk").collect().toSeq ===
      want.orderBy("query_id", "rnk").collect().toSeq)

    // plan shape: the probe's distributed part carries exactly ONE
    // exchange — hash(query_id) feeding both the aggregation and the
    // ranking window (the scan side joins a broadcast local relation)
    got.collect()
    // AQE's toString prints final + initial sections and query-stage
    // labels — count real shuffle exchanges in the FINAL plan only
    val plan = got.queryExecution.executedPlan.toString()
    val finalPlan = plan.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size === 1,
      finalPlan.take(3000))
    assert(!finalPlan.contains("Exchange rangepartitioning"), finalPlan.take(3000))
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan.take(3000))
    // the query-vocabulary IN filter reaches the parquet scan
    assert(finalPlan.contains("PushedFilters: [In(term"), finalPlan.take(3000))

    // corpus drift: touch the parquet file -> fingerprint changes ->
    // ensure rebuilds (observable via postings mtime)
    val pq = java.nio.file.Paths.get(sfDir, "documents.parquet")
    Files.setLastModifiedTime(pq,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() + 5000))
    LexIndex.ensure(spark, sfDir, docs)
    assert(Files.getLastModifiedTime(postingsPath) !== m1)
  }

  test("two-shuffle probe shape: same output, k-bounded second exchange") {
    // r11: a large matched-volume estimate switches the probe from
    // the single hash(query_id) shuffle (parallelism = |queries|) to
    // the natural hash(query_id, doc_id) aggregation exchange plus a
    // k-bounded window exchange. Forced here via the test-adjustable
    // cutover; output must be identical to the single-shuffle form.
    val dir = Files.createTempDirectory("lexidx2s").toString
    LexIndex.build(corpus().toDF("doc_id", "text"), dir)
    val queries = LexIndex.queryTermsFromIndex(spark, dir, col("doc_id") < 2)
    val single = LexIndex.probe(spark, dir, queries, k = 3)
      .orderBy("query_id", "rnk").collect().toSeq
    val saved = LexIndex.TwoShuffleAbove
    try {
      LexIndex.TwoShuffleAbove = 1L
      val got = LexIndex.probe(spark, dir, queries, k = 3)
      assert(got.orderBy("query_id", "rnk").collect().toSeq === single)
      got.collect()
      val finalPlan = got.queryExecution.executedPlan.toString()
        .split("== Initial Plan ==").head
      // two hash exchanges: the (query,doc) aggregation's and the
      // ranking window's; WindowGroupLimit bounds the second to
      // top-k per partition per query BEFORE the shuffle
      assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size === 2,
        finalPlan.take(3000))
      assert(finalPlan.contains("WindowGroupLimit"), finalPlan.take(3000))
    } finally LexIndex.TwoShuffleAbove = saved
  }

  test("tombstones: deleted docs vanish from every probe immediately (stale stats by contract); compact equals a from-scratch build; resurrection refused; rebuild clears") {
    val dir = Files.createTempDirectory("lexidx_tbs").toString
    val docs = corpus().toDF("doc_id", "text")
    LexIndex.build(docs, dir)
    def probeAll(d: String) = LexIndex.probeText(spark, d,
        Seq((100L, "the cat mat"), (101L, "dog log")), k = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(t => (t._1, t._2))
    val before = probeAll(dir)
    assert(before.exists(_._3 == 5L), "doc 5 retrievable pre-deletion")
    LexIndex.addTombstones(spark, dir, Seq(5L, 2L).toDF("doc_id"))
    val after = probeAll(dir)
    // immediate forget: 5 and 2 gone from results AND no rank gaps
    assert(!after.exists(r => r._3 == 5L || r._3 == 2L))
    after.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted === (1L to rs.size).toSeq, "ranks re-pack") }
    // live docs keep their PRE-deletion scores (stats stale until
    // compact — the Lucene deleted-docs contract)
    val beforeLive = before.filter(r => r._3 != 5L && r._3 != 2L)
      .map(r => (r._1, r._3, r._4)).toSet
    assert(after.map(r => (r._1, r._3, r._4)).toSet === beforeLive)
    // a deleted doc stops being usable as a query
    assert(LexIndex.probeIndexed(spark, dir, col("doc_id") === 5L, k = 3)
      .count() === 0L)
    // tfidf keywords: no deleted doc rows
    assert(LexIndex.tfidfTopK(spark, dir, 2)
      .filter(col("doc_id").isin(5L, 2L)).count() === 0L)
    // resurrection refused pre-compact
    intercept[IllegalArgumentException] {
      LexIndex.appendBatch(spark, dir,
        Seq((5L, "new text")).toDF("doc_id", "text"))
    }
    // compact == from-scratch build on the remaining docs: postings,
    // stats AND probe output (scores now use remaining-corpus stats)
    LexIndex.compactTombstones(spark, dir)
    val fresh = Files.createTempDirectory("lexidx_fresh").toString
    LexIndex.build(docs.filter(!col("doc_id").isin(5L, 2L)), fresh)
    def postingsSet(d: String) = spark.read.parquet(s"$d/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(postingsSet(dir) === postingsSet(fresh))
    assert(spark.read.parquet(s"$dir/stats").head().toSeq ===
      spark.read.parquet(s"$fresh/stats").head().toSeq)
    assert(probeAll(dir) === probeAll(fresh))
    // post-compact the id re-appends cleanly
    LexIndex.appendBatch(spark, dir, Seq((5L, "the cat is back")).toDF("doc_id", "text"))
    assert(probeAll(dir).exists(_._3 == 5L))
    // a full rebuild clears any tombstones
    LexIndex.addTombstones(spark, dir, Seq(0L).toDF("doc_id"))
    LexIndex.build(docs, dir)
    assert(probeAll(dir).exists(_._3 == 0L))
  }
}
