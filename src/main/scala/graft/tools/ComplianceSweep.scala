package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Growth sweep for the r18/r19 compliance + cap paths (SCALING.md —
  * VERDICT r18 #5): the three code paths that landed without
  * 1×/10×/30× rows.
  *
  *  - `pairs_capped` vs `pairs_uncapped`: [[graft.ml.BandIndex.pairsAll]]
  *    over the ScaleGen corpus PLUS a planted flood of identical docs
  *    sized at corpus/500 (the web-boilerplate skew the hot-bucket cap
  *    exists for — the flood bucket holds the whole flood in every
  *    band). Uncapped emits C(flood, 2) candidates per band and goes
  *    quadratic with scale; capped (bucketCap = 64) emits flood−1
  *    star edges and must stay near the healthy-corpus cost.
  *    `saturated_buckets` records the census the cap decided from.
  *  - `forget_hinted` vs `forget_scan`:
  *    [[graft.store.Maintenance.forgetRows]] draining 10 ids from ONE
  *    source partition of a Hive-partitioned store built from the
  *    same corpus — hinted requests name the partition and skip the
  *    detection scan (cost ≈ the one-partition rewrite, flat-ish with
  *    corpus), hint-less requests pay the column-pruned whole-store
  *    detection semi-join (grows with corpus). `forget_audited` adds
  *    the r19 sampled hint audit (an id-column store pass — the
  *    opt-in trust check) on a third id set.
  *  - `forget_six_legs`: the composed [[graft.ml.CorpusPipeline.forget]]
  *    with all six index legs attached — six tombstone adds as
  *    concurrent driver-future Spark jobs (r18). The adds write
  *    request-feed-sized sets, so the wall must stay FLAT with corpus
  *    scale (job floors, not data) — the sweep row is the evidence.
  *
  * Usage: runMain graft.tools.ComplianceSweep <sfDir> <label>
  * (sfDir = a driver testdata dir or a ScaleGen output dir). Prints
  * one JSON line; timed segments follow IndexSweep's time/min2
  * discipline.
  */
object ComplianceSweep {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def min2(f: => Unit): Double = math.min(time(f), time(f))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val label = if (args.length > 1) args(1) else "x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ml.{BandIndex, CorpusPipeline, FuzzyJoin, IvfIndex,
      LexIndex, NgramIndex, SigIndex, TextDedup}

    val docsFull = graft.Tables.t(spark, sfDir, "documents")
    val docs = docsFull.select(col("doc_id"), col("text"))
    val nDocs = docs.count() // warmup: scan + codegen

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    def fresh(table: String): String = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(wh, true)
      table
    }
    val r = collection.mutable.LinkedHashMap[String, Double]()

    // --- hot-bucket cap: corpus + planted identical-doc flood ---
    val nFlood = math.max(100L, nDocs / 50L)
    r("flood_docs") = nFlood.toDouble
    val flood = spark.range(nFlood).select(
      (col("id") + 10000000L).as("doc_id"),
      lit("the same boilerplate sentence repeated across the whole crawl")
        .as("text"))
    val corpus = docs.unionByName(flood)
    val capT = fresh(s"sweep_cap_band_$label")
    fresh(BandIndex.keysTable(capT)); fresh(capT + "_tombstones")
    r("band_write_flood") = time(
      BandIndex.write(corpus, capT, n = 3, k = 12, bands = 4, buckets = 16))
    r("saturated_buckets") =
      BandIndex.saturatedBuckets(spark, capT, 64).count().toDouble
    r("pairs_capped") = min2(
      BandIndex.pairsAll(spark, capT, threshold = 0.3, bucketCap = 64)
        .count())
    // once, not min2 — the quadratic side is the one being indicted
    r("pairs_uncapped") = time(
      BandIndex.pairsAll(spark, capT, threshold = 0.3,
        bucketCap = Int.MaxValue).count())

    // --- forget drain: hinted vs detection scan vs audited ---
    val storeDir = tmp("sweep_forget_store") + "/corpus"
    docsFull.select(col("doc_id"), col("text"), col("source"))
      .write.mode("overwrite").partitionBy("source").parquet(storeDir)
    // three disjoint 10-id request sets from one partition each, so
    // every drain's REWRITE half is one-partition-sized and the
    // measured difference is the detection half
    def reqIds(src: Long) = docs
      .filter(col("doc_id") % 20 === src).select(col("doc_id"))
      .orderBy(col("doc_id")).limit(10)
    // untimed warmup drain (matches nothing): pays the first-call
    // recovery listing + parquet reader/writer warmup so the timed
    // drains measure steady-state, not JVM cold-start (the IngestProbe
    // discipline)
    graft.store.Maintenance.forgetRows(spark, storeDir, "source",
      spark.range(1).select((col("id") - 10L).as("doc_id")), "doc_id")
    val hintedReqs = reqIds(3L).withColumn("part", lit("src3"))
    r("forget_hinted") = time(
      graft.store.Maintenance.forgetRows(spark, storeDir, "source",
        hintedReqs, "doc_id", partitionHintCol = Some("part")))
    r("forget_scan") = time(
      graft.store.Maintenance.forgetRows(spark, storeDir, "source",
        reqIds(5L), "doc_id"))
    val auditReqs = reqIds(7L).withColumn("part", lit("src7"))
    r("forget_audited") = time(
      graft.store.Maintenance.forgetRows(spark, storeDir, "source",
        auditReqs, "doc_id", partitionHintCol = Some("part"),
        auditHintedSample = 10))

    // --- composed six-leg forget (concurrent tombstone adds) ---
    val keyFn: DataFrame => DataFrame = d => d.select(col("doc_id"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("s"))
    val sigFn: DataFrame => DataFrame = d =>
      TextDedup.simhashSignatures(d)
        .select(col("doc_id").as("id"), col("simhash").as("sig"))
    val embs = graft.Tables.t(spark, sfDir, "embeddings")
    val lexDir = tmp("sweep_forget_lex")
    val ngDir = tmp("sweep_forget_ng")
    val ivfT = fresh(s"sweep_forget_ivf_$label")
    fresh(s"sweep_forget_ivf_${label}_centroids")
    fresh(s"sweep_forget_ivf_${label}_stats")
    val sigT = fresh(s"sweep_forget_sig_$label")
    val fzT = fresh(s"sweep_forget_fz_$label")
    Seq(ivfT, sigT, fzT).foreach(t => fresh(t + "_tombstones"))
    LexIndex.build(docs, lexDir)
    IvfIndex.write(embs, ivfT, cells = 16, iters = 0, buckets = 8)
    SigIndex.write(sigFn(docs), "id", "sig", sigT, bands = 8, buckets = 8)
    NgramIndex.build(docs, ngDir, n = 4, dfMax = 64)
    FuzzyJoin.FuzzyIndex.write(keyFn(docs), fzT, "doc_id", "s", col("blk"))
    val maint = CorpusPipeline.IndexMaintenance(capT,
      n = 3, k = 12, bands = 4, threshold = 0.3,
      lexIndexDir = Some(lexDir), ivfTable = Some(ivfT),
      sigIndex = Some(CorpusPipeline.SigMaintenance(sigT, sigFn,
        maxDist = 2, bands = 8)),
      ngramIndex = Some(CorpusPipeline.NgramMaintenance(ngDir,
        threshold = 0.6, dfCap = 50)),
      fuzzyIndex = Some(CorpusPipeline.FuzzyMaintenance(fzT, keyFn,
        maxDist = 8)))
    val takedown = reqIds(9L).localCheckpoint(true)
    r("forget_six_legs") = time(CorpusPipeline.forget(spark, maint, takedown))
    // replay (sets already contain the ids): the idempotent floor
    r("forget_six_legs_replay") =
      time(CorpusPipeline.forget(spark, maint, takedown))

    // --- concurrent screen slot under DATA VOLUME (r19): the Bench
    // toy loop measures 8-doc job floors; this drives a 10%-of-corpus
    // batch through the full five-leg screen against the
    // corpus-scale indexes built above. Every batch doc is already
    // indexed, so the near-dup screen drops all of it (self-dup
    // jaccard 1.0) and the maintenance slot is skipped — what's
    // measured is exactly the five probe legs' overlap at volume:
    // screen_wall vs screen_legsum is the concurrency evidence at
    // each scale. ---
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val evalIdx = graft.ml.Decontaminate.indexEval(
        docs.filter(col("doc_id") === 0L), n = 3, expectedGrams = 100)
      val walls = collection.mutable.ArrayBuffer[Double]()
      val sums = collection.mutable.ArrayBuffer[Double]()
      val input = MemoryStream[(Long, String)]
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.0, maint,
        evalIdx, evalN = 3,
        onMaintain = (_, st) => walls.synchronized {
          if (st.stage.startsWith("screenSlot")) walls += st.secs; ()
        }) { (_, _, stats) =>
        sums.synchronized {
          sums += stats.filter(_.stage.endsWith("Screen")).map(_.secs).sum
          ()
        }
      }
      try {
        // warmup batch (parser/JIT — the IngestProbe discipline)
        input.addData(docs.filter(col("doc_id") % 100 === 42)
          .limit(200).as[(Long, String)].collect().toSeq: _*)
        q.processAllAvailable()
        val big = docs.filter(col("doc_id") % 10 === 1)
          .as[(Long, String)].collect().toSeq
        r("screen_batch_docs") = big.size.toDouble
        input.addData(big: _*)
        q.processAllAvailable()
      } finally q.stop()
      evalIdx.grams.unpersist()
      r("screen_wall_10pct") = walls.lastOption.getOrElse(-1.0)
      r("screen_legsum_10pct") =
        sums.lastOption.map(v => math.rint(v * 1e4) / 1e4).getOrElse(-1.0)
    }

    val parts = r.map { case (k, v) =>
      s""""$k":${math.rint(v * 1e4) / 1e4}""" }.mkString(",")
    println(s"""{"sf":"$sfDir","label":"$label","docs":$nDocs,$parts}""")
    spark.stop()
  }
}
