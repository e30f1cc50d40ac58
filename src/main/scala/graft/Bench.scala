package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line (driver contract).
  * Queries run in name order after a warmup action so JVM/codegen
  * startup lands on the warmup, not the first measured query.
  *
  * Optional args(0) = query-name regex (substring match) for fast
  * local iteration on one query family; the driver invokes with no
  * args and gets the full suite. Machine-load context (loadavg +
  * runnable-process count from /proc/loadavg, before and after) is
  * recorded in the JSON so a measurement taken on a loaded shared
  * machine is self-identifying (BENCH_r03's 60% inflation vs the
  * same-code idle re-run prompted this). */
object Bench {

  /** Deliberate baseline queries — correctness-gated like everything
    * else, excluded from the default bench suite (see the filter in
    * main): the two all-pairs quality yardsticks (q35/q36, shipping
    * paths q53 and q37/q54); since r9 the from-scratch BM25 q83 —
    * its shipping path is the stored LexIndex (q102 indexed probe /
    * q107 ad-hoc text probe); and since r14 the from-scratch n-gram
    * pair forms q31/q101 — their shipping paths are the stored
    * NgramIndex probes (q125 Jaccard / q126 incremental containment,
    * AbBench-interleaved wins at sf0.1 AND sf1) plus q82, the
    * from-scratch TF-IDF whose shipping path is the stored-LexIndex
    * q106 (one postings scan + one window exchange vs re-tokenize +
    * df agg per call — 1.84 s / 3.7× at sf1 purely from the
    * re-derivation q106 amortized away in r8). A headline that
    * re-tokenizes the whole corpus per query misstates the engine the
    * same way an all-pairs join does. r15 adds q133, the
    * prefix-filtered third plan for q31's semantics: a from-scratch
    * form like q31 itself (its value is the threshold-adaptive
    * candidate cut at HIGH thresholds — AbBench territory — not the
    * t=0.3 headline, whose shipping path stays the stored-index
    * q125). r16 adds q135, the corpus-wide LSH recall monitor: its
    * shipping path is the sample-bounded q136 (exact side
    * sample×corpus via the flagged-postings incremental expansion);
    * the exhaustive form stays as the small-scale truth gate. r16
    * also demotes q97, the from-scratch full-corpus containment —
    * its shipping path is the stored-index q146 (pairsContainment
    * over the stored lists, zero text processing; same oracle). r17
    * demotes q136 itself (VERDICT r16 #3): at 2.7 s it was the
    * heaviest headline entry, and it is a monitoring-CADENCE tool —
    * the same argument that demoted q135/q35/q36/q83. Its recall
    * contract stays gated at two scale points by parity (q136 still
    * verifies every round) and by TextDedup's specs; the headline's
    * recall monitors remain the cheap per-batch forms (q116 ANN,
    * q137 fuzzy blocking). All ten still run under
    * SPARK_GRAFT_BASELINES=1 or an explicit name filter, and still
    * parity-verify every round. */
  val baselineQueries: Set[String] =
    Set("q35_embedding_neardup", "q36_ann_brute", "q83_bm25_search",
      "q31_ngram_jaccard", "q101_containment_incremental",
      "q82_tfidf_keywords", "q133_ngram_jaccard_prefix",
      "q135_lsh_recall", "q97_containment_pairs",
      "q136_lsh_recall_sampled")

  /** Composed per-batch ingest-loop latency (r16 — the VERDICT r15 #5
    * gate): one REAL [[graft.ml.CorpusPipeline.ingestAndMaintain]]
    * run with every stored-index leg attached — the band, sig, ngram
    * and fuzzy PROBE screens plus the lex/ivf/band/sig/ngram/fuzzy
    * appends and compaction checks in the maintenance slot — over a
    * deliberately SMALL seeded corpus, so the number measures the
    * composed per-batch FLOORS (job latency, probe fixed work,
    * dir-listing taxes the frame caches don't cover), not data
    * volume. Three 8-doc micro-batches: batch 0 is the untimed warmup
    * (the IngestProbe parser/JIT discipline), the metric is the min
    * over batches 1-2 of screen-stage secs + maintenance-slot secs —
    * the loop's own StageStat clocks, so what's timed is exactly what
    * ships. Healthy band on this machine: see CLAUDE.md. -1 = not
    * measured (filtered run) or failed (the metric must never kill
    * the bench). */
  private def benchIngestScreen(spark: SparkSession, sfDir: String): Double =
    try {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.ml._
      val docsAll = Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = docsAll.filter(col("doc_id") < 100)
      val embs = Tables.t(spark, sfDir, "embeddings")
      val keyFn: DataFrame => DataFrame = d => d.select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("s"))
      val sigFn: DataFrame => DataFrame = d =>
        TextDedup.simhashSignatures(d)
          .select(col("doc_id").as("id"), col("simhash").as("sig"))
      val embedFn: DataFrame => DataFrame = d =>
        embs.join(d.select(col("doc_id").as("vec_id")), Seq("vec_id"))
      val lexDir = java.nio.file.Files.createTempDirectory("g_bench_lex").toString
      val ngDir = java.nio.file.Files.createTempDirectory("g_bench_ng").toString
      Seq("g_bench_band", "g_bench_band_keys", "g_bench_ivf",
        "g_bench_ivf_centroids", "g_bench_ivf_stats", "g_bench_sig",
        "g_bench_fuzzy")
        .flatMap(t => Seq(t, t + "_tombstones")) // drain leg leftovers
        .foreach(t => graft.store.Bucketing.dropWithDir(spark, t))
      BandIndex.write(corpus, "g_bench_band", n = 3, k = 12, bands = 4,
        buckets = 4)
      LexIndex.build(corpus, lexDir)
      IvfIndex.write(embedFn(corpus), "g_bench_ivf", cells = 8, iters = 0,
        buckets = 4)
      SigIndex.write(sigFn(corpus), "id", "sig", "g_bench_sig", bands = 8,
        buckets = 4)
      NgramIndex.build(corpus, ngDir, n = 4, dfMax = 64)
      FuzzyJoin.FuzzyIndex.write(keyFn(corpus), "g_bench_fuzzy", "doc_id",
        "s", col("blk"))
      val evalIdx = Decontaminate.indexEval(
        docsAll.filter(col("doc_id") === 0L), n = 3, expectedGrams = 1000)
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[(Long, String)]
      val screenSecs = scala.collection.mutable.Map[Long, Double]()
      val screenWall = scala.collection.mutable.Map[Long, Double]()
      val maintSecs = scala.collection.mutable.Map[Long, Double]()
      val forgetSecs = scala.collection.mutable.Map[Long, Double]()
      val stageDetail = scala.collection.mutable.Map[Long, String]()
      val batches = docsAll.filter(col("doc_id") >= 100 && col("doc_id") < 124)
        .as[(Long, String)].collect().sortBy(_._1)
      // compliance leg (r18 — VERDICT r17 #6): a takedown request feed
      // drains every batch, so the drain's per-batch floor (hw
      // read/write + six tombstone adds + durable bar + backlog count)
      // is measured and attributed like the other legs
      val reqLog = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      val forgetState = java.nio.file.Files
        .createTempDirectory("g_bench_fstate").toString
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.0,
        CorpusPipeline.IndexMaintenance("g_bench_band", n = 3, k = 12,
          bands = 4, threshold = 0.3,
          lexIndexDir = Some(lexDir), ivfTable = Some("g_bench_ivf"),
          embed = embedFn, compactAtFilesPerBucket = 1000.0,
          sigIndex = Some(CorpusPipeline.SigMaintenance("g_bench_sig",
            sigFn, maxDist = 2, bands = 8)),
          ngramIndex = Some(CorpusPipeline.NgramMaintenance(ngDir,
            threshold = 0.6, dfCap = 50)),
          fuzzyIndex = Some(CorpusPipeline.FuzzyMaintenance("g_bench_fuzzy",
            keyFn, maxDist = 8)),
          forgetFeed = Some(CorpusPipeline.ForgetCadence(
            requests = s => reqLog.synchronized {
              reqLog.toSeq.toDF("req_id", "doc_id") },
            stateDir = forgetState))),
        evalIdx, evalN = 3,
        onMaintain = (bid, st) =>
          maintSecs.synchronized {
            if (st.stage.startsWith("screenSlot")) {
              // the slot WALL (r19): the per-leg clocks overlap under
              // the concurrent screen legs and sum past it — the
              // metric composes from this, legs are attribution only
              screenWall(bid) = st.secs
            } else if (st.stage.startsWith("forgetFeed")) {
              forgetSecs(bid) = st.secs
              stageDetail(bid) = stageDetail.getOrElse(bid, "") +
                s" | ${st.stage}=${st.secs}"
            } else if (!maintSecs.contains(bid)) {
              // first non-forget slot stat per batch is the
              // index-maintain one; its NAME carries the per-leg
              // append clocks (r16)
              maintSecs(bid) = st.secs
              stageDetail(bid) = stageDetail.getOrElse(bid, "") +
                s" | ${st.stage}"
            }
            ()
          }) {
        (bid, _, stats) => screenSecs.synchronized {
          screenSecs(bid) = stats.map(_.secs).sum
          stageDetail(bid) = stats
            .map(s => s"${s.stage}=${s.secs}").mkString(" ")
          ()
        }
      }
      try {
        for (b <- 0 until 3) {
          // two takedown requests per batch keep the drain leg live
          // (corpus ids — index tombstones, no store attached)
          reqLog.synchronized {
            reqLog += ((b * 2 + 1L, 10L + b)); reqLog += ((b * 2 + 2L, 30L + b))
          }
          input.addData(batches.slice(b * 8, b * 8 + 8): _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      evalIdx.grams.unpersist()
      // screen term = the slot WALL (r19 — concurrent legs overlap;
      // their summed clocks would overstate); leg-sum fallback for
      // robustness only
      val per = (1L to 2L).flatMap(b =>
        screenWall.get(b).orElse(screenSecs.get(b))
          .map(_ + maintSecs.getOrElse(b, 0.0) +
            forgetSecs.getOrElse(b, 0.0)))
      // stage attribution to STDERR (stdout is the driver's parse
      // surface): which screen/maintenance/compliance term carries
      // the floor; legsum vs wall shows the screen-leg overlap
      (1L to 2L).foreach(b => System.err.println(
        s"[ingest-screen] batch $b: ${stageDetail.getOrElse(b, "?")} " +
          s"screenWall=${screenWall.getOrElse(b, -1.0)} " +
          s"legSum=${math.rint(screenSecs.getOrElse(b, -1.0) * 1e4) / 1e4} " +
          s"maintain=${maintSecs.getOrElse(b, -1.0)} " +
          s"forget=${forgetSecs.getOrElse(b, -1.0)}"))
      if (per.isEmpty) -1.0 else math.rint(per.min * 1e4) / 1e4
    } catch { case e: Throwable =>
      // loud on stderr (stdout stays the driver's parse surface): a
      // silent -1 reads as "not measured" when it means "broken"
      System.err.println(s"[ingest-screen] failed: ${e.getMessage}")
      -1.0
    }

  /** (1-min, 5-min, 15-min loadavg, runnable count) from /proc/loadavg;
    * zeros if unreadable (non-Linux). */
  private def loadavg(): (Double, Double, Double, Int) =
    try {
      val parts = java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg")).trim.split("\\s+")
      (parts(0).toDouble, parts(1).toDouble, parts(2).toDouble,
        parts(3).split("/")(0).toInt)
    } catch { case _: Throwable => (0.0, 0.0, 0.0, 0) }

  private def fmtLoad(l: (Double, Double, Double, Int)): String =
    s"[${l._1},${l._2},${l._3},${l._4}]"

  def main(args: Array[String]): Unit = {
    val nameFilter = args.headOption
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Harness knobs for floor experiments (SPARK_GRAFT_SHUFFLE_PARTITIONS /
    // SPARK_GRAFT_AQE): the defaults are the shipped config; overrides
    // exist so a config A/B is one env var, not a code edit.
    val shufflePartitions =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: touch every table + exercise shuffle/codegen paths once.
    try SparkEntry.queries("q04_region_revenue")(spark, sfDir).count()
    catch { case _: Throwable => }
    // Scale-experiment dirs (tools/ScaleGen) carry only documents/
    // embeddings, so the q04 warmup above no-ops there and the first
    // measured query would eat JVM/codegen startup: run the first
    // in-filter query once untimed as well (for full driver runs this
    // is one extra q01 execution before its two timed runs — harmless).
    SparkEntry.queries.toSeq.sortBy(_._1)
      .find { case (name, _) => nameFilter.forall(p => p.r.findFirstIn(name).isDefined) }
      .foreach { case (_, fn) =>
        try { fn(spark, sfDir).count(); () } catch { case _: Throwable => } }
    spark.catalog.clearCache()
    // Contention control sample #1, BEFORE the query loop (r11): the
    // r9/r10 driver benches were both host-inflated ~2× while the
    // single post-loop control sample read in-band — transient mid-run
    // neighbor load can distort the queries yet miss the one sample.
    // Bracketing the run (start + end sample, flag if EITHER is out of
    // band or they disagree >1.5×) makes a contended artifact
    // self-flagging.
    // The ingest path (wholetext scan → parse → store append) shares
    // nothing with the query warmup above, so the FIRST control sample
    // would pay its one-time parser/codegen compilation and read
    // out-of-band on a perfectly healthy box (measured r11: start 6.2 s
    // vs end 2.4 s, contended=true, idle machine; IngestProbe
    // convergence: 9.3 cold → 2.8 → ~2.3 steady). One untimed warmup
    // ingest pays the JIT bill, and each bracket sample is min-of-two
    // (the query methodology) so a single transient hit can't flag a
    // healthy run.
    // min of the POSITIVE samples: one failed (-1) sample must not
    // swallow a successful one (math.min(-1, 3.2) read as "not
    // measured" with a good sample in hand)
    def minOfTwoIngest(): Double = {
      val samples = Seq(benchIngest(spark), benchIngest(spark)).filter(_ > 0)
      if (samples.isEmpty) -1.0 else samples.min
    }
    // TWO untimed warmups (r17): IngestProbe's convergence series is
    // 9.3 cold → 2.8 → ~2.3 steady — one warmup leaves the start
    // sample on the convergence slope, reading ~1.5× the end sample
    // on a QUIET box (three r17 runs: starts 6.7/5.2/4.8 vs ends
    // 3.6/3.1/3.1 with pre-launch loadavg < 0.3) and tripping the
    // disagree flag on healthy runs.
    if (nameFilter.isEmpty) { benchIngest(spark); benchIngest(spark); () }
    val ingestStart =
      if (nameFilter.isEmpty) minOfTwoIngest()
      else -1.0
    // Same-session DuckDB pairing (r13): the r12 driver artifact
    // paired a loaded-host Spark run against a quiet-host duckbench
    // taken hours earlier and read 2.92× where the same code measured
    // 1.47-1.68× symmetrically — the CLAUDE.md host-symmetry rule,
    // violated by construction whenever the committed duckbench.json
    // and the driver's Bench invocation see different host states.
    // Fix: run the DuckDB side HERE, immediately before the Spark
    // loop, so both sides of every ratio share one host window.
    // Falls back to the committed duckbench.json (pair_mode:"file")
    // when python3/duckdb are unavailable or SPARK_GRAFT_LIVE_PAIR=0.
    val livePairWanted = nameFilter.isEmpty &&
      !sys.env.get("SPARK_GRAFT_LIVE_PAIR").exists(v => v == "0" || v == "false")
    val livePairAttempt: Option[Either[String, Map[String, Double]]] =
      if (livePairWanted) Some(liveDuckBench(sfDir)) else None
    val livePaired = livePairAttempt.flatMap(_.toOption)
    val duck = livePaired.getOrElse(duckQueries(sfDir))
    // File-mode host-symmetry is now a HARD gate (r14 — the r13
    // verdict's item 8): the raw facts (duck-side 1-min loadavg at
    // its run vs this run's) still surface, and when they exceed the
    // symmetry band the quotable ratio REFUSES to exist
    // (ratio_valid:false + duck_ratio:null) instead of riding an
    // annotation a reader can miss — the r12 artifact's 2.92× was
    // exactly a loaded-Spark/quiet-duck number quoted as a ratio.
    // A failed LIVE pairing also names its cause (pair_fallback) so
    // a file-mode artifact is distinguishable from an intentional
    // SPARK_GRAFT_LIVE_PAIR=0 run (r13 advice).
    val (pairMode, ratioValid) =
      if (duck.isEmpty) {
        // no pairing at all (live failed AND the committed file is
        // for another sf dir): the artifact must still NAME the live
        // failure — r17's sf1 run lost its "timeout" cause here and
        // the missing ratio read as unexplained
        val fallback = livePairAttempt.collect {
          case Left(reason) => s""","pair_fallback":"$reason"""" }
          .getOrElse("")
        (fallback, true)
      }
      else if (livePaired.isDefined)
        (s""","pair_mode":"live","ratio_valid":true""", true)
      else {
        val duckLoad = duckLoadavg1m()
        val sparkLoad = loadavg()._1
        val fallback = livePairAttempt.collect {
          case Left(reason) => s""","pair_fallback":"$reason"""" }
          .getOrElse("")
        val symmetric = pairSymmetric(duckLoad, sparkLoad)
        (s""","pair_mode":"file","pair_loadavg_1m":[$duckLoad,$sparkLoad],""" +
          s""""ratio_valid":$symmetric""" + fallback, symmetric)
      }
    // Two timed runs per query, report the min: the first run pays
    // one-time Janino codegen compilation (seconds for the nested
    // lambda expressions) which is not a property of the plan; min of
    // two measures steady-state and damps shared-machine noise.
    val loadStart = loadavg()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        nameFilter.forall(p => p.r.findFirstIn(name).isDefined) }
      // The two deliberate all-pairs BASELINES (crossJoin quality
      // yardsticks — q35's shipping scale path is q53, q36's are
      // q37/q54) stay out of the default headline suite: a bench that
      // leads with a plan you must never run at 100 TB misstates the
      // engine. They still verify in parity every round and still run
      // here when explicitly asked for (name filter matching them, or
      // SPARK_GRAFT_BASELINES=1 for the full-suite-with-baselines run).
      .filter { case (name, _) =>
        !baselineQueries.contains(name) ||
          nameFilter.exists(p => p.r.findFirstIn(name).isDefined) ||
          sys.env.get("SPARK_GRAFT_BASELINES").exists(v => v == "1" || v == "true") }
      .map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      val best = math.min(once(), once())
      // Release this query's persisted frames BETWEEN queries (run 2
      // legitimately reuses run 1's cache — CacheManager dedups by
      // canonicalized plan — but letting 69 queries' persists pile up
      // makes later measurements depend on accumulated storage
      // pressure, which is what polluted the r2 q33 number).
      spark.catalog.clearCache()
      name -> best
    }
    def r4(v: Double): Double = math.rint(v * 1e4) / 1e4
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Control sample #2, AFTER the query loop; -1 marks "not
    // measured" on filtered iteration runs. `ingest_1k_files_sec`
    // stays the END sample (the series every prior round reported).
    val ingest =
      if (nameFilter.isEmpty) minOfTwoIngest()
      else -1.0
    // composed ingest-loop per-batch latency (screen + maintenance),
    // AFTER the query loop so its index builds never pollute query
    // timings; -1 on filtered runs. SPARK_GRAFT_SCREEN=1 forces it on
    // a filtered run (pair with a no-match filter for a standalone
    // attribution read off the stderr stage lines).
    val ingestScreen =
      if (nameFilter.isEmpty || sys.env.get("SPARK_GRAFT_SCREEN").contains("1"))
        benchIngestScreen(spark, sfDir)
      else -1.0
    val loadEnd = loadavg()
    // Totals ("metric"/"value") lead the line and the queries map
    // trails it, so a capture that truncates the line's TAIL still
    // yields the headline number; the file copy is the durable full
    // record either way (BENCH_r03's stdout capture parsed as null —
    // only bench.json survived).
    val skipped = baselineQueries.filter(b =>
      !results.exists(_._1 == b) && SparkEntry.queries.contains(b) &&
        nameFilter.forall(p => p.r.findFirstIn(b).isDefined))
    val skippedJson =
      if (skipped.isEmpty) ""
      else skipped.toSeq.sorted.map("\"" + _ + "\"")
        .mkString(""","baselines_skipped":[""", ",", "]")
    val json =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""ingest_1k_files_sec":${r4(ingest)}${contendedJson(ingestStart, ingest)},""" +
        s""""ingest_screen_sec":${r4(ingestScreen)},""" +
        s""""loadavg_start":${fmtLoad(loadStart)},"loadavg_end":${fmtLoad(loadEnd)}""" +
        skippedJson + duckPairing(duck, results, ratioValid) + pairMode +
        pairingStaleness(duck, results) + queryRatios(duck, results) +
        s""","queries":$qs}"""
    // File first (durable even if the print path dies). On stdout:
    // the COMPACT totals line FIRST, then the full line (with the
    // 70+-entry queries map it runs ~2.3 KB), then the compact line
    // again LAST — the driver's capture holds a bounded window of
    // bytes at an unknown offset (BENCH_r04/r05 parsed as null when
    // the full line's head fell outside it), so a ~250-byte
    // self-contained record bounds the output block on BOTH ends; any
    // window that sees either end parses. The compact line carries
    // the loadavg annotation (a loaded-machine number must be
    // self-identifying wherever it's read) and, when a duckbench.json
    // from tools/duckbench.py covers the same sf dir, the paired
    // DuckDB total + ratio; bench.json remains the durable full
    // per-query record.
    // full (unfiltered) runs only: bench.json is COMMITTED per round
    // since r16 (the benchdelta round-over-round source), so a
    // filtered iteration run must not clobber the durable full record
    if (nameFilter.isEmpty)
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json + "\n")
      catch { case _: Throwable => }
    val compact =
      s"""{"metric":"total","value":${r4(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""ingest_1k_files_sec":${r4(ingest)}${contendedJson(ingestStart, ingest)},""" +
        s""""ingest_screen_sec":${r4(ingestScreen)},""" +
        s""""loadavg_start":${fmtLoad(loadStart)},"loadavg_end":${fmtLoad(loadEnd)}""" +
        duckPairing(duck, results, ratioValid) + pairMode +
        pairingStaleness(duck, results) +
        s""","queries_in":"bench.json"}"""
    println(compact)
    println(json)
    println(compact)
    System.out.flush()
    spark.stop()
  }

  /** Healthy band for the `ingest_1k_files_sec` contention control.
    * The historical ~3.0-3.7 series (r5-r10 verdicts) measured a
    * parse-path-COLD sample (single post-loop control, paying one-time
    * parser codegen); the r11 bracketed control warms the ingest path
    * untimed first, so steady-state samples read ~2.4-2.8 on a quiet
    * box. The band spans both regimes — what matters for the flag is
    * the ABOVE threshold and start/end disagreement, not the floor.
    * Above `contendedAbove` the HOST is loaded — both engines inflate
    * together and the run is not comparable against a quiet pairing.
    * r13 recalibration: the r12 driver run read a min-of-two start
    * sample of 4.59 on a host whose totals were ~1.8× inflated, yet
    * 4.59 < the old 5.5 threshold kept `contended:false` — a silent
    * lie in the artifact. Post-warmup healthy samples measure 2.4-3.2
    * (r11/r12 brackets); a min-of-two above 4.2 is ≥1.5× past the
    * healthy ceiling and is flagged. (With pair_mode:"live" a loaded
    * host inflates BOTH engines, so the ratio stays honest either
    * way; the flag now marks absolute times as non-comparable across
    * rounds.) */
  val controlHealthyBand: (Double, Double) = (2.4, 3.7)
  val contendedAbove: Double = 4.2

  /** `,"contended":…` — the run self-adjudicates from its own ingest
    * control instead of needing the band diagnosis re-derived every
    * round (BENCH_r05/r06 were both contention artifacts discovered
    * only by manual comparison; BENCH_r09/r10 were inflated mid-run
    * while the single post-loop sample read in-band). r11: the
    * control BRACKETS the query loop — contended if EITHER sample is
    * above the band or the two disagree >1.5× (transient mid-run
    * load shows up as start/end disagreement even when both ends are
    * individually plausible). null when the control didn't run
    * (filtered iteration runs). */
  private def contendedJson(start: Double, end: Double): String =
    if (end < 0) s""","contended":null"""
    else {
      val disagree = start > 0 && end > 0 &&
        math.max(start, end) / math.min(start, end) > 1.5
      val flag = start > contendedAbove || end > contendedAbove || disagree
      s""","ingest_control_start":${math.rint(start * 1e4) / 1e4},""" +
        s""""control_disagree":$disagree,"contended":$flag,""" +
        s""""control_healthy_band":[${controlHealthyBand._1},${controlHealthyBand._2}]"""
    }

  /** File-mode pairing symmetry band (r14): the two 1-min loadavgs
    * must be within 3.0 of each other OR within 1.5× — otherwise one
    * side ran loaded and the other quiet (the r12 2.92× artifact
    * class) and the ratio is not a measurement. Unknown duck-side
    * load (pre-r9 duckbench.json without the annotation) cannot
    * attest symmetry and is therefore NOT symmetric — re-pair. */
  private[graft] def pairSymmetric(duckLoad1m: Double,
      sparkLoad1m: Double): Boolean =
    duckLoad1m >= 0 && sparkLoad1m >= 0 && {
      val lo = math.min(duckLoad1m, sparkLoad1m)
      val hi = math.max(duckLoad1m, sparkLoad1m)
      hi - lo <= 3.0 || hi <= 1.5 * math.max(lo, 0.01)
    }

  /** Run tools/duckbench.py in a temp dir against the SAME sf dir,
    * right now, on this host — the live half of the r13 symmetric
    * pairing. Bench owns the oracle SQL (SparkEntry.oracleSql), so it
    * writes the oracle_sql.json the script expects itself; the
    * script's durable duckbench.json lands in the temp cwd and, on
    * success, is copied over ./duckbench.json so the committed trail
    * matches what the artifact's ratio was computed from. Left(cause)
    * on failure — missing python3/duckdb, nonzero exit, timeout, sf
    * mismatch — so the artifact names WHY it fell back to file mode
    * instead of silently reverting to the asymmetric pairing the live
    * mode exists to prevent (r13 advice: the old Throwable catch
    * swallowed even fatal errors into an unexplained fallback; fatal
    * errors now propagate). */
  private def liveDuckBench(sfDir: String)
      : Either[String, Map[String, Double]] =
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_pair")
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val oracle = om.createObjectNode()
      SparkEntry.oracleSql.toSeq.sortBy(_._1)
        .foreach { case (k, v) => oracle.put(k, v); () }
      java.nio.file.Files.writeString(tmp.resolve("oracle_sql.json"),
        om.writeValueAsString(oracle))
      val script = new java.io.File("tools/duckbench.py").getAbsolutePath
      val pb = new ProcessBuilder("python3", script, sfDir, tmp.toString)
      pb.directory(tmp.toFile)
      pb.redirectErrorStream(true)
      pb.redirectOutput(tmp.resolve("out.txt").toFile)
      val p = pb.start()
      // 1800 s: the sf0.1 duck side runs in ~1-2 min, but sf1's needs
      // ~25 min wall (r17 measured — the 600 s cap was why the first
      // sf1 live pairing fell back to file mode with no ratio)
      val done =
        try p.waitFor(1800, java.util.concurrent.TimeUnit.SECONDS)
        catch { case e: InterruptedException =>
          p.destroyForcibly(); throw e }
      if (!done) { p.destroyForcibly(); Left("timeout") }
      else if (p.exitValue() != 0) Left(s"exit=${p.exitValue()}")
      else {
        val f = tmp.resolve("duckbench.json")
        val node = om.readTree(java.nio.file.Files.readString(f))
        if (node.path("sf").asText() != sfDir) Left("sf_mismatch")
        else {
          import scala.jdk.CollectionConverters._
          val m = node.path("queries").properties().asScala
            .map(e => e.getKey -> e.getValue.asDouble()).toMap
          if (m.isEmpty) Left("empty_queries")
          else {
            try java.nio.file.Files.copy(f,
              java.nio.file.Paths.get("duckbench.json"),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            catch { case scala.util.control.NonFatal(_) => }
            Right(m)
          }
        }
      }
    } catch { case scala.util.control.NonFatal(e) =>
      Left(e.getClass.getSimpleName) }

  /** The committed duckbench.json's recorded 1-min loadavg at ITS run
    * time (-1 when unreadable) — the duck half of the file-mode
    * symmetry annotation. */
  private def duckLoadavg1m(): Double =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get("duckbench.json")))
      val l = node.path("loadavg_start")
      if (l.isArray && l.size() > 0) l.get(0).asDouble() else -1.0
    } catch { case _: Throwable => -1.0 }

  /** Per-query DuckDB seconds from ./duckbench.json when it covers
    * the same sf dir; empty on any mismatch or parse failure. */
  private def duckQueries(sfDir: String): Map[String, Double] =
    try {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get("duckbench.json")))
      if (node.path("sf").asText() != sfDir) Map.empty
      else {
        import scala.jdk.CollectionConverters._
        node.path("queries").properties().asScala
          .map(e => e.getKey -> e.getValue.asDouble()).toMap
      }
    } catch { case _: Throwable => Map.empty }

  /** `,"duck_total":…,"duck_ratio":…,"duck_matched":n` when the
    * pairing exists. BOTH sides of the ratio are summed over the
    * INTERSECTION of the two runs' query sets — a Spark query DuckDB
    * didn't time (or vice versa) must not inflate either side of the
    * headline number. The ratio is only as fresh as the last
    * duckbench run — the loadavg annotation on both records is what
    * makes a stale pairing visible. */
  private def duckPairing(duck: Map[String, Double],
      results: Seq[(String, Double)], ratioValid: Boolean): String = {
    val matched = results.filter(r => duck.contains(r._1))
    if (matched.isEmpty) ""
    else {
      val d = math.rint(matched.map(r => duck(r._1)).sum * 1e3) / 1e3
      val sp = matched.map(_._2).sum
      // A STALE pairing (benched queries missing from duckbench.json —
      // see pairingStaleness) must not fold into a headline number
      // someone will quote: BENCH_r11.json carried a flagged 2.35×
      // that under-counted the duck side, and the flag alone didn't
      // stop it being read as the round's ratio (r11 verdict #4).
      // Emit duck_ratio:null under staleness — the totals stay for
      // diagnosis, the quotable number refuses to exist. r14: the
      // same refusal applies to a host-ASYMMETRIC file pairing
      // (ratio_valid:false — see pairSymmetric).
      val ratio =
        if (isStale(duck, results) || !ratioValid) "null"
        else (math.rint(sp / d * 100) / 100).toString
      s""","duck_total":$d,"duck_ratio":$ratio,""" +
        s""""duck_matched":${matched.size}"""
    }
  }

  /** True when some benched query with a DuckDB oracle has no duck
    * time in the pairing — the condition pairingStaleness names. */
  private def isStale(duck: Map[String, Double],
      results: Seq[(String, Double)]): Boolean =
    duck.nonEmpty && results.exists { case (name, _) =>
      SparkEntry.oracleSql.contains(name) && !duck.contains(name) }

  /** `,"duck_unmatched":[…],"pairing_stale":…` — the r7 protocol hole
    * made loud: BENCH_r07 silently excluded the round's five NEW
    * queries because the committed duckbench.json predated them, and
    * nothing in the artifact said so. Any benched query that HAS a
    * DuckDB oracle (SparkEntry.oracleSql) but no duck time in the
    * pairing is named here, and `pairing_stale` flips true — a
    * non-empty list means the headline duck_ratio under-counts and the
    * run must be re-paired (`python3 tools/duckbench.py` first, per
    * CLAUDE.md). Emitted whenever a pairing exists; empty-set runs
    * emit `"pairing_stale":false` so freshness is positively
    * asserted, not inferred from absence. */
  private def pairingStaleness(duck: Map[String, Double],
      results: Seq[(String, Double)]): String = {
    if (duck.isEmpty) ""
    else {
      val unmatched = results
        .filter { case (name, _) =>
          SparkEntry.oracleSql.contains(name) && !duck.contains(name) }
        .map(_._1).sorted
      val names = unmatched.map("\"" + _ + "\"").mkString("[", ",", "]")
      s""","duck_unmatched":$names,"pairing_stale":${unmatched.nonEmpty}"""
    }
  }

  /** `,"query_ratios":{…}` — per-query spark/duck over the
    * intersection, so a driver snapshot carries its own per-query
    * adjudication; empty string without a pairing. */
  private def queryRatios(duck: Map[String, Double],
      results: Seq[(String, Double)]): String = {
    val matched = results.filter(r => duck.get(r._1).exists(_ > 0))
    if (matched.isEmpty) ""
    else matched.map { case (n, v) =>
      s"""\"$n\":${math.rint(v / duck(n) * 100) / 100}"""
    }.mkString(""","query_ratios":{""", ",", "}")
  }

  /** Distributed bulk-ingest benchmark: 1000 small gcc-style logs →
    * Runner.importDirectory (wholetext scan → executor parse → append),
    * end-to-end including the store write. Reported separately from the
    * query total (it has no DuckDB comparator). */
  private def benchIngest(spark: SparkSession): Double = {
    val dir = java.nio.file.Files.createTempDirectory("bench_ingest")
    (0 until 1000).foreach { i =>
      java.nio.file.Files.writeString(dir.resolve(f"run_$i%04d.log"),
        s"src/f$i.c:${i % 90 + 1}:2: error: broken thing $i\n" +
          s"src/f$i.c:${i % 90 + 7}:4: warning: sketchy $i\nall done\n")
    }
    val storeRoot = java.nio.file.Files.createTempDirectory("bench_store").toString
    val runner = new graft.exec.Runner(
      new graft.store.EventStore(spark, storeRoot),
      new graft.store.BlobStore(s"$storeRoot/blobs"))
    // A failed ingest must read as a failure (-1), never as a fast
    // run. One retry first: r17's sf1 session hit a transient
    // FileNotFoundException on the fresh temp glob (tmp-cleaner race)
    // that a immediate retry would have absorbed — a -1 control
    // costs the whole artifact its contention adjudication.
    def attempt(): Double = {
      val t0 = System.nanoTime()
      runner.importDirectory(s"$dir/*.log", "gcc_text")
      (System.nanoTime() - t0) / 1e9
    }
    val elapsed =
      try attempt()
      catch { case _: Throwable =>
        try attempt() catch { case _: Throwable => -1.0 } }
    for (root <- Seq(dir, java.nio.file.Paths.get(storeRoot))) {
      try {
        java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      } catch { case _: Throwable => }
    }
    elapsed
  }
}
