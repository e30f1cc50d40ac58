package graft

import org.apache.spark.sql.functions._
import graft.ml.CorpusPipeline

/** End-to-end corpus build through the fluent pipeline: every stage is
  * individually gated elsewhere (parity queries / differential specs);
  * this suite checks the COMPOSITION — ordering, bookkeeping, column
  * flow, and that each stage's effect survives the stages around it.
  *
  * Stage interaction is real and the corpus is crafted around it: span
  * dedup runs at dfMax=2 (boilerplate = a passage in 3+ docs), so the
  * pair-shared text that the exact/near dedup stages must see (df=2)
  * survives the excision pass — the same threshold separation a real
  * pipeline relies on.
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "subscribe to our newsletter for updates today"

  // doc_id, text, lang — every stage has work to do:
  //  - 1: punctuation garbage (scores 0.45: no stopwords, full punct
  //    penalty; every real doc scores >= 0.65 -> the 0.5 gate drops it)
  //  - 2/3/9: carry the 7-token boilerplate (df=3 > dfMax=2 → excised)
  //  - 4/5: exact duplicates (one survives)
  //  - 6/7: near-duplicates, 7 higher-quality (7 must win)
  //  - 8: contaminated by the eval set (decontaminate drops it)
  //  - 9-14: en filler, mutually distinct; 15: the lone fr doc
  private def corpus = Seq(
    (1L, "!!! ??? *** ((( ))) %%% $$$ ### @@@ ^^^ &&& ~~~ ``` ||| ;;;", "en"),
    (2L, s"alpha beta gamma opening words then $boiler and a closing thought", "en"),
    (3L, s"different intro sentence here $boiler with its own unique ending phrase", "en"),
    (4L, "the identical pair of documents is exactly the same in both copies here", "en"),
    (5L, "the identical pair of documents is exactly the same in both copies here", "en"),
    (6L, "the shared near duplicate core sentence about spark engines runs here now", "en"),
    (7L, "the shared near duplicate core sentence about spark engines runs here now and this better copy has extra original detail appended of real value", "en"),
    (8L, "training text quoting benchmark question rho sigma tau upsilon verbatim inside", "en"),
    (9L, s"ninth document opens differently $boiler but stays otherwise its own text", "en"),
    (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening", "en"),
    (11L, "eleven elephants wander dusty savannah trails seeking distant water holes", "en"),
    (12L, "quantum processors entangle qubits across supercooled silicon lattices quietly", "en"),
    (13L, "ancient manuscripts reveal forgotten recipes for honeyed barley bread loaves", "en"),
    (14L, "fourteen fiddlers rehearse lively reels inside the old coastal tavern", "en"),
    (15L, "le document francais reste seul de sa langue et doit survivre entier", "fr"))
    .toDF("doc_id", "text", "lang")

  private val evalSet = Seq(
    (100L, "benchmark question rho sigma tau upsilon"))
    .toDF("doc_id", "text")

  test("full chain: quality -> span -> exact -> near -> decontaminate -> split") {
    // (langMixture is covered by its own test below: its hash draw
    // legitimately drops arbitrary en docs, which would make every
    // membership assertion here about the draw, not the stages.)
    val p = CorpusPipeline(corpus)
      .qualityFilter(0.5)
      .spanDedup(k = 5, dfMax = 2)
      .exactDedup()
      .nearDedup(n = 3, k = 12, bands = 4, threshold = 0.3)
      .decontaminate(evalSet, n = 3, expectedEvalGrams = 50)
      .split()
    val out = p.docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap

    assert(!out.contains(1L)) // quality gate
    // boilerplate excised from every survivor that carried it, with
    // the unique remainder kept
    assert(Seq(2L, 3L, 9L).exists(out.contains))
    for (id <- Seq(2L, 3L, 9L) if out.contains(id)) {
      assert(!out(id).contains(boiler), s"doc $id kept boilerplate")
      assert(out(id).nonEmpty)
    }
    assert(out.contains(4L) !== out.contains(5L)) // exactly one exact-dup copy
    // near-dup: the higher-quality doc 7 wins over 6
    assert(out.contains(7L) && !out.contains(6L))
    assert(!out.contains(8L)) // decontaminated
    assert(out.contains(15L)) // the fr doc flows through untouched

    // bookkeeping: 6 stages, docsIn of each == docsOut of the previous
    assert(p.stats.length === 6)
    p.stats.sliding(2).foreach { case Vector(a, b) =>
      assert(a.docsOut === b.docsIn)
    }
    assert(p.stats.head.docsIn === 15)
    // text-rewrite and column-append stages drop nothing
    assert(p.stats(1).docsIn === p.stats(1).docsOut)
    assert(p.stats(5).docsIn === p.stats(5).docsOut)
    // split column present and valued
    val splits = p.docs.select(col("split")).distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "validation", "test")))
    assert(p.report.linesIterator.size === 6)
  }

  test("chunk: windows reconstruct the original text; ids pack deterministically") {
    // 20-token doc at size 8 / stride 6: ceil((20-8)/6)=2 → chunks
    // 0..2 covering tokens [1..8], [7..14], [13..20] (2-token overlap)
    val words = (1 to 20).map(i => s"w$i")
    val d = Seq((7L, words.mkString(" "), "en"), (8L, "short text", "en"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusPipeline(d).chunk(sizeTokens = 8, stride = 6)
      .docs.orderBy("doc_id").collect()
    val doc7 = out.filter(_.getAs[Long]("orig_doc_id") == 7L)
    assert(doc7.length === 3)
    assert(doc7.map(_.getAs[Long]("doc_id")).toSeq ===
      Seq(7L << 20, (7L << 20) | 1, (7L << 20) | 2))
    val chunks = doc7.map(_.getAs[String]("text"))
    assert(chunks(0) === words.slice(0, 8).mkString(" "))
    assert(chunks(1) === words.slice(6, 14).mkString(" "))
    assert(chunks(2) === words.slice(12, 20).mkString(" "))
    // de-overlapped reconstruction: chunk 0 + each later chunk minus
    // its leading (size - stride) tokens = the original document
    val rebuilt = (chunks(0).split(" ") ++
      chunks.drop(1).flatMap(_.split(" ").drop(2))).mkString(" ")
    assert(rebuilt === words.mkString(" "))
    // short doc: single whole-text chunk, lang column carried through
    val doc8 = out.filter(_.getAs[Long]("orig_doc_id") == 8L)
    assert(doc8.length === 1 && doc8.head.getAs[String]("text") === "short text")
    assert(doc8.head.getAs[String]("lang") === "en")
  }

  test("budgetMixture: output lands on the budget, tail language clamped to keep-all") {
    // 200 en / 50 de / 5 fr, budget 100 at alpha=0.5:
    // ss = √200+√50+√5 ≈ 23.449; acceptance = N/(ss·√n_s) →
    // en ≈ 0.302, de ≈ 0.603, fr ≈ 1.907 → clamped 1.0 (keep all).
    // Expected output ≈ 60.3 + 30.2 + 5 = 95.5 docs.
    val docs = ((1 to 200).map(i => (i.toLong, s"english document body $i", "en")) ++
      (1 to 50).map(i => (300L + i, s"deutsches dokument nummer $i", "de")) ++
      (1 to 5).map(i => (400L + i, s"document francais numero $i", "fr")))
      .toDF("doc_id", "text", "lang")
    val p = CorpusPipeline(docs).budgetMixture(budgetDocs = 100L, alpha = 0.5)
    val kept = p.docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // fr's quota exceeds its size -> rate clamps to 1, all 5 survive
    assert(byLang.getOrElse("fr", 0) === 5)
    // acceptance rates strictly ordered by group size (temperature
    // flattening): fr (1.0) > de > en — deterministic given the draw
    val rEn = byLang.getOrElse("en", 0) / 200.0
    val rDe = byLang.getOrElse("de", 0) / 50.0
    assert(rDe > rEn, s"de rate $rDe should exceed en rate $rEn")
    assert(rDe < 1.0)
    // the budget property: expected 95.5, deterministic draw lands
    // within binomial concentration of it
    assert(kept.length >= 75 && kept.length <= 115,
      s"output ${kept.length} far from budget 100")
    // retention recorded in the stage stats row
    assert(p.stats.head.docsIn === 255 && p.stats.head.docsOut === kept.length)
  }

  test("importanceFilter: keeps target-like docs, drops off-target, stats recorded") {
    // Target = en docs. Docs built from en bigrams survive the
    // default strict logw > 0 rule (the q115 selected flag, aligned
    // r12); docs of source-only bigrams drop.
    val docs = ((1 to 20).map(i => (i.toLong, "the cat sat on the mat today", "en")) ++
      (1 to 20).map(i => (100L + i, "der hund lief durch den park heute", "de")) ++
      Seq((200L, "the cat sat on the mat today", "de"))) // en-like content, de label
      .toDF("doc_id", "text", "lang")
    val p = CorpusPipeline(docs).importanceFilter(col("lang") === "en", buckets = 64)
    val kept = p.docs.select($"doc_id").as[Long].collect().toSet
    assert((1L to 20L).forall(kept.contains), "target docs must survive")
    assert(kept.contains(200L), "target-like content survives regardless of label")
    assert((101L to 120L).forall(!kept.contains(_)), "off-target docs drop")
    assert(p.stats.head.docsIn === 41 && p.stats.head.docsOut === kept.size)
    // a bigram-less doc (single token) has featureless weight 0: it
    // must face the threshold like any other doc, not be excised
    // unconditionally (r11 review finding)
    val withShort = docs.unionByName(Seq((300L, "hello", "de"))
      .toDF("doc_id", "text", "lang"))
    val keptShort = CorpusPipeline(withShort)
      .importanceFilter(col("lang") === "en", buckets = 64, minLogw = -100.0)
      .docs.select($"doc_id").as[Long].collect().toSet
    assert(keptShort.contains(300L), "featureless doc must survive minLogw <= 0")
  }

  test("chunk: packed-id contract violation fails loudly instead of colliding") {
    // r10: an orig doc_id >= 2^43 would lose high bits in the shift and
    // collide packed ids feeding downstream dedup/split — must raise.
    val bad = Seq((1L << 43, "a b c", "en"), (2L, "x y", "en"))
      .toDF("doc_id", "text", "lang")
    val ex = intercept[Exception] {
      CorpusPipeline(bad).chunk(sizeTokens = 8, stride = 6).docs.collect()
    }
    assert(ex.getMessage.contains("packed-id contract") ||
      Option(ex.getCause).exists(_.getMessage.contains("packed-id contract")))
  }

  test("langMixture: rarest language fully kept, dominant language downsampled") {
    val p = CorpusPipeline(corpus).langMixture(alpha = 0.5)
    val kept = p.docs.select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(kept.exists(_._2 == "fr")) // rate 1.0 — the lone fr doc stays
    val enIn = 14
    val enOut = kept.count(_._2 == "en")
    // rate = sqrt(1/14) ≈ 0.27: the draw is deterministic (content
    // hash), so this bound is exact for this corpus, not flaky
    assert(enOut < enIn, s"mixture kept all $enOut en docs")
    assert(p.stats.head.docsOut === kept.length)
  }

  test("stages are independent: near-dedup alone keeps the best copy per cluster") {
    val p = CorpusPipeline(corpus).nearDedup(3, 12, 4, 0.3)
    val kept = p.docs.select($"doc_id").as[Long].collect().toSet
    assert(kept.contains(7L) && !kept.contains(6L))
    // exact dups are ALSO near-dups at threshold 0.3: one of 4/5 kept
    assert(kept.contains(4L) !== kept.contains(5L))
  }

  test("containmentDedup drops the contained short doc that nearDedup misses") {
    // doc 21 is doc 20's text verbatim plus a long original tail:
    // containment(20 in 21) = 1.0, jaccard far below any useful
    // threshold — symmetric nearDedup cannot see it.
    val base = "the quick brown fox jumps over the lazy dog near the river"
    val tail = (1 to 30).map(i => s"tail$i").mkString(" ")
    val docs = Seq(
      (20L, base, "en"),
      (21L, s"$base $tail", "en"),
      (22L, "completely unrelated content about catalyst plan rewrites", "en"))
      .toDF("doc_id", "text", "lang")
    val p = CorpusPipeline(docs).containmentDedup(n = 4, threshold = 0.8)
    val kept = p.docs.select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(21L, 22L), s"kept $kept")
    assert(p.stats.head.docsIn === 3 && p.stats.head.docsOut === 2)
    // and nearDedup at the same corpus indeed keeps all three
    val nd = CorpusPipeline(docs).nearDedup(4, 12, 4, 0.5)
    assert(nd.docs.count() === 3)
  }

  test("writeTo: split-partitioned corpus + stats.json round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("pipe_out").toString
    val p = CorpusPipeline(corpus).qualityFilter(0.5).split()
    p.writeTo(dir)
    val back = spark.read.parquet(s"$dir/corpus")
    assert(back.count() === p.docs.count())
    assert(back.columns.contains("split"))
    // partition dirs exist (pruned reads for the trainer)
    val parts = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.startsWith("split=")).map(_.getName).toSet
    assert(parts.nonEmpty)
    val stats = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/stats.json"))
    assert(stats.contains("\"stage\":\"quality>=0.5\""))
    assert(stats.contains("\"docs_in\":15"))
  }

  test("checkpointed mode: stage tables on disk, same results as in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("pipe_ckpt").toString
    val mem = CorpusPipeline(corpus).qualityFilter(0.5).exactDedup()
    val ck = CorpusPipeline.checkpointed(corpus, dir).qualityFilter(0.5).exactDedup()
    val memIds = mem.docs.select($"doc_id").as[Long].collect().toSet
    val ckIds = ck.docs.select($"doc_id").as[Long].collect().toSet
    assert(ckIds === memIds)
    assert(ck.stats.map(s => (s.stage, s.docsIn, s.docsOut)) ===
      mem.stats.map(s => (s.stage, s.docsIn, s.docsOut)))
    // one parquet stage table per stage, re-readable on their own
    val stageDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("stage_")).map(_.getName).sorted
    assert(stageDirs.length === 2, stageDirs.mkString(", "))
    val resumed = spark.read.parquet(s"$dir/${stageDirs.last}")
    assert(resumed.select($"doc_id").as[Long].collect().toSet === ckIds)

    // RESUME: re-running the same chain against the same dir re-reads
    // completed stage tables instead of recomputing them (stage files
    // untouched — same set, same modification times)
    def fileState(d: String) = new java.io.File(s"$dir/$d").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    val before = stageDirs.map(d => d -> fileState(d)).toMap
    val rerun = CorpusPipeline.checkpointed(corpus, dir)
      .qualityFilter(0.5).exactDedup()
    assert(rerun.docs.select($"doc_id").as[Long].collect().toSet === ckIds)
    for (d <- stageDirs)
      assert(fileState(d) === before(d), s"stage $d was rewritten on resume")
  }

  test("quality score is total on the empty string (post-excision docs)") {
    val q = Seq((1L, "")).toDF("doc_id", "text")
      .select(graft.ml.TextAnalysis.qualityScore(col("text")).as("q"))
      .head().getDouble(0)
    assert(q >= 0.0 && q <= 1.0)
  }

  test("streaming ingest chain: quality + near-dup + decontamination screens over micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // prebuilt sides: the batch corpus (minus the junk/eval rows) as
    // the dedup index, the same eval set as the decontamination index
    val corpusDocs = corpus.filter($"doc_id" =!= 1L && $"doc_id" =!= 8L)
      .select($"doc_id", $"text")
    val dedupIdx = graft.streaming.StreamingDedup
      .indexCorpus(corpusDocs, n = 3, k = 12, bands = 4)
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val accepted = scala.collection.mutable.Map[Long, Set[Long]]()
    val stats = scala.collection.mutable.Map[Long, Vector[CorpusPipeline.StageStat]]()
    val q = CorpusPipeline.streaming(
      input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
      dedupIdx, n = 3, k = 12, bands = 4, threshold = 0.3, minAgree = 0,
      evalIdx, evalN = 3) { (batchId, acc, st) =>
      accepted.synchronized {
        accepted(batchId) = acc.select($"doc_id").as[Long].collect().toSet
        stats(batchId) = st
      }
    }
    try {
      // batch 0: 100 = near-dup of corpus doc 10; 101 = clean novel
      // text; 102 = punctuation junk under the quality gate
      input.addData(
        100L -> "crimson harbors shelter weary sailors beneath amber lighthouse beams each morning",
        101L -> "completely novel prose describing verdant terraced gardens above the river delta",
        102L -> "!!! ??? *** ((( ))) %%% $$$ ### @@@ ^^^ &&& ~~~ ``` ||| ;;;")
      q.processAllAvailable()
      // batch 1: 200 = contaminated by the eval set; 201 = clean;
      // 202/203 = in-batch near-dups (lower id must survive)
      input.addData(
        200L -> "quoting benchmark question rho sigma tau upsilon right in the middle here",
        201L -> "another clean document about migratory cranes crossing mountain passes in autumn",
        202L -> "the in batch duplicated passage appears twice with trailing marker alpha",
        203L -> "the in batch duplicated passage appears twice with trailing marker beta")
      q.processAllAvailable()
    } finally q.stop()

    assert(accepted(0L) === Set(101L),
      s"batch 0 accepted ${accepted(0L)}")
    assert(accepted(1L) === Set(201L, 202L),
      s"batch 1 accepted ${accepted(1L)}")
    // stats: three stages per batch, chained docsIn/docsOut
    for (b <- Seq(0L, 1L)) {
      val st = stats(b)
      assert(st.map(_.stage) ===
        Vector("quality>=0.5", "nearDedupScreen", "decontaminateScreen"))
      assert(st.sliding(2).forall(w => w(0).docsOut == w(1).docsIn))
    }
    assert(stats(0L).head.docsIn === 3 && stats(1L).head.docsIn === 4)
    evalIdx.grams.unpersist()
  }

  test("nearDedupIndexed: batch dedups against the stored band index") {
    // corpus ids straddle the batch's id range so the pair orientation
    // (a < b by VALUE) exercises the corpus side landing on BOTH
    // columns: corpus doc 5 < batch 100 (corpus = doc_a), corpus 900 >
    // batch 150 (corpus = doc_b)
    val corpusDocs = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and variant five tail"),
      (900L, "a completely different corpus document about catalyst planning internals today"),
      (7L, "unrelated corpus filler text that matches nothing in the arriving batch"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and variant five tails"),
      (150L, "a completely different corpus document about catalyst planning internals now"),
      (160L, "fresh in batch duplicate pair sharing almost every single token here alpha"),
      (161L, "fresh in batch duplicate pair sharing almost every single token here beta"),
      (170L, "a novel batch document with entirely original content surviving the screen"))
      .toDF("doc_id", "text")
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_pipe_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      val p = CorpusPipeline(batch)
        .nearDedupIndexed("g_pipe_band", n = 3, k = 12, bands = 4,
          threshold = 0.3)
      val kept = p.docs.select($"doc_id").as[Long].collect().toSet
      // both corpus-matching batch docs drop (regardless of which pair
      // side the corpus id landed on); in-batch pair keeps the lower id
      assert(kept === Set(160L, 170L), kept.toString)
      assert(p.stats.head.docsIn === 5 && p.stats.head.docsOut === 2)
    } finally {
      Seq("g_pipe_band", "g_pipe_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain: accepted batches fold into the stored indexes; cross-batch dups caught from the index; compaction preserves probes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // deterministic fake embedder (the container has no embedding
    // model): 4 dims derived from doc_id — the Spark-side plumbing
    // (schema, append path, bucketing) is what this test exercises
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("vec_id"), lit("x").as("label"),
        array((1 to 4).map(i =>
          (pmod(hash(col("doc_id") * i), lit(97)) + 1).cast("float")): _*)
          .as("embedding"))
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"),
      (11L, "eleven elephants wander dusty savannah trails seeking distant water holes"),
      (12L, "quantum processors entangle qubits across supercooled silicon lattices quietly"),
      (13L, "ancient manuscripts reveal forgotten recipes for honeyed barley bread loaves"))
      .toDF("doc_id", "text")
    val lexDir = java.nio.file.Files.createTempDirectory("g_maint_lex").toString
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_maint_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      graft.ml.LexIndex.build(corpusDocs, lexDir)
      graft.ml.IvfIndex.write(embed(corpusDocs), "g_maint_ivf",
        cells = 2, iters = 1, buckets = 4)

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val accepted = scala.collection.mutable.Map[Long, Set[Long]]()
      val maintained = scala.collection.mutable.Map[Long, CorpusPipeline.StageStat]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_maint_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          lexIndexDir = Some(lexDir), ivfTable = Some("g_maint_ivf"),
          embed = embed, compactAtFilesPerBucket = 2.0),
        evalIdx, evalN = 3,
        onMaintain = (id, st) => maintained.synchronized {
          maintained(id) = st; () }) { (batchId, acc, _) =>
        accepted.synchronized {
          accepted(batchId) = acc.select($"doc_id").as[Long].collect().toSet
          ()
        }
      }
      try {
        // batch 0: two clean novel docs — both accepted AND appended
        input.addData(
          300L -> "seven silver falcons circle the ancient observatory tower at dusk tonight",
          301L -> "migrating whales sing layered songs across the cold northern strait waters")
        q.processAllAvailable()
        // batch 1: 310 = near-copy of BATCH-0 doc 300 (the static
        // corpus never saw it — only the index append makes this
        // catchable); 311 novel
        input.addData(
          310L -> "seven silver falcons circle the ancient observatory tower at dusk tonite",
          311L -> "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil")
        q.processAllAvailable()
        // batch 2: 320 = near-copy of batch-0 doc 301; 321 = near-copy
        // of batch-1 doc 311; 322 novel — both dups must be caught
        // FROM THE INDEX, two appends later
        input.addData(
          320L -> "migrating whales sing layered songs across the cold northern strait waterways",
          321L -> "terraced vineyards ripen slowly along the mineral rich volcanic hillside soils",
          322L -> "paper lanterns drift over the festival river while drummers keep gentle time")
        q.processAllAvailable()
      } finally q.stop()

      assert(accepted(0L) === Set(300L, 301L), s"batch 0: ${accepted(0L)}")
      assert(accepted(1L) === Set(311L), s"batch 1: ${accepted(1L)}")
      assert(accepted(2L) === Set(322L), s"batch 2: ${accepted(2L)}")
      // every batch with accepted docs ran its maintenance slot
      assert(maintained.keySet === Set(0L, 1L, 2L))
      assert(maintained.values.forall(_.stage.startsWith("indexMaintain")))

      // all three indexes grew by exactly the accepted docs
      val bandIds = spark.table("g_maint_band")
        .select($"doc_id").distinct().as[Long].collect().toSet
      assert(bandIds === Set(10L, 11L, 12L, 13L, 300L, 301L, 311L, 322L))
      val keyIds = spark.table("g_maint_band_keys")
        .select($"doc_id").as[Long].collect().toSet
      assert(keyIds === bandIds, "keys table out of sync with band table")
      val lexDocs = spark.read.parquet(s"$lexDir/stats")
        .select($"n_docs").as[Long].head()
      assert(lexDocs === 8L, s"lex index n_docs $lexDocs")
      val ivfIds = spark.table("g_maint_ivf")
        .select($"vec_id").as[Long].collect().toSet
      assert(ivfIds === bandIds, "ivf index out of sync with band table")

      // compaction: probe output identical before/after, one file per
      // bucket afterwards (the in-loop threshold was 2.0, so some
      // compactions already ran; force a final pass and verify)
      val testBatch = Seq(
        (900L, "seven silver falcons circle the ancient observatory tower at dusk tonight"),
        (901L, "completely fresh probe text matching no indexed document at all today"))
        .toDF("doc_id", "text")
      def probe() = graft.ml.BandIndex.probe(spark, "g_maint_band",
          testBatch, n = 3, k = 12, bands = 4, threshold = 0.3)
        .orderBy($"doc_a", $"doc_b")
        .as[(Long, Long, Double)].collect().toSeq
      val before = probe()
      // the planted 900≈300 pair must be found via the APPENDED rows
      assert(before.exists(p => p._1 === 300L && p._2 === 900L),
        s"probe after maintenance missed the appended near-dup: $before")
      Seq("g_maint_band", "g_maint_band_keys").foreach { t =>
        graft.store.Bucketing.compactBucketed(spark, t)
        assert(graft.store.Bucketing.filesPerBucket(spark, t) <= 1.0,
          s"$t not packed to one file per bucket")
      }
      assert(probe() === before, "compaction changed probe output")
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_maint_band", "g_maint_band_keys",
        "g_maint_ivf", "g_maint_ivf_centroids", "g_maint_ivf_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain sig leg: cross-batch near-identical PNG caught FROM the SigIndex two appends later; compact_index preview lists its debt") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ml.{Multimodal, SigIndex}
    // real PNG payloads (the MlSpec perceptual-hash fixture recipe):
    // near-copies differ by a few scattered pixels — different BYTES,
    // aHash within 2 bits; distinct layouts are > 10 bits apart
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val v = f(x, y).max(0).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def noisy(f: (Int, Int) => Int): (Int, Int) => Int =
      (x, y) => if ((x * 64 + y) % 823 == 0) 0 else f(x, y)
    val imgA = (x: Int, y: Int) =>
      if (x >= 8 && x < 24 && y >= 8 && y < 24) 230 else (x + y) * 3 / 2
    val imgB = (x: Int, y: Int) =>
      if (x >= 40 && x < 60 && y >= 36 && y < 60) 10 else 200 - x
    val imgC = (x: Int, y: Int) => if ((x / 8 + y / 8) % 2 == 0) 240 else 15
    val imgD = (x: Int, y: Int) => if (y >= 32) 235 else x * 2
    val imgSeed = (x: Int, y: Int) => if (x >= 30 && x < 34) 250 else y * 3
    // sig attachment: decode the payload column to the aHash signature
    // (rows that fail to decode are simply not signature-screened)
    def sigFn(df: org.apache.spark.sql.DataFrame) =
      Multimodal.imageSignatures(
        df.select(col("doc_id").as("media_id"),
            lit("image/png").as("mime"), col("payload"),
            lit("s").as("source"))
          .as[Multimodal.MediaRow])
        .toDF().select(col("media_id").as("id"), col("ahash").as("sig"))
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_sig_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      SigIndex.write(
        sigFn(corpusDocs.withColumn("payload", lit(png(imgSeed)))),
        "id", "sig", "g_sig_idx", bands = 8, buckets = 4)

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String, Array[Byte])]
      val accepted = scala.collection.mutable.Map[Long, Set[Long]]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text", "payload"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_sig_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          compactAtFilesPerBucket = 1000.0, // let debt accumulate
          sigIndex = Some(CorpusPipeline.SigMaintenance("g_sig_idx",
            sigFn, maxDist = 2, bands = 8))),
        evalIdx, evalN = 3) { (batchId, acc, _) =>
        accepted.synchronized {
          accepted(batchId) = acc.select($"doc_id").as[Long].collect().toSet
          ()
        }
      }
      try {
        // batch 0: two novel texts, two distinct images — accepted
        input.addData(
          (300L, "seven silver falcons circle the ancient observatory tower at dusk tonight", png(imgA)),
          (301L, "migrating whales sing layered songs across the cold northern strait waters", png(imgB)))
        q.processAllAvailable()
        // batch 1: 310 = NOVEL text but near-copy of batch-0 image A —
        // only the sig index append makes this catchable; 311 novel
        input.addData(
          (310L, "granite cliffs hold nesting seabirds above the churning spring tide line", png(noisy(imgA))),
          (311L, "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil", png(imgC)))
        q.processAllAvailable()
        // batch 2: 320 ≈ batch-0 image B, 321 ≈ batch-1 image C — both
        // caught FROM THE INDEX two appends later; 322 novel
        input.addData(
          (320L, "lantern moths gather around the orchard shed lamps in the warm evening air", png(noisy(imgB))),
          (321L, "river otters slide down the muddy bank into the clear morning shallows", png(noisy(imgC))),
          (322L, "paper lanterns drift over the festival river while drummers keep gentle time", png(imgD)))
        q.processAllAvailable()
      } finally q.stop()

      assert(accepted(0L) === Set(300L, 301L), s"batch 0: ${accepted(0L)}")
      assert(accepted(1L) === Set(311L), s"batch 1: ${accepted(1L)}")
      assert(accepted(2L) === Set(322L), s"batch 2: ${accepted(2L)}")
      // the sig index grew by exactly the accepted docs
      val sigIds = spark.table("g_sig_idx")
        .select($"id").distinct().as[Long].collect().toSet
      assert(sigIds === Set(10L, 300L, 301L, 311L, 322L), sigIds.toString)

      // the appends accumulated measured files-per-bucket debt on the
      // sig table, and the serving surface's clean mode=compact_index
      // previews it (and packs it on confirm) like any index table
      val debt = graft.store.Bucketing.filesPerBucket(spark, "g_sig_idx")
      assert(debt > 1.0, s"expected append debt on g_sig_idx, got $debt")
      val s = new graft.api.Serve(GraftEngine(spark,
        java.nio.file.Files.createTempDirectory("g_sig_srv").toString))
      val prev = s.call("clean", Map("mode" -> "compact_index",
        "table" -> "g_sig_idx"))
      assert(prev.contains("\"preview\":true") &&
        prev.contains("\"table\":\"g_sig_idx\"") &&
        prev.contains("\"files_per_bucket\""), prev)
      val done = s.call("clean", Map("mode" -> "compact_index",
        "table" -> "g_sig_idx", "confirm" -> "true"))
      assert(done.contains("\"compacted\":[\"g_sig_idx\"]"), done)
      assert(graft.store.Bucketing.filesPerBucket(spark, "g_sig_idx") <= 1.0)
      // compaction preserved the probe: a near-copy of image D still
      // pairs with appended doc 322
      val probe = SigIndex.probe(spark, "g_sig_idx",
          Seq((900L, "x")).toDF("doc_id", "text")
            .withColumn("payload", lit(png(noisy(imgD))).cast("binary"))
            .transform(sigFn),
          "id", "sig", maxDist = 2, bands = 8)
        .as[(Long, Long, Int)].collect().toSet
      assert(probe.map(p => (p._1, p._2)) === Set((322L, 900L)), probe.toString)
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_sig_band", "g_sig_band_keys", "g_sig_idx")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("containmentDedupIndexed: batch dedups against the stored postings; corpus-side drop on both pair orientations, lower id survives in-batch") {
    import graft.ml.NgramIndex
    // corpus ids straddle the batch range (the nearDedupIndexed
    // orientation trick): 5 < 100 (corpus = doc_a), 900 > 150
    // (corpus = doc_b)
    val corpusDocs = Seq(
      (5L, "the quick brown fox jumps over the lazy dog while morning mist clings to the hedgerows"),
      (900L, "catalyst rewrites logical plans through rule batches until a fixed point emerges cleanly"),
      (7L, "unrelated corpus filler text that matches nothing in the arriving batch at all"))
      .toDF("doc_id", "text")
    val idxDir = java.nio.file.Files
      .createTempDirectory("g_cdi").toString + "/idx"
    NgramIndex.build(corpusDocs, idxDir, n = 4, dfMax = 64)
    val batch = Seq(
      // contained in corpus 5 (substring — Jaccard would read ~0.3)
      (100L, "jumps over the lazy dog while morning mist clings"),
      // contains corpus 900's core (corpus lands on doc_a side's complement)
      (150L, "catalyst rewrites logical plans through rule batches until a fixed point emerges"),
      // in-batch containment pair: 161 contains 160
      (160L, "fresh tidal charts guide the harbor pilots safely"),
      (161L, "fresh tidal charts guide the harbor pilots safely past the shifting winter sandbars"),
      (170L, "a novel batch document with entirely original content surviving the screen today"))
      .toDF("doc_id", "text")
    val p = CorpusPipeline(batch)
      .containmentDedupIndexed(idxDir, threshold = 0.6)
    val kept = p.docs.select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(160L, 170L), kept.toString)
    assert(p.stats.head.docsIn === 5 && p.stats.head.docsOut === 2)
  }

  test("ingestAndMaintain ngram leg: cross-batch CONTAINMENT dup (invisible to the minhash screen) caught FROM the stored postings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ml.NgramIndex
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val ngDir = java.nio.file.Files
      .createTempDirectory("g_ngmaint").toString + "/idx"
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_ng_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      NgramIndex.build(corpusDocs, ngDir, n = 4, dfMax = 64)

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val accepted = scala.collection.mutable.Map[Long, Set[Long]]()
      val stages = scala.collection.mutable.Map[Long, Vector[CorpusPipeline.StageStat]]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_ng_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          compactAtFilesPerBucket = 1000.0,
          ngramIndex = Some(CorpusPipeline.NgramMaintenance(ngDir,
            threshold = 0.6, dfCap = 50))),
        evalIdx, evalN = 3) { (batchId, acc, st) =>
        accepted.synchronized {
          accepted(batchId) = acc.select($"doc_id").as[Long].collect().toSet
          stages(batchId) = st
          ()
        }
      }
      // 300: a LONG novel doc; 301 short novel (not contained)
      val long300 =
        "granite cliffs hold nesting seabirds above the churning spring " +
          "tide line while distant trawlers drag silver nets through cold " +
          "morning water under wheeling hungry gulls"
      try {
        input.addData(
          300L -> long300,
          301L -> "terraced vineyards ripen slowly along volcanic hillsides")
        q.processAllAvailable()
        // batch 1: 310 = a CONTIGUOUS 10-token substring of 300 —
        // containment 1.0, Jaccard ≈ 7/22 grams < 0.3 → the minhash
        // screen passes it; only the appended postings catch it.
        // 311 novel.
        input.addData(
          310L -> "distant trawlers drag silver nets through cold morning water under",
          311L -> "paper lanterns drift over the festival river while drummers keep gentle time tonight")
        q.processAllAvailable()
        // batch 2: 320 = substring of batch-1's 311 (one append later);
        // 321 novel
        input.addData(
          320L -> "the festival river while drummers keep gentle time",
          321L -> "river otters slide down the muddy bank into clear shallows")
        q.processAllAvailable()
      } finally q.stop()

      assert(accepted(0L) === Set(300L, 301L), s"batch 0: ${accepted(0L)}")
      assert(accepted(1L) === Set(311L), s"batch 1: ${accepted(1L)}")
      assert(accepted(2L) === Set(321L), s"batch 2: ${accepted(2L)}")
      // the drop happened in the CONTAINMENT stage, not the minhash one
      val st1 = stages(1L)
      val near = st1.find(_.stage == "nearDedupScreen").get
      val cont = st1.find(_.stage == "containmentScreen").get
      assert(near.docsIn === 2 && near.docsOut === 2,
        s"minhash screen should pass both: $near")
      assert(cont.docsIn === 2 && cont.docsOut === 1,
        s"containment screen should drop 310: $cont")
      // postings grew by exactly the accepted docs
      val ids = spark.read.parquet(s"$ngDir/postings")
        .select(explode($"docs").as("id")).distinct()
        .as[Long].collect().toSet
      assert(ids === Set(10L, 300L, 301L, 311L, 321L), ids.toString)
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_ng_band", "g_ng_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain fuzzy leg: cross-batch near-identical TITLE on an otherwise-novel body (invisible to the content screens) caught FROM the stored title table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ml.FuzzyJoin
    val corpusDocs = Seq((10L,
      "daily market report covers grain futures with steady prices across exchanges this quarter"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    // title = first 6 tokens, block = first 2 (the q130 shape)
    val keyFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      d => d.select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("s"))
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_fz_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      graft.store.Bucketing.dropWithDir(spark, "g_fz_titles")
      FuzzyJoin.FuzzyIndex.write(keyFn(corpusDocs), "g_fz_titles",
        "doc_id", "s", col("blk"))

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val accepted = scala.collection.mutable.Map[Long, Set[Long]]()
      val stages = scala.collection.mutable.Map[Long, Vector[CorpusPipeline.StageStat]]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_fz_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          compactAtFilesPerBucket = 1000.0,
          fuzzyIndex = Some(CorpusPipeline.FuzzyMaintenance("g_fz_titles",
            keyFn, maxDist = 8))),
        evalIdx, evalN = 3) { (batchId, acc, st) =>
        accepted.synchronized {
          accepted(batchId) = acc.select($"doc_id").as[Long].collect().toSet
          stages(batchId) = st
          ()
        }
      }
      try {
        // batch 0: 400 novel; 401 = the CORPUS title modulo one word
        // (futures→options) on a body sharing nothing past word 6 —
        // whole-text Jaccard far under 0.3, so the minhash screen
        // passes it; only the seeded title table catches it
        input.addData(
          400L -> "quiet mountain villages welcome autumn hikers with warm bread and woolen blankets",
          401L -> "daily market report covers grain options while analysts debate the winter harvest outlook")
        q.processAllAvailable()
        // batch 1: 410 ≈ 400's title (hikers→walkers) on a novel body
        // — caught FROM the title table one append later; 411 novel
        input.addData(
          410L -> "quiet mountain villages welcome autumn walkers through misty orchards beyond the stone bridge",
          411L -> "copper kettles whistle softly on the old stove while rain taps the tin roof")
        q.processAllAvailable()
      } finally q.stop()

      assert(accepted(0L) === Set(400L), s"batch 0: ${accepted(0L)}")
      assert(accepted(1L) === Set(411L), s"batch 1: ${accepted(1L)}")
      // attribution: the minhash screen passed both batch-1 docs, the
      // fuzzy screen made the drop
      val st1 = stages(1L)
      val near = st1.find(_.stage == "nearDedupScreen").get
      val fz = st1.find(_.stage == "fuzzyTitleScreen").get
      assert(near.docsIn === 2 && near.docsOut === 2,
        s"minhash screen should pass both: $near")
      assert(fz.docsIn === 2 && fz.docsOut === 1,
        s"fuzzy screen should drop 410: $fz")
      // the title table grew by exactly the accepted docs
      val ids = spark.table("g_fz_titles")
        .select($"id").distinct().as[Long].collect().toSet
      assert(ids === Set(10L, 400L, 411L), ids.toString)
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_fz_band", "g_fz_band_keys", "g_fz_titles")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("concurrent screens are order-free on the replay-echo divergence class: an in-batch pair keeps its min id even when another leg drops the max (r19)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // The one serial-vs-concurrent divergence class (see the screen
    // slot scaladoc): doc x (id 500) is an exact dup of the band
    // corpus — the band leg drops it; the sig index ALREADY holds x
    // (a replay echo: sig append committed, band append didn't); doc
    // y (id 400) is a token PERMUTATION of x — identical simhash
    // (token-bag feature), near-zero 3-shingle jaccard, so only the
    // sig leg pairs (x_stored, y). The old serial chain classified
    // that pair against the band leg's SURVIVORS ({y}) — x looked
    // like a corpus side and y was dropped, leaving NOTHING of a
    // cluster whose only stored evidence was itself rejected. The
    // order-free contract classifies against the full batch: (x, y)
    // is an in-batch pair, the max id drops, y — the cluster's one
    // representative — survives.
    val bandText =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val permText =
      "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    val sigFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      d => graft.ml.TextDedup.simhashSignatures(d)
        .select(col("doc_id").as("id"), col("simhash").as("sig"))
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    try {
      graft.ml.BandIndex.write(
        Seq((1L, bandText)).toDF("doc_id", "text"),
        "g_oof_band", n = 3, k = 12, bands = 4, buckets = 4)
      graft.store.Bucketing.dropWithDir(spark, "g_oof_sig")
      // the replay echo: x's signature is already stored
      graft.ml.SigIndex.write(
        sigFn(Seq((500L, bandText)).toDF("doc_id", "text")),
        "id", "sig", "g_oof_sig", bands = 8, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val accepted = scala.collection.mutable.Set[Long]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.0,
        CorpusPipeline.IndexMaintenance("g_oof_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          sigIndex = Some(CorpusPipeline.SigMaintenance("g_oof_sig",
            sigFn, maxDist = 2, bands = 8))),
        evalIdx, evalN = 3) { (_, acc, _) =>
        accepted.synchronized {
          accepted ++= acc.select($"doc_id").as[Long].collect(); () }
      }
      try {
        input.addData(500L -> bandText, 400L -> permText)
        q.processAllAvailable()
        assert(q.exception.isEmpty, s"stream died: ${q.exception}")
        assert(accepted.toSet === Set(400L),
          s"in-batch pair must keep min id 400: $accepted")
      } finally q.stop()
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_oof_band", "g_oof_band_keys", "g_oof_sig")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain KMV telemetry: per-batch distinct-vocabulary deltas; saturated batch reads zero, drift batch reads its new-token count") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val monDir = java.nio.file.Files.createTempDirectory("g_kmvtel").toString
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_tel_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      // monitor: distinct TOKENS over the accepted batch (one global
      // group) — the vocabulary-growth cue
      val tokMon: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        d => d.select(lit("tokens").as("g"),
          explode(split(col("text"), " ")).as("v"))
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val tele = scala.collection.mutable.ArrayBuffer[(Long, CorpusPipeline.StageStat)]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_tel_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          compactAtFilesPerBucket = 1000.0,
          kmvTelemetry = Some(CorpusPipeline.KmvTelemetry(monDir,
            Seq("tokens" -> tokMon), k = 256, buckets = 8))),
        evalIdx, evalN = 3,
        onMaintain = (id, st) => tele.synchronized {
          if (st.stage.startsWith("kmvMonitor")) { tele += ((id, st)); () }
        }) { (_, _, _) => () }
      try {
        // batch 0: vocabulary A (12 distinct tokens across both docs)
        input.addData(
          300L -> "silver falcon circles the old stone tower at dusk",
          301L -> "the old falcon watches silver stars from stone tower")
        q.processAllAvailable()
        // batch 1: SAME vocabulary recombined (novel shingles — the
        // near-dup screen keeps them; zero new tokens)
        input.addData(
          310L -> "stone stars circle the silver tower at old dusk",
          311L -> "dusk falcon watches the tower from silver stone stars")
        q.processAllAvailable()
        // batch 2: fresh vocabulary (only 'the' recurs) — genuine drift
        input.addData(
          320L -> "quantum looms weave the probabilistic tapestries inside their humming vaults")
        q.processAllAvailable()
      } finally q.stop()

      val byBatch = tele.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      assert(byBatch.keySet === Set(0L, 1L, 2L), byBatch.toString)
      def delta(id: Long): Long = {
        val st = byBatch(id).head
        st.docsOut - st.docsIn
      }
      // batch 0 seeds the state: delta = its full distinct vocabulary
      val vocabA = Set("silver", "falcon", "circles", "the", "old",
        "stone", "tower", "at", "dusk", "watches", "stars", "from")
      assert(delta(0L) === vocabA.size.toLong, byBatch(0L).toString)
      // batch 1: same vocabulary plus 'circle' — near-saturated
      assert(delta(1L) === 1L, byBatch(1L).toString)
      // batch 2: every token but 'the' is new
      assert(delta(2L) === 9L, byBatch(2L).toString)
      // the stored state equals the direct sketch of everything folded
      val live = graft.ml.Sketches.finalizeKmv(
          spark.read.parquet(s"$monDir/tokens"), "g", 256)
        .select($"n_mins").as[Long].head()
      assert(live === vocabA.size + 1L + 9L)
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_tel_band", "g_tel_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain export cadence: shard export refreshes on measured debt and matches the accepted corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"),
      (11L, "eleven elephants wander dusty savannah trails seeking distant water holes"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files.createTempDirectory("g_exp_store").toString + "/corpus"
    val exportDir = java.nio.file.Files.createTempDirectory("g_exp_out").toString + "/shards"
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_exp_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val maintained = scala.collection.mutable.ListBuffer[(Long, String)]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_exp_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          exportTo = Some(CorpusPipeline.ExportCadence(exportDir, nShards = 2,
            corpus = s => s.read.parquet(storeDir), staleFraction = 0.5))),
        evalIdx, evalN = 3,
        onMaintain = (id, st) => maintained.synchronized {
          maintained += ((id, st.stage)); () }) { (_, acc, _) =>
        // the caller's corpus store: accepted docs land as parquet
        acc.select($"doc_id", $"text").write.mode("append").parquet(storeDir)
      }
      try {
        // batch 0: 2 accepted, no live export -> infinitely stale ->
        // first export fires with exactly the stored corpus
        input.addData(
          300L -> "seven silver falcons circle the ancient observatory tower at dusk tonight",
          301L -> "migrating whales sing layered songs across the cold northern strait waters")
        q.processAllAvailable()
        assert(graft.ml.ShardExport.readManifest(spark, exportDir)
          .agg(sum($"n_docs")).head().getLong(0) === 2L)
        // batch 1: 1 accepted -> debt 1 over live 2 = 0.5 >= 0.5 ->
        // export refreshes to 3 docs
        input.addData(
          311L -> "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil")
        q.processAllAvailable()
        assert(graft.ml.ShardExport.readManifest(spark, exportDir)
          .agg(sum($"n_docs")).head().getLong(0) === 3L)
        // batch 2: 1 accepted -> debt 1 over live 3 < 0.5 -> NOT due;
        // the export intentionally stays at 3 docs
        input.addData(
          322L -> "paper lanterns drift over the festival river while drummers keep gentle time")
        q.processAllAvailable()
        assert(graft.ml.ShardExport.readManifest(spark, exportDir)
          .agg(sum($"n_docs")).head().getLong(0) === 3L)
      } finally q.stop()
      // exactly two export events, both after their batch's index work
      val exports = maintained.toList.filter(_._2.startsWith("shardExport"))
      assert(exports.map(_._1) === List(0L, 1L), s"export events: $maintained")
      assert(maintained.toList.filter(_._2.startsWith("indexMaintain"))
        .map(_._1) === List(0L, 1L, 2L))
      // the live export's content equals the accepted corpus at its
      // last refresh (doc set, not just counts)
      val exported = graft.ml.ShardExport.read(spark, exportDir)
        .select($"doc_id").as[Long].collect().toSet
      assert(exported === Set(300L, 301L, 311L))
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_exp_band", "g_exp_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain export: a fully-screened-out first batch must not poison the export dir (r19 advice)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the r18 failure: batch 0 with zero accepts persisted the debt
    // clock INSIDE the not-yet-created export dir; every later batch
    // (and every restart) then died reading a manifest that wasn't
    // there. The debt clock now lives in a sibling state dir.
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files.createTempDirectory("g_poi_store").toString + "/corpus"
    val exportDir = java.nio.file.Files.createTempDirectory("g_poi_out").toString + "/shards"
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_poi_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_poi_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          exportTo = Some(CorpusPipeline.ExportCadence(exportDir, nShards = 2,
            corpus = s => s.read.parquet(storeDir), staleFraction = 0.5))),
        evalIdx, evalN = 3) { (_, acc, _) =>
        if (!acc.isEmpty)
          acc.select($"doc_id", $"text").write.mode("append").parquet(storeDir)
      }
      try {
        // batch 0: an exact dup of the seeded corpus — the near-dup
        // screen drops it, zero accepts, no export due
        input.addData(
          500L -> "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening")
        q.processAllAvailable()
        assert(!new java.io.File(exportDir).exists(),
          "a batch with zero accepts must not create (poison) the export dir")
        // batch 1: a novel doc — accepts, and the export must land
        // (pre-fix this died in readManifest of the poisoned dir)
        input.addData(
          501L -> "migrating whales sing layered songs across the cold northern strait waters")
        q.processAllAvailable()
        assert(q.exception.isEmpty, s"stream died: ${q.exception}")
        assert(graft.ml.ShardExport.readManifest(spark, exportDir)
          .agg(sum($"n_docs")).head().getLong(0) === 1L)
        // the debt clock lives in the SIBLING state dir, not inside
        // the export
        assert(new java.io.File(exportDir + ".state_", "export_debt").exists(),
          "debt clock must persist in the sibling state dir")
        assert(!new java.io.File(exportDir, ".export_debt").exists(),
          "no debt clock inside the export dir")
      } finally q.stop()
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_poi_band", "g_poi_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain IVF cadence: measured debt gates the check; drift from shifted batches fires a rebuild in the loop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // embedder with a planted distribution shift: docs with id >= 500
    // land 1000 units away from the base population — the
    // drift-inducing batch of the IvfIndexSpec driftStats test, in
    // streaming form
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("vec_id"), lit("x").as("label"),
        array((1 to 4).map(i =>
          ((pmod(hash(col("doc_id") * i), lit(97)) + 1).cast("float") +
            when(col("doc_id") >= 500L, lit(1000.0f)).otherwise(lit(0.0f)))): _*)
          .as("embedding"))
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"),
      (11L, "eleven elephants wander dusty savannah trails seeking distant water holes"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_ivfm_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      // IVF population: 100 base-distribution vectors, so the write-time
      // baseline is representative and in-distribution appends hold
      // drift ≈ 1 (the 4-doc band corpus would over-fit the baseline)
      graft.ml.IvfIndex.write(
        embed(spark.range(0, 100).select($"id".as("doc_id"))),
        "g_ivfm_ivf", cells = 4, iters = 2, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val maintained = scala.collection.mutable.ListBuffer[(Long, String)]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_ivfm_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          ivfTable = Some("g_ivfm_ivf"), embed = embed,
          // base is first read POST-append (102): debt 2/102 ≈ 0.0196
          // >= 0.015, so the check runs every 2-doc batch
          ivfMaintain = Some(CorpusPipeline.IvfMaintainCadence(
            checkFraction = 0.015, driftThreshold = 1.5))),
        evalIdx, evalN = 3,
        onMaintain = (id, st) => maintained.synchronized {
          maintained += ((id, st.stage)); () }) { (_, _, _) => () }
      try {
        // batch 0: in-distribution docs — check fires (debt ratio at
        // threshold) and measures quiet drift: NO rebuild
        input.addData(
          300L -> "seven silver falcons circle the ancient observatory tower at dusk tonight",
          301L -> "migrating whales sing layered songs across the cold northern strait waters")
        q.processAllAvailable()
        // batch 1: shifted docs (>= 500 ⇒ +1000 offset) — the check
        // measures inflated drift and fires a rebuild IN the loop
        input.addData(
          510L -> "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil",
          511L -> "paper lanterns drift over the festival river while drummers keep gentle time")
        q.processAllAvailable()
      } finally q.stop()
      val checks = maintained.toList.filter(_._2.startsWith("ivfMaintain"))
      assert(checks.map(_._1) === List(0L, 1L), s"cadence events: $maintained")
      assert(checks(0)._2.startsWith("ivfMaintain(rebuilt=false"), checks(0)._2)
      assert(checks(1)._2.startsWith("ivfMaintain(rebuilt=true: drift"), checks(1)._2)
      // the rebuild retrained centroids over the shifted population:
      // geometry is repaired and no vectors were lost
      assert(graft.ml.IvfIndex.driftStats(spark, "g_ivfm_ivf").ratio < 1.5)
      assert(spark.table("g_ivfm_ivf").select($"vec_id").distinct().count() === 104L)
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_ivfm_band", "g_ivfm_band_keys",
        "g_ivfm_ivf", "g_ivfm_ivf_centroids", "g_ivfm_ivf_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("streaming chunk stage: micro-batch chunks equal the batch stage") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusDocs = corpus.filter($"doc_id" =!= 1L && $"doc_id" =!= 8L)
      .select($"doc_id", $"text")
    val dedupIdx = graft.streaming.StreamingDedup
      .indexCorpus(corpusDocs, n = 3, k = 12, bands = 4)
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    // a 20-token clean novel doc: at chunk(8/6) it must emit 3 windows
    val longText = "the little caravan of traders slowly crossed seven " +
      "windy plateaus before reaching its quiet destination near the old stone bridge"

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    var got: Seq[(Long, Long, Long, String)] = Seq.empty
    var st: Vector[CorpusPipeline.StageStat] = Vector.empty
    val q = CorpusPipeline.streaming(
      input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
      dedupIdx, n = 3, k = 12, bands = 4, threshold = 0.3, minAgree = 0,
      evalIdx, evalN = 3, chunkTo = Some((8, 6))) { (_, acc, stats) =>
      this.synchronized {
        got = acc.select($"doc_id", $"orig_doc_id", $"chunk_id", $"text")
          .as[(Long, Long, Long, String)].collect().toSeq.sorted
        st = stats
      }
    }
    try {
      input.addData(500L -> longText)
      q.processAllAvailable()
    } finally q.stop()

    val want = CorpusPipeline(Seq((500L, longText)).toDF("doc_id", "text"))
      .chunk(sizeTokens = 8, stride = 6)
      .docs.select($"doc_id", $"orig_doc_id", $"chunk_id", $"text")
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(want.length === 3)
    assert(got === want, "streaming chunks diverged from the batch stage")
    // the chunk stage reports in the stats chain: 1 doc in, 3 chunks out
    assert(st.last.stage === "chunk(8/6)")
    assert(st.last.docsIn === 1 && st.last.docsOut === 3)
    evalIdx.grams.unpersist()
  }

  test("ingestAndMaintain admission stage: rule-violating rows quarantined before the content screens, counted in stats") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_adm_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      var accepted = Set.empty[Long]
      var st = Vector.empty[CorpusPipeline.StageStat]
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_adm_band",
          n = 3, k = 12, bands = 4, threshold = 0.3),
        evalIdx, evalN = 3,
        admission = Seq(
          graft.analytics.DataQuality.InRange("doc_id", 0, 1e9),
          graft.analytics.DataQuality.NotNull("text"))) { (_, acc, stats) =>
        accepted ++= acc.select($"doc_id").as[Long].collect().toSet
        st = stats
      }
      try {
        // doc -5 has perfectly fine TEXT (the quality gate would pass
        // it) but violates the id-range rule — only admission drops it
        input.addData(
          -5L -> "eleven elephants wander dusty savannah trails seeking distant water holes",
          301L -> "migrating whales sing layered songs across the cold northern strait waters")
        q.processAllAvailable()
      } finally q.stop()
      assert(accepted === Set(301L), s"admission must drop doc -5: $accepted")
      assert(st.head.stage === "admission(2)" &&
        st.head.docsIn === 2 && st.head.docsOut === 1, st)
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_adm_band", "g_adm_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain restart: export debt accrued before a restart is seeded from durable state, not forgotten") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"),
      (11L, "eleven elephants wander dusty savannah trails seeking distant water holes"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files.createTempDirectory("g_rst_store").toString + "/corpus"
    val exportDir = java.nio.file.Files.createTempDirectory("g_rst_out").toString + "/shards"
    def start(input: MemoryStream[(Long, String)]) =
      CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_rst_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          exportTo = Some(CorpusPipeline.ExportCadence(exportDir, nShards = 2,
            corpus = s => s.read.parquet(storeDir), staleFraction = 0.6))),
        evalIdx, evalN = 3) { (_, acc, _) =>
        acc.select($"doc_id", $"text").write.mode("append").parquet(storeDir)
      }
    def exportedDocs(): Long =
      graft.ml.ShardExport.readManifest(spark, exportDir)
        .agg(sum($"n_docs")).head().getLong(0)
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_rst_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val in1 = MemoryStream[(Long, String)]
      val q1 = start(in1)
      try {
        // incarnation 1: first export fires (no live export), then one
        // accepted batch stays UNDER the staleness threshold — real
        // debt (1 doc) exists only in the driver var when we stop
        in1.addData(
          300L -> "seven silver falcons circle the ancient observatory tower at dusk tonight",
          301L -> "migrating whales sing layered songs across the cold northern strait waters")
        q1.processAllAvailable()
        assert(exportedDocs() === 2L)
        in1.addData(
          311L -> "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil")
        q1.processAllAvailable()
        assert(exportedDocs() === 2L, "debt 1/2 < 0.6 must not re-export")
      } finally q1.stop()
      // incarnation 2 (the restart): zero-seeded vars would read this
      // batch's debt as 1/2 < 0.6 and defer again — forever, under
      // restarts more frequent than the cadence. The durable seed
      // (stored corpus 4 − live manifest 2 = 2 ≥ 0.6·2) re-exports.
      val in2 = MemoryStream[(Long, String)]
      val q2 = start(in2)
      try {
        in2.addData(
          322L -> "paper lanterns drift over the festival river while drummers keep gentle time")
        q2.processAllAvailable()
        assert(exportedDocs() === 4L,
          "restart must seed export debt from corpus − manifest")
        val exported = graft.ml.ShardExport.read(spark, exportDir)
          .select($"doc_id").as[Long].collect().toSet
        assert(exported === Set(300L, 301L, 311L, 322L))
      } finally q2.stop()
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_rst_band", "g_rst_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain restart: a pre-r19 in-dir debt clock is read as migration fallback and re-persisted to the sibling state dir") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files.createTempDirectory("g_mig_store").toString + "/corpus"
    val exportDir = java.nio.file.Files.createTempDirectory("g_mig_out").toString + "/shards"
    def start(input: MemoryStream[(Long, String)]) =
      CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_mig_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          exportTo = Some(CorpusPipeline.ExportCadence(exportDir, nShards = 2,
            corpus = s => s.read.parquet(storeDir), staleFraction = 0.6))),
        evalIdx, evalN = 3) { (_, acc, _) =>
        if (!acc.isEmpty)
          acc.select($"doc_id", $"text").write.mode("append").parquet(storeDir)
      }
    def exportedDocs(): Long =
      graft.ml.ShardExport.readManifest(spark, exportDir)
        .agg(sum($"n_docs")).head().getLong(0)
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_mig_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val in1 = MemoryStream[(Long, String)]
      val q1 = start(in1)
      try {
        // inc 1: two accepted -> first export (2 docs), debt 0 persisted
        in1.addData(
          300L -> "seven silver falcons circle the ancient observatory tower at dusk tonight",
          301L -> "migrating whales sing layered songs across the cold northern strait waters")
        q1.processAllAvailable()
        assert(exportedDocs() === 2L)
      } finally q1.stop()
      // rewrite history to the PRE-r19 layout: debt clock INSIDE the
      // export dir, no sibling state dir. Value 0 makes the two seed
      // paths distinguishable by OUTCOME after one more accept:
      // legacy-read seed = 0 + nA(1) -> 1/2 < 0.6 -> no export;
      // ignoring the legacy file would fall back to |corpus(3) −
      // live(2)| = 1 ... with nA subsumed the delta path ALSO reads 1
      // — so plant corpus drift too: write an extra doc straight into
      // the store (an out-of-band backfill), making the delta read
      // |4 − 2| = 2 ≥ 0.6·2 -> export. Staying at 2 docs proves the
      // legacy clock was read.
      Seq((900L, "out of band backfill document the live manifest has never seen"))
        .toDF("doc_id", "text").write.mode("append").parquet(storeDir)
      val legacy = new java.io.File(exportDir, ".export_debt")
      val out = new java.io.FileOutputStream(legacy)
      out.write("0".getBytes("UTF-8")); out.close()
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(exportDir + ".state_"))
      val in2 = MemoryStream[(Long, String)]
      val q2 = start(in2)
      try {
        in2.addData(
          311L -> "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil")
        q2.processAllAvailable()
        assert(q2.exception.isEmpty, s"stream died: ${q2.exception}")
        assert(exportedDocs() === 2L,
          "legacy in-dir debt clock must seed the restart (0 + 1 accept < threshold)")
        // and the clock migrated: sibling carries the post-batch debt
        assert(new java.io.File(exportDir + ".state_", "export_debt").exists(),
          "debt must re-persist to the sibling state dir")
      } finally q2.stop()
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_mig_band", "g_mig_band_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain restart: IVF check debt survives a restart via the persisted check-base table property") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("vec_id"), lit("x").as("label"),
        array((1 to 4).map(i =>
          (pmod(hash(col("doc_id") * i), lit(97)) + 1).cast("float")): _*)
          .as("embedding"))
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"),
      (11L, "eleven elephants wander dusty savannah trails seeking distant water holes"))
      .toDF("doc_id", "text")
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val maintained = scala.collection.mutable.ListBuffer[String]()
    def start(input: MemoryStream[(Long, String)]) =
      CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_rsti_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          ivfTable = Some("g_rsti_ivf"), embed = embed,
          ivfMaintain = Some(CorpusPipeline.IvfMaintainCadence(
            checkFraction = 0.3, driftThreshold = 100.0))),
        evalIdx, evalN = 3,
        onMaintain = (_, st) => maintained.synchronized {
          maintained += st.stage; () }) { (_, _, _) => () }
    def checkBase(): String = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("g_rsti_ivf"))
      .properties.getOrElse("graft.ivf.checkBase", "absent")
    try {
      graft.ml.BandIndex.write(corpusDocs, "g_rsti_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      graft.ml.IvfIndex.write(
        embed(spark.range(0, 6).select($"id".as("doc_id"))),
        "g_rsti_ivf", cells = 2, iters = 2, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val in1 = MemoryStream[(Long, String)]
      val q1 = start(in1)
      try {
        // incarnation 1: 1 append over base 6 → debt 1/6 < 0.3, no
        // check; the PRE-batch population is stamped durably
        in1.addData(
          300L -> "seven silver falcons circle the ancient observatory tower at dusk tonight")
        q1.processAllAvailable()
        assert(!maintained.exists(_.startsWith("ivfMaintain")),
          s"no check expected below threshold: $maintained")
        assert(checkBase() === "6")
      } finally q1.stop()
      // incarnation 2: zero-seeded debt would read 1/6 < 0.3 and defer
      // again; the property seeds true debt (8 − 6 = 2)/6 ≥ 0.3 → the
      // check fires and re-bases the durable clock at 8
      val in2 = MemoryStream[(Long, String)]
      val q2 = start(in2)
      try {
        in2.addData(
          301L -> "migrating whales sing layered songs across the cold northern strait waters")
        q2.processAllAvailable()
        assert(maintained.exists(_.startsWith("ivfMaintain(rebuilt=false")),
          s"seeded debt must fire the check: $maintained")
        assert(checkBase() === "8")
      } finally q2.stop()
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_rsti_band", "g_rsti_band_keys",
        "g_rsti_ivf", "g_rsti_ivf_centroids", "g_rsti_ivf_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("ingestAndMaintain with EVERY leg attached: the per-batch screen is exactly quality + 4 stored-index probes + decontaminate (r16 — the composition Bench's ingest_screen_sec times)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("vec_id"), lit("x").as("label"),
        array((1 to 4).map(i =>
          (pmod(hash(col("doc_id") * i), lit(97)) + 1).cast("float")): _*)
          .as("embedding"))
    def sigFn(df: org.apache.spark.sql.DataFrame) =
      graft.ml.TextDedup.simhashSignatures(df)
        .select(col("doc_id").as("id"), col("simhash").as("sig"))
    val keyFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      d => d.select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("s"))
    val corpusDocs = Seq(
      (10L, "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"),
      (11L, "eleven elephants wander dusty savannah trails seeking distant water holes"))
      .toDF("doc_id", "text")
    val lexDir = java.nio.file.Files.createTempDirectory("g_all_lex").toString
    val ngDir = java.nio.file.Files.createTempDirectory("g_all_ng").toString
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    try {
      Seq("g_all_band", "g_all_band_keys", "g_all_ivf", "g_all_sig",
        "g_all_fuzzy")
        .foreach(t => graft.store.Bucketing.dropWithDir(spark, t))
      graft.ml.BandIndex.write(corpusDocs, "g_all_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      graft.ml.LexIndex.build(corpusDocs, lexDir)
      graft.ml.IvfIndex.write(embed(corpusDocs), "g_all_ivf",
        cells = 2, iters = 0, buckets = 4)
      graft.ml.SigIndex.write(sigFn(corpusDocs), "id", "sig", "g_all_sig",
        bands = 8, buckets = 4)
      graft.ml.NgramIndex.build(corpusDocs, ngDir, n = 4, dfMax = 64)
      graft.ml.FuzzyJoin.FuzzyIndex.write(keyFn(corpusDocs), "g_all_fuzzy",
        "doc_id", "s", col("blk"))

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val accepted = scala.collection.mutable.Map[Long, Set[Long]]()
      val stages = scala.collection.mutable.Map[Long, Vector[CorpusPipeline.StageStat]]()
      val maintained = scala.collection.mutable.Map[Long, CorpusPipeline.StageStat]()
      val slotStats = scala.collection.mutable.ListBuffer[CorpusPipeline.StageStat]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_all_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          lexIndexDir = Some(lexDir), ivfTable = Some("g_all_ivf"),
          embed = embed, compactAtFilesPerBucket = 1000.0,
          sigIndex = Some(CorpusPipeline.SigMaintenance("g_all_sig",
            sigFn, maxDist = 2, bands = 8)),
          ngramIndex = Some(CorpusPipeline.NgramMaintenance(ngDir,
            threshold = 0.6, dfCap = 50)),
          fuzzyIndex = Some(CorpusPipeline.FuzzyMaintenance("g_all_fuzzy",
            keyFn, maxDist = 8))),
        evalIdx, evalN = 3,
        onMaintain = (id, st) => maintained.synchronized {
          if (st.stage.startsWith("screenSlot")) slotStats += st
          else maintained(id) = st
          () }) { (batchId, acc, st) =>
        accepted.synchronized {
          accepted(batchId) = acc.select($"doc_id").as[Long].collect().toSet
          stages(batchId) = st
          ()
        }
      }
      try {
        input.addData(
          500L -> "seven silver falcons circle the ancient observatory tower at dusk tonight",
          501L -> "migrating whales sing layered songs across the cold northern strait waters")
        q.processAllAvailable()
      } finally q.stop()
      assert(accepted(0L) === Set(500L, 501L))
      // THE contract Bench's ingest_screen_sec metric times: with all
      // six legs attached, every batch runs exactly these stages in
      // this order — four stored-index PROBES (band, sig, ngram,
      // fuzzy) bracketed by the quality gate and the decontamination
      // screen; lex/ivf touch the batch only in the maintenance slot
      assert(stages(0L).map(_.stage) === Vector(
        "quality>=0.5", "nearDedupScreen", "sigDedupScreen",
        "containmentScreen", "fuzzyTitleScreen", "decontaminateScreen"),
        stages(0L).map(_.stage).toString)
      assert(maintained.contains(0L), "maintenance slot must run")
      // every stage carries a real (non-negative) clock — the metric
      // sums these, so a stage that stopped timing would silently
      // shrink the Bench artifact
      assert(stages(0L).forall(_.secs >= 0.0))
      // the maintenance stat names every leg's own clock (r16): with
      // all six legs attached, lex/ivf/sig/ngram/fuzzy/band/compact
      // must each appear — the attribution Bench's stderr line reads
      val mstage = maintained(0L).stage
      Seq("lex=", "ivf=", "sig=", "ngram=", "fuzzy=", "band=", "compact=")
        .foreach(leg => assert(mstage.contains(leg), s"$leg missing: $mstage"))
      // r19: the screen-slot WALL event — five concurrent legs, slot
      // in/out spanning the whole screen chain; this is the stat
      // Bench's ingest_screen_sec composes from (per-leg clocks
      // overlap and may sum past it)
      val slot = slotStats.toList
      assert(slot.map(_.stage) === List("screenSlot(legs=5)"), slot.toString)
      assert(slot.head.docsIn === 2L && slot.head.docsOut === 2L, slot.toString)
      assert(slot.head.secs >= 0.0)
    } finally {
      evalIdx.grams.unpersist()
      Seq("g_all_band", "g_all_band_keys", "g_all_ivf",
        "g_all_ivf_centroids", "g_all_ivf_stats", "g_all_sig", "g_all_fuzzy")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("forget: one call tombstones every configured index — no screen or probe mentions the deleted doc; compactForgotten clears all sets without changing results") {
    def embed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id").as("vec_id"), lit("x").as("label"),
        array((1 to 4).map(i =>
          (pmod(hash(col("doc_id") * i), lit(97)) + 1).cast("float")): _*)
          .as("embedding"))
    def sigFn(df: org.apache.spark.sql.DataFrame) =
      graft.ml.TextDedup.simhashSignatures(df)
        .select(col("doc_id").as("id"), col("simhash").as("sig"))
    val keyFn: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      d => d.select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("s"))
    val victimText =
      "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"
    val corpusDocs = Seq(
      (10L, victimText),
      (11L, "eleven elephants wander dusty savannah trails seeking distant water holes"))
      .toDF("doc_id", "text")
    // the probe batch: 90 is a near-dup of 10 on every signal (same
    // text modulo the final word)
    val batch = Seq((90L,
      "crimson harbors shelter weary sailors beneath amber lighthouse beams each morning"))
      .toDF("doc_id", "text")
    val lexDir = java.nio.file.Files.createTempDirectory("g_fgt_lex").toString
    val ngDir = java.nio.file.Files.createTempDirectory("g_fgt_ng").toString
    val maint = CorpusPipeline.IndexMaintenance("g_fgt_band",
      n = 3, k = 12, bands = 4, threshold = 0.3,
      lexIndexDir = Some(lexDir), ivfTable = Some("g_fgt_ivf"),
      embed = embed,
      sigIndex = Some(CorpusPipeline.SigMaintenance("g_fgt_sig",
        sigFn, maxDist = 16, bands = 32)),
      ngramIndex = Some(CorpusPipeline.NgramMaintenance(ngDir,
        threshold = 0.6, dfCap = 50)),
      fuzzyIndex = Some(CorpusPipeline.FuzzyMaintenance("g_fgt_fuzzy",
        keyFn, maxDist = 8)))
    def mentions10: Map[String, Boolean] = Map(
      "band" -> graft.ml.BandIndex.probe(spark, "g_fgt_band", batch,
        n = 3, k = 12, bands = 4, threshold = 0.3)
        .filter($"doc_a" === 10L || $"doc_b" === 10L).count().>(0L),
      "sig" -> graft.ml.SigIndex.probe(spark, "g_fgt_sig", sigFn(batch),
        "id", "sig", maxDist = 16, bands = 32)
        .filter($"id_a" === 10L || $"id_b" === 10L).count().>(0L),
      "ngram" -> graft.ml.NgramIndex.probeContainment(spark, ngDir,
        batch.withColumn("doc_id", $"doc_id".cast("int")), threshold = 0.6,
        dfCap = 50)
        .filter($"doc_a" === 10 || $"doc_b" === 10).count().>(0L),
      "fuzzy" -> graft.ml.FuzzyJoin.FuzzyIndex.probe(spark, "g_fgt_fuzzy",
        keyFn(batch), "doc_id", "s", col("blk"), maxDist = 8)
        .filter($"id_a" === 10L || $"id_b" === 10L).count().>(0L),
      "lex" -> graft.ml.LexIndex.probeText(spark, lexDir,
        Seq((900L, victimText)), k = 5)
        .filter($"doc_id" === 10L).count().>(0L),
      "ivf" -> graft.ml.IvfIndex.probe(spark, "g_fgt_ivf",
        embed(batch), k = 2, nprobe = 2)
        .filter($"cand_id" === 10L).count().>(0L))
    try {
      Seq("g_fgt_band", "g_fgt_band_keys", "g_fgt_ivf", "g_fgt_sig",
        "g_fgt_fuzzy").foreach(t => graft.store.Bucketing.dropWithDir(spark, t))
      graft.ml.BandIndex.write(corpusDocs, "g_fgt_band", n = 3, k = 12,
        bands = 4, buckets = 4)
      graft.ml.LexIndex.build(corpusDocs, lexDir)
      graft.ml.IvfIndex.write(embed(corpusDocs), "g_fgt_ivf",
        cells = 2, iters = 0, buckets = 4)
      graft.ml.SigIndex.write(sigFn(corpusDocs), "id", "sig", "g_fgt_sig",
        bands = 32, buckets = 4)
      graft.ml.NgramIndex.build(corpusDocs, ngDir, n = 4, dfMax = 64)
      graft.ml.FuzzyJoin.FuzzyIndex.write(keyFn(corpusDocs), "g_fgt_fuzzy",
        "doc_id", "s", col("blk"))
      // every probe finds the victim pre-forget — the fixture is live
      val pre = mentions10
      assert(pre.values.forall(identity), s"fixture must bite: $pre")
      CorpusPipeline.forget(spark, maint, Seq(10L).toDF("doc_id"))
      val post = mentions10
      assert(post.values.forall(!_), s"forgotten everywhere: $post")
      // the OTHER doc is unaffected: lex still retrieves 11
      assert(graft.ml.LexIndex.probeText(spark, lexDir,
        Seq((901L, "eleven elephants savannah")), k = 5)
        .filter($"doc_id" === 11L).count() > 0L)
      // idempotent feed
      CorpusPipeline.forget(spark, maint, Seq(10L, 10L).toDF("doc_id"))
      // physical cleanup: every set cleared, results unchanged
      CorpusPipeline.compactForgotten(spark, maint)
      Seq("g_fgt_band_tombstones", "g_fgt_ivf_tombstones",
        "g_fgt_sig_tombstones", "g_fgt_fuzzy_tombstones")
        .foreach(t => assert(!spark.catalog.tableExists(t), t))
      assert(!new java.io.File(s"$lexDir/tombstones").exists)
      assert(!new java.io.File(s"$ngDir/tombstones").exists)
      val compacted = mentions10
      assert(compacted.values.forall(!_), s"still forgotten: $compacted")
    } finally {
      Seq("g_fgt_band", "g_fgt_band_keys", "g_fgt_ivf",
        "g_fgt_ivf_centroids", "g_fgt_ivf_stats", "g_fgt_sig", "g_fgt_fuzzy")
        .flatMap(t => Seq(t, t + "_tombstones", t + "__new", t + "__old"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("forget feed: requests drain at batch cadence through store+index; re-crawls of forgotten docs are opt-out screened; drained requests never re-process") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val victim =
      "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files
      .createTempDirectory("g_ff_store").toString + "/corpus"
    val feedDir = java.nio.file.Files
      .createTempDirectory("g_ff_feed").toString + "/requests"
    // the feed starts EMPTY but typed (a compliance process appends)
    Seq.empty[(Long, Long)].toDF("req_id", "doc_id")
      .write.parquet(feedDir)
    def addReq(reqId: Long, docId: Long): Unit =
      Seq((reqId, docId)).toDF("req_id", "doc_id")
        .write.mode("append").parquet(feedDir)
    def storeIds: Seq[Long] = spark.read.parquet(storeDir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    def bandMentions10: Boolean =
      graft.ml.BandIndex.probe(spark, "g_ff_band",
          Seq((90L, victim.replace("evening", "morning")))
            .toDF("doc_id", "text"),
          n = 3, k = 12, bands = 4, threshold = 0.3)
        .filter($"doc_a" === 10L || $"doc_b" === 10L).count() > 0L
    try {
      graft.store.Bucketing.dropWithDir(spark, "g_ff_band")
      graft.store.Bucketing.dropWithDir(spark, "g_ff_band_keys")
      graft.ml.BandIndex.write(
        Seq((1L, "one lonely seed doc about geothermal vents and deep pressure"))
          .toDF("doc_id", "text"),
        "g_ff_band", n = 3, k = 12, bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val maintained = scala.collection.mutable.ListBuffer[(Long, String)]()
      val screens = scala.collection.mutable.ListBuffer[(Long, String)]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.0,
        CorpusPipeline.IndexMaintenance("g_ff_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          forgetFeed = Some(CorpusPipeline.ForgetCadence(
            requests = s => s.read.parquet(feedDir),
            stateDir = feedDir + "_state",
            store = Some(CorpusPipeline.CorpusStore(storeDir, "source"))))),
        evalIdx, evalN = 3,
        onMaintain = (id, st) => maintained.synchronized {
          maintained += ((id, st.stage)); () }) { (id, acc, stats) =>
        screens.synchronized {
          screens ++= stats.map(s => (id, s.stage + s"[${s.docsIn}->${s.docsOut}]"))
        }
        acc.select($"doc_id", $"text")
          .withColumn("source", concat(lit("s"), ($"doc_id" % 2).cast("string")))
          .write.mode("append").partitionBy("source").parquet(storeDir)
      }
      try {
        // batch 0: both docs accepted, stored, indexed; no requests
        input.addData(10L -> victim,
          11L -> "eleven elephants wander dusty savannah trails seeking distant water holes")
        q.processAllAvailable()
        assert(storeIds === Seq(10L, 11L))
        assert(bandMentions10, "fixture must bite")
        assert(!maintained.exists(_._2.startsWith("forgetFeed")),
          "empty feed must not emit a drain stat")
        // request lands; batch 1 (unrelated doc) drains it
        addReq(1L, 10L)
        input.addData(12L ->
          "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil")
        q.processAllAvailable()
        assert(storeIds === Seq(11L, 12L), "doc 10 physically gone")
        assert(!bandMentions10, "doc 10 invisible to the screen")
        val drains = maintained.toList.filter(_._2.startsWith("forgetFeed"))
        assert(drains.map(_._1) === List(1L), drains.toString)
        // batch 2: the forgotten doc RE-ARRIVES (re-crawl) — dropped
        // by the opt-out screen, no resurrection-guard crash, and the
        // drained request does NOT re-process
        input.addData(10L -> victim)
        q.processAllAvailable()
        assert(storeIds === Seq(11L, 12L))
        assert(!bandMentions10)
        val optOut = screens.toList.filter(_._2.startsWith("optOutScreen"))
        assert(optOut.exists(e => e._1 === 2L && e._2.contains("[1->0]")),
          s"re-crawl must be screened out: $screens")
        assert(maintained.toList.count(_._2.startsWith("forgetFeed")) === 1,
          "drained request must not re-process")
      } finally q.stop()
    } finally {
      Seq("g_ff_band", "g_ff_band_keys")
        .flatMap(t => Seq(t, t + "_tombstones"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("forget feed stales the shard export: the next threshold crossing re-exports without the forgotten doc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val victim =
      "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files
      .createTempDirectory("g_fe_store").toString + "/corpus"
    val feedDir = java.nio.file.Files
      .createTempDirectory("g_fe_feed").toString + "/requests"
    val exportDir = java.nio.file.Files
      .createTempDirectory("g_fe_exp").toString + "/shards"
    Seq.empty[(Long, Long)].toDF("req_id", "doc_id")
      .write.parquet(feedDir)
    def exportedIds: Set[Long] = graft.ml.ShardExport.read(spark, exportDir)
      .select($"doc_id").as[Long].collect().toSet
    try {
      graft.store.Bucketing.dropWithDir(spark, "g_fe_band")
      graft.store.Bucketing.dropWithDir(spark, "g_fe_band_keys")
      graft.ml.BandIndex.write(
        Seq((1L, "one lonely seed doc about geothermal vents and deep pressure"))
          .toDF("doc_id", "text"),
        "g_fe_band", n = 3, k = 12, bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.0,
        CorpusPipeline.IndexMaintenance("g_fe_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          // staleFraction 1.2: ADD debt alone (1 doc per batch over a
          // live export of 2) can never cross it — only the forget
          // bump can, which is the thing under test
          exportTo = Some(CorpusPipeline.ExportCadence(exportDir, nShards = 2,
            corpus = s => s.read.parquet(storeDir).select($"doc_id", $"text"),
            staleFraction = 1.2)),
          forgetFeed = Some(CorpusPipeline.ForgetCadence(
            requests = s => s.read.parquet(feedDir),
            stateDir = feedDir + "_state",
            store = Some(CorpusPipeline.CorpusStore(storeDir, "source"))))),
        evalIdx, evalN = 3) { (_, acc, _) =>
        acc.select($"doc_id", $"text")
          .withColumn("source", concat(lit("s"), ($"doc_id" % 2).cast("string")))
          .write.mode("append").partitionBy("source").parquet(storeDir)
      }
      try {
        // batch 0: no live export -> first export = {10, 11}
        input.addData(10L -> victim,
          11L -> "eleven elephants wander dusty savannah trails seeking distant water holes")
        q.processAllAvailable()
        assert(exportedIds === Set(10L, 11L))
        // request lands; batch 1 drains it AFTER this slot's export
        // check — the export still serves doc 10 (debt 1/2 < 1.2)
        Seq((1L, 10L)).toDF("req_id", "doc_id")
          .write.mode("append").parquet(feedDir)
        input.addData(12L ->
          "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil")
        q.processAllAvailable()
        assert(exportedIds === Set(10L, 11L), "purge is next-slot, bounded")
        // batch 2: debt = adds(2) + forgotten(1) = 3 over live 2 ->
        // 1.5 >= 1.2 -> refresh reads the post-forget store
        input.addData(13L ->
          "paper lanterns drift over the festival river while drummers keep gentle time")
        q.processAllAvailable()
        assert(exportedIds === Set(11L, 12L, 13L),
          "forgotten doc purged from the training shards")
      } finally q.stop()
    } finally {
      Seq("g_fe_band", "g_fe_band_keys")
        .flatMap(t => Seq(t, t + "_tombstones"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("forget feed backlog gate: compactAtBacklog triggers compactForgotten; the bar SURVIVES compaction and only explicit readmit re-opens ingestion") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val victim =
      "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files
      .createTempDirectory("g_fb_store").toString + "/corpus"
    val feedDir = java.nio.file.Files
      .createTempDirectory("g_fb_feed").toString + "/requests"
    Seq.empty[(Long, Long)].toDF("req_id", "doc_id")
      .write.parquet(feedDir)
    try {
      graft.store.Bucketing.dropWithDir(spark, "g_fb_band")
      graft.store.Bucketing.dropWithDir(spark, "g_fb_band_keys")
      graft.ml.BandIndex.write(
        Seq((1L, "one lonely seed doc about geothermal vents and deep pressure"))
          .toDF("doc_id", "text"),
        "g_fb_band", n = 3, k = 12, bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val maintained = scala.collection.mutable.ListBuffer[(Long, String)]()
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.0,
        CorpusPipeline.IndexMaintenance("g_fb_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          forgetFeed = Some(CorpusPipeline.ForgetCadence(
            requests = s => s.read.parquet(feedDir),
            stateDir = feedDir + "_state",
            store = Some(CorpusPipeline.CorpusStore(storeDir, "source")),
            compactAtBacklog = 1L))),
        evalIdx, evalN = 3,
        onMaintain = (id, st) => maintained.synchronized {
          maintained += ((id, st.stage)); () }) { (_, acc, _) =>
        acc.select($"doc_id", $"text")
          .withColumn("source", concat(lit("s"), ($"doc_id" % 2).cast("string")))
          .write.mode("append").partitionBy("source").parquet(storeDir)
      }
      try {
        input.addData(10L -> victim)
        q.processAllAvailable()
        Seq((1L, 10L)).toDF("req_id", "doc_id")
          .write.mode("append").parquet(feedDir)
        input.addData(11L ->
          "eleven elephants wander dusty savannah trails seeking distant water holes")
        q.processAllAvailable()
        // backlog 1 >= 1: compaction fired and CLEARED the sets
        assert(maintained.exists(e =>
          e._2.startsWith("forgetFeed") && e._2.contains("compacted=true")),
          maintained.toString)
        assert(!spark.catalog.tableExists("g_fb_band_tombstones"))
        // r18 (advice): the takedown SURVIVES compaction — the durable
        // barred set still drops the re-crawl even with the tombstone
        // sets gone; compaction is physical cleanup, not re-admission
        input.addData(10L -> victim)
        q.processAllAvailable()
        assert(spark.read.parquet(storeDir).select("doc_id").as[Long]
          .collect().sorted.toSeq === Seq(11L),
          "re-crawl re-ingested after compaction despite the takedown")
        // only an EXPLICIT readmit re-opens ingestion for the id
        CorpusPipeline.readmit(spark, feedDir + "_state",
          Seq(10L).toDF("doc_id"))
        input.addData(10L -> victim)
        q.processAllAvailable()
        assert(spark.read.parquet(storeDir).select("doc_id").as[Long]
          .collect().sorted.toSeq === Seq(10L, 11L))
      } finally q.stop()
    } finally {
      Seq("g_fb_band", "g_fb_band_keys")
        .flatMap(t => Seq(t, t + "_tombstones"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("takedown on a QUIET stream still re-exports (export check outside the accepts gate); partition hints ride the feed into the store rewrite") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val victim =
      "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files
      .createTempDirectory("g_qt_store").toString + "/corpus"
    val feedDir = java.nio.file.Files
      .createTempDirectory("g_qt_feed").toString + "/requests"
    val exportDir = java.nio.file.Files
      .createTempDirectory("g_qt_exp").toString + "/shards"
    // feed schema carries the doc's store partition (a takedown
    // request usually knows it) — the drain threads it through
    // CorpusStore.partitionHintCol into forgetRows
    Seq.empty[(Long, Long, String)].toDF("req_id", "doc_id", "part")
      .write.parquet(feedDir)
    def exportedIds: Set[Long] = graft.ml.ShardExport.read(spark, exportDir)
      .select($"doc_id").as[Long].collect().toSet
    try {
      graft.store.Bucketing.dropWithDir(spark, "g_qt_band")
      graft.store.Bucketing.dropWithDir(spark, "g_qt_band_keys")
      graft.ml.BandIndex.write(
        Seq((1L, "one lonely seed doc about geothermal vents and deep pressure"))
          .toDF("doc_id", "text"),
        "g_qt_band", n = 3, k = 12, bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val q = CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_qt_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          exportTo = Some(CorpusPipeline.ExportCadence(exportDir, nShards = 2,
            corpus = s => s.read.parquet(storeDir).select($"doc_id", $"text"),
            staleFraction = 0.4)),
          forgetFeed = Some(CorpusPipeline.ForgetCadence(
            requests = s => s.read.parquet(feedDir),
            stateDir = feedDir + "_state",
            store = Some(CorpusPipeline.CorpusStore(storeDir, "source",
              partitionHintCol = Some("part")))))),
        evalIdx, evalN = 3) { (_, acc, _) =>
        acc.select($"doc_id", $"text")
          .withColumn("source", concat(lit("s"), ($"doc_id" % 2).cast("string")))
          .write.mode("append").partitionBy("source").parquet(storeDir)
      }
      try {
        input.addData(10L -> victim,
          11L -> "eleven elephants wander dusty savannah trails seeking distant water holes")
        q.processAllAvailable()
        assert(exportedIds === Set(10L, 11L))
        // takedown lands (hinted: doc 10 lives in source=s0); the next
        // batch is all-garbage — the quality screen empties it, nA=0.
        // r17 deferred the re-export to 'the next slot with accepts',
        // which on a quiet stream never comes; r18 serves it HERE.
        Seq((1L, 10L, "s0")).toDF("req_id", "doc_id", "part")
          .write.mode("append").parquet(feedDir)
        input.addData(90L -> "!!! ??? !!!")
        q.processAllAvailable()
        assert(spark.read.parquet(storeDir).select("doc_id").as[Long]
          .collect().sorted.toSeq === Seq(11L), "hinted store rewrite ran")
        assert(exportedIds === Set(11L),
          "takedown on a quiet stream must still purge the live export")
      } finally q.stop()
    } finally {
      Seq("g_qt_band", "g_qt_band_keys")
        .flatMap(t => Seq(t, t + "_tombstones"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("restart with OFFSETTING forgets+appends: the persisted debt clock re-exports where a count-delta seed reads zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val victim =
      "crimson harbors shelter weary sailors beneath amber lighthouse beams each evening"
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    val storeDir = java.nio.file.Files
      .createTempDirectory("g_od_store").toString + "/corpus"
    val feedDir = java.nio.file.Files
      .createTempDirectory("g_od_feed").toString + "/requests"
    val exportDir = java.nio.file.Files
      .createTempDirectory("g_od_exp").toString + "/shards"
    Seq.empty[(Long, Long)].toDF("req_id", "doc_id")
      .write.parquet(feedDir)
    def start(input: MemoryStream[(Long, String)]) =
      CorpusPipeline.ingestAndMaintain(
        input.toDF().toDF("doc_id", "text"), minQuality = 0.5,
        CorpusPipeline.IndexMaintenance("g_od_band",
          n = 3, k = 12, bands = 4, threshold = 0.3,
          exportTo = Some(CorpusPipeline.ExportCadence(exportDir, nShards = 2,
            corpus = s => s.read.parquet(storeDir).select($"doc_id", $"text"),
            staleFraction = 1.5)),
          forgetFeed = Some(CorpusPipeline.ForgetCadence(
            requests = s => s.read.parquet(feedDir),
            stateDir = feedDir + "_state",
            store = Some(CorpusPipeline.CorpusStore(storeDir, "source"))))),
        evalIdx, evalN = 3) { (_, acc, _) =>
        acc.select($"doc_id", $"text")
          .withColumn("source", concat(lit("s"), ($"doc_id" % 2).cast("string")))
          .write.mode("append").partitionBy("source").parquet(storeDir)
      }
    def exportedIds: Set[Long] = graft.ml.ShardExport.read(spark, exportDir)
      .select($"doc_id").as[Long].collect().toSet
    try {
      graft.store.Bucketing.dropWithDir(spark, "g_od_band")
      graft.store.Bucketing.dropWithDir(spark, "g_od_band_keys")
      graft.ml.BandIndex.write(
        Seq((1L, "one lonely seed doc about geothermal vents and deep pressure"))
          .toDF("doc_id", "text"),
        "g_od_band", n = 3, k = 12, bands = 4, buckets = 4)
      implicit val sqlCtx = spark.sqlContext
      val in1 = MemoryStream[(Long, String)]
      val q1 = start(in1)
      try {
        in1.addData(10L -> victim,
          11L -> "eleven elephants wander dusty savannah trails seeking distant water holes")
        q1.processAllAvailable()
        assert(exportedIds === Set(10L, 11L))
        // ONE append + ONE forget before the restart: the corpus count
        // lands back on the manifest count (2 = 2), so the r17
        // count-delta seed reads debt 0 — while the live export still
        // serves forgotten doc 10. The persisted clock reads 2.
        Seq((1L, 10L)).toDF("req_id", "doc_id")
          .write.mode("append").parquet(feedDir)
        in1.addData(12L ->
          "terraced vineyards ripen slowly along the mineral rich volcanic hillside soil")
        q1.processAllAvailable()
        assert(exportedIds === Set(10L, 11L), "2/2 < 1.5: not yet due")
      } finally q1.stop()
      val in2 = MemoryStream[(Long, String)]
      val q2 = start(in2)
      try {
        // restart batch: seed = persisted(2) + nA(1) = 3; 3/2 >= 1.5
        // -> the refresh finally purges doc 10
        in2.addData(13L ->
          "paper lanterns drift over the festival river while drummers keep gentle time")
        q2.processAllAvailable()
        assert(exportedIds === Set(11L, 12L, 13L),
          "persisted debt must beat the offsetting count-delta")
      } finally q2.stop()
    } finally {
      Seq("g_od_band", "g_od_band_keys")
        .flatMap(t => Seq(t, t + "_tombstones"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("streaming chain opt-out screen: a taken-down id re-arriving is dropped before any content work (durable barred set)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val stateDir = java.nio.file.Files
      .createTempDirectory("g_soo_state").toString
    // the takedown drain (ingest loop) wrote the durable bar; this
    // chain deployment consumes the same stateDir
    CorpusPipeline.barIds(spark, stateDir, Seq(10L).toDF("doc_id"))
    val corpusIdx = graft.streaming.StreamingDedup.indexCorpus(
      Seq((1L, "one lonely seed doc about geothermal vents and deep pressure"))
        .toDF("doc_id", "text"), n = 3, k = 8, bands = 4)
    val evalIdx = graft.ml.Decontaminate.indexEval(evalSet, n = 3,
      expectedGrams = 50)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val accepted = scala.collection.mutable.ListBuffer[Long]()
    val screens = scala.collection.mutable.ListBuffer[String]()
    val q = CorpusPipeline.streaming(
      input.toDF().toDF("doc_id", "text"), minQuality = 0.0,
      corpusIdx, n = 3, k = 8, bands = 4, threshold = 0.3, minAgree = 0,
      evalIndex = evalIdx, evalN = 3,
      optOutState = Some(stateDir)) { (_, acc, stats) =>
      accepted.synchronized {
        accepted ++= acc.select($"doc_id").as[Long].collect(); () }
      screens.synchronized {
        screens ++= stats.map(s => s"${s.stage}[${s.docsIn}->${s.docsOut}]"); () }
    }
    try {
      input.addData(
        10L -> "crimson harbors shelter weary sailors beneath amber lighthouse beams",
        11L -> "eleven elephants wander dusty savannah trails seeking distant water holes")
      q.processAllAvailable()
      assert(accepted.sorted.toSeq === Seq(11L),
        s"barred id must not pass: $accepted / $screens")
      assert(screens.exists(_.startsWith("optOutScreen[2->1]")), screens)
      // readmit re-opens the chain too (shared durable record)
      CorpusPipeline.readmit(spark, stateDir, Seq(10L).toDF("doc_id"))
      input.addData(
        10L -> "crimson harbors shelter weary sailors beneath amber lighthouse beams")
      q.processAllAvailable()
      assert(accepted.sorted.toSeq === Seq(10L, 11L))
    } finally {
      q.stop()
      evalIdx.grams.unpersist()
    }
  }

  test("barred set sees a SECOND-PROCESS write: the resolved-frame cache is keyed on the dir's file listing (r19 advice)") {
    val stateDir = java.nio.file.Files
      .createTempDirectory("g_xp_state").toString
    // reader JVM resolves (and caches) the barred frame
    CorpusPipeline.barIds(spark, stateDir, Seq(1L).toDF("doc_id"))
    def ids: Set[Long] = CorpusPipeline.barredIds(spark, stateDir).get
      .select($"doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
    assert(ids === Set(1L)) // cache warm
    // a DIFFERENT process (the ingest JVM's drain) appends a bar —
    // simulated by writing to the dir without touching this JVM's
    // cache invalidation path
    Seq(2L).toDF("doc_id").coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(new java.io.File(stateDir, "barred").toString)
    assert(ids === Set(1L, 2L),
      "a bar written by another process must be visible without restart")
    // and an out-of-process REWRITE (readmit shrinks the set) too
    val barredDir = new java.io.File(stateDir, "barred")
    Seq(3L).toDF("doc_id").coalesce(1).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(barredDir.toString)
    assert(ids === Set(3L),
      "an out-of-process rewrite must invalidate the cached frame")
  }
}
