package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stored n-gram postings index (r14) — the fifth member of the
  * persistent-index family ([[BandIndex]] minhash bands, [[LexIndex]]
  * term postings, [[IvfIndex]] vectors, [[SigIndex]] bit signatures):
  * the inverted shingle index the n-gram pair family (q31 Jaccard,
  * q97/q101 containment) rebuilt FROM TEXT on every run — tokenize,
  * per-token xxhash64, gram-key fold, explode — now paid once at
  * build. Probes read 8-byte keys and int doc ids from parquet; the
  * corpus text is never touched again (the q83→q102 LexIndex
  * precedent, applied to the dedup-pairs family — the r13 verdict's
  * item 3).
  *
  * Reference behavior frame: blq-cli's stored-fingerprint set ops
  * (src/blq/query.py fingerprint set-diff over stored runs) — the
  * n-gram generalization, stored so repeat screens never re-derive.
  *
  * Layout under an index dir:
  *  - `postings/`: (shingle: long, df: long, docs: array<id>) — one
  *    row per distinct gram key; `docs` is the COMPLETE sorted
  *    posting list iff df <= dfMax, else EMPTY (hot shingles are
  *    dropped by every rare-gram consumer — q31/q97/q101 all df-cap —
  *    so only their df is stored, bounding every stored list at dfMax
  *    entries; the df column still lets a probe detect that a
  *    batch-merged list crossed its cap).
  *  - `_meta`: n, dfMax, id type — probes validate against it.
  *
  * Scale shape: the build is two grouped passes over the (doc_id,
  * shingle) keys (df count first, lists collected ONLY for rare
  * shingles — `collect_list` never buffers a hot gram's millions of
  * ids); probes are bounded by the stored-lists scan plus, on the
  * incremental path, the batch's own tokenize pass. Pair expansion,
  * packing fast path and finalize are [[TextDedup]]'s OWN code
  * ([[TextDedup.pairCountsFromCapped]],
  * [[TextDedup.containmentPairsIncrementalFromPostings]]), so the
  * indexed and ad-hoc paths cannot diverge — q125/q126 gate the
  * indexed plans against the SAME DuckDB oracles as q31/q101. */
object NgramIndex {

  /** One tokenize+hash pass over the corpus → the stored postings.
    * `dfMax` fixes the largest COMPLETE stored list; probes may use
    * any dfCap <= dfMax exactly.
    *
    * Atomicity (r14 advice): the parquet AND the meta stage together
    * under `postings__stage` — meta lives INSIDE the postings dir
    * (`postings/_graft_meta`, written after the parquet commit, so its
    * presence marks the stage complete) and one rename publishes both.
    * A kill at any point leaves either the previous index serving or
    * a stage that entry repair ([[repairSwap]]) finishes/drops; the
    * half-built postings-without-meta dir the old layout could leave
    * is unreachable. */
  def build(docs: DataFrame, dir: String, n: Int, dfMax: Int): Unit = {
    require(n >= 1, s"n must be positive, got $n")
    require(dfMax >= 1, s"dfMax must be positive, got $dfMax")
    val spark = docs.sparkSession
    repairSwap(spark, dir)
    val sh = TextDedup.shingleKeyTable(docs, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val idType = sh.schema("doc_id").dataType
      val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      // lists ONLY for rare shingles: the collect_list buffer never
      // sees a hot gram's full id stream
      val lists = sh
        .join(dfs.filter(col("df") <= dfMax).select(col("shingle")),
          Seq("shingle"), "left_semi")
        .groupBy(col("shingle"))
        .agg(array_sort(collect_list(col("doc_id"))).as("docs"))
      val stage = s"$dir/postings__stage"
      dfs.join(lists, Seq("shingle"), "left")
        .select(col("shingle"), col("df"),
          coalesce(col("docs"),
            array().cast(org.apache.spark.sql.types.ArrayType(idType)))
            .as("docs"))
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(stage)
      writeMetaInto(spark, stage, n, dfMax) // commit marker: stage is now complete
      swapStageLive(spark, dir)
      // a v1-era root _meta would shadow nothing (postings/_graft_meta
      // wins) but could describe a DIFFERENT n/dfMax — drop it
      val legacyMeta = new org.apache.hadoop.fs.Path(s"$dir/_meta")
      val hfs = legacyMeta.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.delete(legacyMeta, false)
      // a rebuild starts clean: tombstones describe the PREVIOUS
      // corpus's ids and must not leak into the fresh index
      hfs.delete(new org.apache.hadoop.fs.Path(s"$dir/$TombstoneDir"), true)
      tombstoneCache.remove(dir)
      ()
    } finally { sh.unpersist(); () }
  }

  /** True iff every value of `from` round-trips through a cast to
    * `to` — identical types, or integral widening. Anything else
    * (Long→Int, floating, decimal, string) can wrap or reformat under
    * non-ANSI cast semantics and is refused. */
  private def losslessIdCast(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def rank(d: DataType): Int = d match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => -1
    }
    from == to || (rank(from) > 0 && rank(to) > 0 && rank(from) <= rank(to))
  }

  /** Refuse a batch whose doc_id can silently corrupt the stored
    * postings (r14 advice): a long-id batch cast down to an int-id
    * index wraps under non-ANSI semantics with no error. Mirrors the
    * dfCap <= dfMax guard. */
  private def requireIdCompatible(batch: DataFrame,
      idType: org.apache.spark.sql.types.DataType, dir: String): Unit = {
    val bt = batch.schema("doc_id").dataType
    require(losslessIdCast(bt, idType),
      s"batch doc_id type $bt is not losslessly castable to the index's " +
        s"stored id type $idType at $dir — rebuild the index with the " +
        "wider id type instead of narrowing the batch")
  }

  /** Fold a batch of NEW documents into the stored postings — the
    * incremental maintenance path (the LexIndex.appendBatch analog:
    * df rides every row, so touched rows must rewrite; the merge is
    * one full postings pass + the batch's own tokenize, under a
    * crash-safe staged swap with entry repair). The merge is
    * REPLAY-IDEMPOTENT without any id ledger:
    *  - complete rows (df <= dfMax) merge as
    *    `array_distinct(concat(docs, bdocs))` with df recomputed from
    *    the deduped list — re-merging the same batch is a no-op;
    *  - hot rows (stored empty) can't dedup against unknown
    *    membership, so a replay inflates their df — HARMLESS: df only
    *    ever grows, and a gram already past dfMax is above every
    *    legal probe cap regardless (monotone in the safe direction);
    *  - a complete row whose merged df crosses dfMax truncates to
    *    empty, exactly like a fresh build would have stored it.
    * At 100 TB the rewrite cost is O(index) per fold, amortized by
    * cadence like LexIndex's append — the alternative (per-probe
    * corpus re-tokenize) is O(corpus TEXT) per query. */
  def append(spark: SparkSession, dir: String, batch: DataFrame): Unit = {
    repairSwap(spark, dir)
    val m = meta(spark, dir)
    if (batch.isEmpty) return
    val stored = postingsFrame(spark, dir)
    val idType = stored.schema("docs").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    requireIdCompatible(batch, idType, dir)
    // resurrection of a deleted id must be explicit (compact, then
    // append) — a silent merge would store grams the pair filter
    // contradicts
    tombstoneFrame(spark, dir).foreach { tbs =>
      val clash = batch.select(col("doc_id").cast(idType).as("doc_id"))
        .join(tbs, Seq("doc_id"), "left_semi").limit(1).collect()
      require(clash.isEmpty,
        s"batch contains tombstoned doc_id ${clash.headOption.map(_.get(0))} " +
          s"— run compactTombstones($dir) first if the re-add is intended")
    }
    val emptyIds = array()
      .cast(org.apache.spark.sql.types.ArrayType(idType))
    val batchLists = TextDedup.shingleKeyTable(batch, m.n)
      .groupBy(col("shingle"))
      .agg(collect_list(col("doc_id").cast(idType)).as("bdocs"))
    val mergedList = array_sort(array_distinct(concat(
      coalesce(col("docs"), emptyIds), coalesce(col("bdocs"), emptyIds))))
    val merged = stored
      .join(batchLists, Seq("shingle"), "full")
      .select(col("shingle"),
        when(coalesce(col("df"), lit(0L)) > m.dfMax,
          col("df") + coalesce(size(col("bdocs")).cast("long"), lit(0L)))
          .otherwise(size(mergedList).cast("long")).as("df"),
        mergedList.as("docs"))
      .select(col("shingle"), col("df"),
        when(col("df") <= m.dfMax, col("docs")).otherwise(emptyIds)
          .as("docs"))
    val stage = s"$dir/postings__stage"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    merged.write.mode("overwrite").option("compression", "zstd")
      .parquet(stage)
    // meta travels with the postings (build's atomicity contract);
    // its presence is the stage-complete marker
    writeMetaInto(spark, stage, m.n, m.dfMax)
    swapStageLive(spark, dir)
  }

  /** Publish a complete stage (`postings/_graft_meta` present):
    * live→`__old`, stage→live, drop the aside. Shared by [[build]],
    * [[append]] and the committed branch of [[repairSwap]]. */
  private def swapStageLive(spark: SparkSession, dir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$dir/postings")
    val stage = new org.apache.hadoop.fs.Path(s"$dir/postings__stage")
    val old = new org.apache.hadoop.fs.Path(s"$dir/postings__old")
    fs.delete(old, true)
    if (fs.exists(live)) { fs.rename(live, old); () }
    fs.rename(stage, live)
    fs.delete(old, true)
    invalidate(dir)
  }

  /** Entry repair for an interrupted [[append]] swap (the
    * kmvMonitor/BandIndex discipline): a committed stage (`_SUCCESS`
    * present) is the complete merged result — finish the swap; an
    * uncommitted stage is dropped; a live-missing/old-present state
    * RESTORES the aside (the defensive-restore rule). Safe no-op on a
    * clean index; called by [[append]] and [[postingsFrame]]. */
  private def repairSwap(spark: SparkSession, dir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new org.apache.hadoop.fs.Path(s"$dir/postings__stage")
    val live = new org.apache.hadoop.fs.Path(s"$dir/postings")
    val old = new org.apache.hadoop.fs.Path(s"$dir/postings__old")
    // complete := meta present in the stage (written AFTER the parquet
    // commit, so it implies _SUCCESS too — a stage with parquet but no
    // meta died between the two writes and is dropped, never published
    // as a postings-without-meta dir)
    val committed = fs.exists(
      new org.apache.hadoop.fs.Path(stage, MetaFile))
    if (committed) swapStageLive(spark, dir)
    else {
      fs.delete(stage, true)
      if (!fs.exists(live) && fs.exists(old)) {
        fs.rename(old, live) // defensive restore
        invalidate(dir)
        ()
      } else { fs.delete(old, true); () }
    }
    ()
  }

  /** Full-corpus Jaccard pairs from the stored postings — q31's exact
    * output with zero text processing: filter stored lists at the
    * probe's dfCap, then the shared pair machinery. */
  def pairsJaccard(spark: SparkSession, dir: String, threshold: Double,
      dfCap: Int): DataFrame = {
    val (pairs, sizes) = TextDedup.pairCountsFromCapped(
      cappedLists(spark, dir, dfCap))
    excludeTombstoned(spark, dir,
      TextDedup.finalizeJaccard(pairs, sizes, threshold))
  }

  /** Full-corpus containment pairs from the stored postings — q97's
    * exact output, same cost model as [[pairsJaccard]]. */
  def pairsContainment(spark: SparkSession, dir: String,
      threshold: Double, dfCap: Int): DataFrame = {
    val (pairs, sizes) = TextDedup.pairCountsFromCapped(
      cappedLists(spark, dir, dfCap))
    excludeTombstoned(spark, dir,
      TextDedup.finalizeContainment(pairs, sizes, threshold))
  }

  /** Incremental containment probe: `batch` (the docs that arrived
    * AFTER the index was built; id-disjoint from it) tokenizes ITSELF
    * only, merges its lists into the stored ones, re-caps df over the
    * merged counts (a gram rare in the corpus can go hot with the
    * batch — exactly like the ad-hoc form's df over corpus∪batch) and
    * expands only batch-touching pairs. Output identical to
    * [[TextDedup.containmentPairsIncremental]] over corpus∪batch —
    * q126 gates it against q101's oracle.
    *
    * Stage envelope (r16 AbBench interleaved, sf0.1 min-of-5, the
    * gate's 92%-batch fixture split): batch tokenize+lists 0.41 s,
    * + merged re-cap census 0.09, + flag projection 0.03, + pair
    * expansion/finalize 0.32, + ordering 0.06 = 0.91 total. This is
    * the floor: the two dominant terms are the batch's OWN tokenize
    * (scales with the batch, not the corpus — the fixture's 92%
    * batch makes it look corpus-sized) and the batch-touching pair
    * expansion (the operator's actual output work); the r15-suspected
    * re-cap census is 10%. No plan change wins here without changing
    * what the operator computes. */
  def probeContainment(spark: SparkSession, dir: String, batch: DataFrame,
      threshold: Double, dfCap: Int): DataFrame = {
    val m = meta(spark, dir)
    require(dfCap <= m.dfMax,
      s"probe dfCap $dfCap exceeds the index's stored dfMax ${m.dfMax}")
    val stored = postingsFrame(spark, dir)
    val idType = stored.schema("docs").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    requireIdCompatible(batch, idType, dir)
    val batchLists = TextDedup.shingleKeyTable(batch, m.n)
      .groupBy(col("shingle"))
      .agg(array_sort(collect_list(col("doc_id").cast(idType))).as("bdocs"))
    val emptyIds = array()
      .cast(org.apache.spark.sql.types.ArrayType(idType))
    val merged = stored
      .join(batchLists, Seq("shingle"), "full")
      // merged df counts each doc once even under replay (echo-aware:
      // batch ids already in the stored list don't re-count)
      .withColumn("df_m",
        coalesce(col("df"), lit(0L)) +
          coalesce(size(array_except(col("bdocs"),
            coalesce(col("docs"), emptyIds))).cast("long"), lit(0L)))
      .filter(col("df_m") <= dfCap)
      // a corpus list stored empty has df > dfMax >= dfCap, so the
      // filter above already dropped it — every surviving stored list
      // is complete by the build contract. Batch ids already PRESENT
      // in the stored list are replay echoes (an at-least-once replay
      // after [[append]] but before the loop's band-append commit
      // point) — array_except drops them so a replayed doc never
      // pairs against itself or double-counts its own gram sizes; a
      // genuinely new batch is disjoint and the except is a no-op.
      .select(concat(
        transform(coalesce(col("docs"), emptyIds),
          d => struct(d.as("doc_id"), lit(false).as("is_new"))),
        transform(
          array_except(coalesce(col("bdocs"), emptyIds),
            coalesce(col("docs"), emptyIds)),
          d => struct(d.as("doc_id"), lit(true).as("is_new"))))
        .as("docs"))
    // Deliberately NOT persisted, unlike the ad-hoc form's postings
    // (r14, measured): the frame feeds both the sizes and the pair
    // branch, but here recompute = one more stored-lists scan + the
    // (small) batch tokenize, while a persist materializes
    // corpus-postings-sized struct lists per probe — interleaved at
    // sf0.1 the persist LOST (0.81 s unpersisted vs 1.02 persisted
    // min on the 4%-batch split; tied on the inverted fixture split).
    // The 2+-consumers persist rule applies to expensive-to-recompute
    // pipelines (tokenize chains), not to stored-scan merges — and at
    // 100 TB caching a corpus-scale frame per ingest batch is memory
    // pressure the re-scan never costs.
    excludeTombstoned(spark, dir,
      TextDedup.containmentPairsIncrementalFromPostings(merged, threshold))
  }

  /** Per-doc marginal novelty of a batch against the stored gram
    * vocabulary — the ingest-time data-valuation signal ("is this
    * batch adding anything?") q96's first-occurrence novelty computes
    * corpus-wide: novelty = |batch grams unseen in the index| /
    * |batch grams|, (doc_id, n_grams, n_novel, novelty) with the q71
    * integer-target emission. Served FROM the index: the batch
    * tokenizes itself, presence is one left join against the stored
    * gram keys — every gram has a df row even when hot (empty docs
    * list), so presence needs no list materialization and the join
    * payload is 8-byte keys. Complements the loop's KMV vocabulary
    * telemetry (aggregate delta) with a PER-DOCUMENT score a
    * curation policy can threshold.
    *
    * Replay caveat (the loop's standard ordering): score BEFORE the
    * batch is appended — a replayed already-appended doc finds its
    * own grams stored and reads novelty 0. */
  def probeNovelty(spark: SparkSession, dir: String,
      batch: DataFrame): DataFrame = {
    val m = meta(spark, dir)
    val stored = postingsFrame(spark, dir)
      .select(col("shingle"), lit(1).as("seen"))
    TextDedup.shingleKeyTable(batch, m.n)
      .join(stored, Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (round(col("n_novel").cast("double") / col("n_grams") * 10000, 0)
          .cast("long") / lit(10000.0)).as("novelty"))
  }

  private def cappedLists(spark: SparkSession, dir: String,
      dfCap: Int): DataFrame = {
    val m = meta(spark, dir)
    require(dfCap <= m.dfMax,
      s"probe dfCap $dfCap exceeds the index's stored dfMax ${m.dfMax}")
    postingsFrame(spark, dir)
      .filter(col("df") <= dfCap)
      .select(col("shingle"), col("docs"))
  }

  // ---------------------------------------------------------------
  // Deletion (right-to-be-forgotten). The stored indexes were
  // append-only; a training corpus that honors takedown/opt-out
  // requests needs the screens to stop emitting a deleted document
  // IMMEDIATELY, without an O(corpus) rebuild per request. Protocol:
  //  - [[addTombstones]] records ids under `$dir/tombstones/`
  //    (idempotent set semantics — only novel ids are appended);
  //  - every pair-emitting probe anti-joins its OUTPUT against the
  //    tombstone set (broadcast, bounded by the deletion backlog), so
  //    the forget guarantee is absolute from the moment the tombstone
  //    commits: no deleted id ever appears in a result;
  //  - df caps keep using the STORED df until [[compactTombstones]]
  //    physically rewrites the lists — deliberately CONSERVATIVE: a
  //    gram whose remaining df fell under the cap is still excluded
  //    (fewer pairs, never a leak). Post-compact, rare-gram df is
  //    exact again; a gram that was hot at build (df > dfMax, list
  //    not stored) can only recover its list at a full rebuild —
  //    documented, and the safe direction.
  //  - [[append]] refuses a batch containing a tombstoned id
  //    (resurrection must be an explicit compact-then-append, not a
  //    silent merge that the pair filter would contradict).
  // q147 gates the probe path against a from-scratch oracle on the
  // remaining docs; NgramIndexSpec covers compact equality, replay
  // idempotence and the hot-gram conservatism.
  // ---------------------------------------------------------------

  /** Record document ids as deleted. Idempotent: already-tombstoned
    * ids are skipped, so an at-least-once deletion feed never grows
    * the set. */
  def addTombstones(spark: SparkSession, dir: String, ids: DataFrame): Unit = {
    val m = meta(spark, dir) // validates the index exists
    require(m != null, s"no index at $dir")
    val stored = postingsFrame(spark, dir)
    val idType = stored.schema("docs").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    require(losslessIdCast(ids.schema(ids.columns.head).dataType, idType),
      s"tombstone id type ${ids.schema(ids.columns.head).dataType} is not " +
        s"losslessly castable to the index's stored id type $idType")
    val cast = ids.select(col(ids.columns.head).cast(idType).as("doc_id"))
      .filter(col("doc_id").isNotNull).distinct()
    val novel = tombstoneFrame(spark, dir) match {
      case Some(existing) => cast.join(existing, Seq("doc_id"), "left_anti")
      case None => cast
    }
    if (!novel.isEmpty) {
      novel.coalesce(1).write.mode("append")
        .parquet(s"$dir/$TombstoneDir")
      tombstoneCache.remove(dir)
      ()
    }
  }

  /** The live tombstone set, or None when nothing was ever deleted —
    * the common case stays zero-cost. Cached per session like the
    * postings frame. */
  private def tombstoneFrame(spark: SparkSession,
      dir: String): Option[DataFrame] = {
    val cached = tombstoneCache.get(dir)
    if (cached != null && (cached._2 eq spark)) cached._1
    else {
      val path = new org.apache.hadoop.fs.Path(s"$dir/$TombstoneDir")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val v = if (fs.exists(path))
        Some(spark.read.parquet(path.toString).select(col("doc_id")).distinct())
      else None
      tombstoneCache.put(dir, (v, spark))
      v
    }
  }

  /** Drop tombstoned ids from a pair-emitting probe's output — the
    * immediate forget guarantee. Broadcast anti-joins: the tombstone
    * backlog is bounded by compaction cadence, never corpus-sized. */
  private def excludeTombstoned(spark: SparkSession, dir: String,
      out: DataFrame): DataFrame =
    tombstoneFrame(spark, dir) match {
      case None => out
      case Some(tbs) =>
        val t = broadcast(tbs.select(col("doc_id").as("__tbs_id")))
        out.join(t, col("doc_a") === col("__tbs_id"), "left_anti")
          .join(t, col("doc_b") === col("__tbs_id"), "left_anti")
    }

  /** Physically apply the tombstones: rare lists shrink (grams whose
    * every doc was deleted disappear), rare df is recomputed exact,
    * hot rows pass through unchanged (their lists were never stored —
    * the documented rebuild-only recovery). One staged pass over the
    * index, crash-safe via the build/append swap; clearing the
    * tombstone set AFTER the swap is idempotent under replay (re-
    * applying absent ids is a no-op). */
  def compactTombstones(spark: SparkSession, dir: String): Unit = {
    repairSwap(spark, dir)
    val m = meta(spark, dir)
    tombstoneFrame(spark, dir) match {
      case None => ()
      case Some(tbs) =>
        val stored = postingsFrame(spark, dir)
        val idType = stored.schema("docs").dataType
          .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
        val t = broadcast(tbs.select(col("doc_id").cast(idType).as("__tbs_id")))
        val rare = stored.filter(col("df") <= m.dfMax)
          .select(col("shingle"), explode(col("docs")).as("d"))
          .join(t, col("d") === col("__tbs_id"), "left_anti")
          .groupBy(col("shingle"))
          .agg(array_sort(collect_list(col("d"))).as("docs"))
          .select(col("shingle"), size(col("docs")).cast("long").as("df"),
            col("docs"))
        val hot = stored.filter(col("df") > m.dfMax)
        val stage = s"$dir/postings__stage"
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(stage), true)
        rare.unionByName(hot).write.mode("overwrite")
          .option("compression", "zstd").parquet(stage)
        writeMetaInto(spark, stage, m.n, m.dfMax)
        swapStageLive(spark, dir)
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$TombstoneDir"), true)
        tombstoneCache.remove(dir)
        ()
    }
  }

  private val TombstoneDir = "tombstones"
  private val tombstoneCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Option[DataFrame], SparkSession)]()

  /** Resolved-postings frame cache (the LexIndex.postingsFrame
    * precedent, r10): `spark.read.parquet` pays driver-side listing +
    * footer reads per call — a fixed tax on every probe of an
    * immutable index. Session-validated; [[invalidate]]d on rebuild. */
  private val postingsCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, Meta]()

  private def postingsFrame(spark: SparkSession, dir: String): DataFrame = {
    val cached = postingsCache.get(dir)
    if (cached != null && (cached.sparkSession eq spark)) cached
    else {
      // cache miss = first touch this session: self-heal a swap a
      // prior incarnation's kill left mid-flight before reading
      repairSwap(spark, dir)
      val df = spark.read.parquet(s"$dir/postings")
      postingsCache.put(dir, df)
      df
    }
  }

  private def invalidate(dir: String): Unit = {
    postingsCache.remove(dir)
    metaCache.remove(dir)
    tombstoneCache.remove(dir)
    ()
  }

  private[graft] final case class Meta(n: Int, dfMax: Int)

  /** Meta file name INSIDE the postings dir — `_`-prefixed so the
    * parquet reader's hidden-file filter skips it; written after the
    * parquet commit so its presence marks a postings tree complete. */
  private val MetaFile = "_graft_meta"

  private def writeMetaInto(spark: SparkSession, postingsDir: String,
      n: Int, dfMax: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$postingsDir/$MetaFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"n":$n,"dfMax":$dfMax}""".getBytes("UTF-8"))
    finally out.close()
  }

  private def readMetaFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, dir: String): Meta = {
    val in = fs.open(p)
    val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def f(k: String) = s"""\"$k\":(\\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(s"bad index meta at $dir: $s"))
    Meta(f("n"), f("dfMax"))
  }

  // get/put, NOT computeIfAbsent: the resolve path may call repairSwap,
  // whose invalidate() touches this map for the same key — a recursive
  // update computeIfAbsent forbids
  private[graft] def meta(spark: SparkSession, dir: String): Meta = {
    val cached = metaCache.get(dir)
    if (cached != null) cached
    else {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def inPostings = new org.apache.hadoop.fs.Path(s"$dir/postings/$MetaFile")
      val legacy = new org.apache.hadoop.fs.Path(s"$dir/_meta") // pre-r15 layout
      val m =
        if (fs.exists(inPostings)) readMetaFile(fs, inPostings, dir)
        else {
          // maybe only a committed stage exists (kill mid-swap): repair,
          // then retry before concluding the index is broken
          repairSwap(spark, dir)
          if (fs.exists(inPostings)) readMetaFile(fs, inPostings, dir)
          else if (fs.exists(legacy)) readMetaFile(fs, legacy, dir)
          else throw new IllegalStateException(
            s"n-gram index at $dir is incomplete (no ${MetaFile} and no " +
              "legacy _meta) — an interrupted build left no committed " +
              "state; rebuild with NgramIndex.build/ensure")
        }
      metaCache.put(dir, m)
      m
    }
  }

  /** Ensure an up-to-date index over `docs` for the corpus at `sfDir`
    * exists; rebuild only when the stored fingerprint mismatches
    * (the LexIndex.ensure pattern). `tag` names the corpus SLICE the
    * index covers (full corpus vs the pre-batch snapshot), so one
    * sfDir can carry several. Returns the index dir. */
  def ensure(spark: SparkSession, sfDir: String, docs: => DataFrame,
      n: Int, dfMax: Int, tag: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_ngramindex/" +
      s"$h/n${n}_df${dfMax}_$tag"
    val fp = fingerprint(spark, sfDir)
    val fpPath = java.nio.file.Paths.get(dir, "_fingerprint")
    val current =
      if (java.nio.file.Files.exists(fpPath))
        Some(new String(java.nio.file.Files.readAllBytes(fpPath), "UTF-8"))
      else None
    if (!current.contains(fp)) {
      build(docs, dir, n, dfMax)
      java.nio.file.Files.createDirectories(fpPath.getParent)
      java.nio.file.Files.write(fpPath, fp.getBytes("UTF-8"))
      ()
    }
    dir
  }

  /** "v2" = index FORMAT version — bump on any schema/layout change so
    * a code upgrade rebuilds instead of reading a stale layout (v2:
    * meta moved inside postings/ as the atomic-commit marker; v1 dirs
    * are still READABLE via the legacy `_meta` fallback, but ensure()
    * refreshes them to the self-repairing layout). */
  private def fingerprint(spark: SparkSession, sfDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"v2:${st.getLen}:${st.getModificationTime}"
  }
}
