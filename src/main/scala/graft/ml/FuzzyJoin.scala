package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Blocked edit-distance record linkage — the fuzzy join a curation
  * pipeline runs to reconcile near-identical identifiers (titles,
  * URLs, product names) that token-set similarity misreads: Jaccard
  * over shingles is blind to character-level edits inside a token,
  * levenshtein is exactly that signal.
  *
  * Reference behavior frame: blq-cli's fingerprint suppression
  * normalizes messages before hashing so near-identical log lines
  * collapse (/root/reference/src/blq/query.py fingerprint path) — the
  * record-linkage generalization: instead of normalize-then-exact-
  * match, block-then-verify with an edit-distance budget.
  *
  * Scale shape (the df-capped-postings discipline applied to
  * blocking): candidates come ONLY from the equi-join on the blocking
  * key, hot blocks are dropped at `blockCap` (candidate volume is
  * Σ_b min(|b|, cap)², never corpus², and the cap makes the worst
  * block's quadratic term a constant), and the O(|s|²) levenshtein
  * verify runs only on pairs that survive the length lower bound
  * ||s_a| − |s_b|| ≤ maxDist (an edit changes length by at most 1, so
  * the prefilter can never drop a true match — FuzzyJoinSpec proves
  * it differentially). All three stages are plain codegen'd Column
  * ops: the equi-join shuffles on the block key, the verify is
  * map-only. */
object FuzzyJoin {

  /** All blocked candidate pairs with their edit distance:
    * (id_a, id_b, dist, is_match), id_a < id_b, `is_match` =
    * dist ≤ maxDist. Emitting the unfiltered candidates (not just the
    * matches) is deliberate — it is the audit view a linkage pipeline
    * thresholds interactively, and it gates the full distance
    * computation, not only the accepted tail (q130 pins levenshtein
    * on every surviving pair cross-engine).
    *
    * `blockKey` is any deterministic Column over `df`'s columns
    * (first tokens, a phonetic code, a sort-key prefix). Rows with a
    * NULL id, string, or block key don't participate. */
  def blockedCandidates(df: DataFrame, idCol: String, strCol: String,
      blockKey: Column, maxDist: Int, blockCap: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockCap >= 1, s"blockCap must be >= 1, got $blockCap")
    // Repartition on the block key BEFORE the census/join chain: a
    // single-file input otherwise carries ONE partition through the
    // broadcast joins and the O(|s|²) levenshtein verify runs on one
    // core (r16 AbBench: the q131 edge pipeline measured 1.82 s
    // single-partition vs 0.37-0.39 s repartitioned at sf0.1, persist
    // vs none a wash — exchange reuse already shares the shuffle
    // across the census and both join sides within one action, so no
    // persist: pinning a corpus-scale frame per call is the r14
    // stored-scan-persist trap). The blk partitioning also co-locates
    // the census, the semi-join, and the self-join — one exchange
    // serves all three.
    val base = df.select(blockKey.cast("string").as("blk"),
        col(idCol).cast("long").as("id"), col(strCol).cast("string").as("s"))
      .filter(col("blk").isNotNull && col("id").isNotNull &&
        col("s").isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("blk"))
    // hot-block drop: a block past the cap contributes cap²-unbounded
    // candidate volume — the operator refuses it wholesale, exactly
    // like a df-capped posting list (q31/q97 discipline)
    val keep = base.join(
      base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= blockCap).select(col("blk")),
      Seq("blk"), "left_semi")
    val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      // length lower bound BEFORE the quadratic verify
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
      .withColumn("is_match", col("dist") <= maxDist)
  }

  /** 36-bucket character-count signature (a-z + 0-9) — the per-row
    * precompute for [[countFilterPasses]]. 36 codegen'd translate
    * scans per row (table lookups, the CLAUDE.md fast path), paid
    * once per DOC; the per-PAIR bound check is then 36 integer ops
    * against levenshtein's O(|s|²) DP. Digits matter: identifier-like
    * corpora (versioned titles, SKUs — and the ScaleGen fixtures)
    * often differ ONLY in digit runs, and a letters-only histogram
    * prunes nothing there (measured: the 30× exact side read ~50 s
    * letters-only vs 2.9 s with digits included). */
  private[graft] def letterCounts(s: Column): Column =
    array((('a' to 'z') ++ ('0' to '9')).map(c =>
      (length(s) - length(translate(s, c.toString, ""))).cast("int")): _*)

  /** The count-filter lower bound (Jokinen & Ukkonen 1991, the
    * classic approximate-string-matching prefilter): one edit
    * operation changes the letter-count multiset by at most 2 (a
    * substitution decrements one letter and increments another), so
    * ed(a,b) ≥ Σ_c |cnt_a(c) − cnt_b(c)| / 2 — counting over ANY
    * character subset keeps the bound sound (edits touching
    * out-of-subset chars only loosen it). A pair can pass and still
    * verify past maxDist (it is a lower bound, not a distance), so
    * the filter is OUTPUT-NEUTRAL wherever a dist ≤ maxDist filter
    * already follows. Applied ONLY on [[blockingRecallProbe]]'s
    * brute-force exact side, where candidate volume is
    * |sample|·corpus and the filter is worth 17× at 30× scale
    * (48.4 → 2.9 s); on the BLOCKED paths (matches/probe) the cap
    * already bounds candidates and the precompute + bound check
    * measured a net LOSS (q131 1.10 vs 0.65 s interleaved), so they
    * deliberately don't use it — the q133 both-ways-envelope
    * discipline. Never applied to [[blockedCandidates]]' audit view,
    * whose contract is to emit every length-surviving candidate WITH
    * its distance (q130). */
  private[graft] def countFilterPasses(va: Column, vb: Column,
      maxDist: Int): Column =
    aggregate(zip_with(va, vb, (x, y) => abs(x - y)), lit(0),
      (acc, x) => acc + x) <= lit(2 * maxDist)

  /** The accepted pairs only: (id_a, id_b, dist), dist ≤ maxDist —
    * the edge list a clustering pass ([[DedupClusters]]) consumes.
    * Deliberately NOT count-filtered (r16, measured): on the blocked
    * path the cap already bounds candidates to ~cap/doc and the
    * letter-count precompute + per-pair bound check LOSES interleaved
    * (q131 1.10 vs 0.65 s min at sf0.1) — the filter only pays on the
    * brute-force truth side where candidate volume is |sample|·corpus
    * ([[blockingRecallProbe]], 48.4 → 2.9 s at 30×). */
  def matches(df: DataFrame, idCol: String, strCol: String,
      blockKey: Column, maxDist: Int, blockCap: Int = 1000): DataFrame =
    blockedCandidates(df, idCol, strCol, blockKey, maxDist, blockCap)
      .filter(col("is_match")).drop("is_match")

  /** Blocking-recall monitor for the fuzzy screen (the q135/q116
    * pattern applied to record linkage): recall of the
    * block-then-verify pipeline against the BRUTE-FORCE edit-distance
    * truth on a bounded document sample, at caller-chosen blockCap
    * operating points. FuzzyJoinSpec proves within-block soundness;
    * what blocking can silently lose is (a) true pairs whose block
    * keys differ and (b) true pairs inside a hot block the cap
    * refuses wholesale — both are invisible to the screen itself, so
    * a monitor must measure them against a blocking-free truth.
    *
    * Cost contract (the q116/q136 sample×corpus shape): the exact
    * side is |sample| × corpus — a broadcast of the sample against
    * one corpus scan with the length lower bound applied inside the
    * join condition, never corpus². One blocked run at max(blockCaps)
    * carries each pair's block population `bn`, so tighter operating
    * points are derived by filtering (the q135 one-LSH-run
    * discipline) — the join/verify work is never repeated per point.
    * Output: (block_cap, n_exact, n_found, recall), recall under the
    * q71 integer-target emission. Both sides are eagerly
    * materialized (localCheckpoint, bounded by the match volume) so
    * per-point aggregation does not re-run the verify stages.
    *
    * r19 (opt): the two materializations are INDEPENDENT read-only
    * pipelines over the shared persisted `base` (exact = sample ×
    * corpus brute force; found = blocked self-join), so they run as
    * concurrent driver-future jobs — the CorpusPipeline screen-leg
    * idiom (Future + blocking{} on the global pool, Await outside).
    * Spark's CacheManager serializes per-partition population of
    * `base`, so the race to first-materialize is safe. Wall clock
    * becomes max(leg) instead of sum(leg); AbBench interleaved
    * adjudication in the q137 scaladoc note. `concurrentLegs = false`
    * restores the serial form (the A/B lever; semantics identical
    * either way — both legs are deterministic and share nothing but
    * the persisted input). */
  def blockingRecallProbe(df: DataFrame, idCol: String, strCol: String,
      blockKey: Column, maxDist: Int, isSample: Column,
      blockCaps: Seq[Int], concurrentLegs: Boolean = true): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockCaps.nonEmpty, "need at least one blockCap point")
    require(blockCaps.forall(_ >= 1), s"blockCaps must be >= 1, got $blockCaps")
    val spark = df.sparkSession
    val base = df.select(blockKey.cast("string").as("blk"),
        col(idCol).cast("long").as("id"), col(strCol).cast("string").as("s"),
        isSample.as("is_smp"))
      .filter(col("blk").isNotNull && col("id").isNotNull &&
        col("s").isNotNull)
      .withColumn("cv", letterCounts(col("s")))
      .repartition(spark.sparkContext.defaultParallelism, col("blk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // exact truth: sample × corpus brute force (no blocking), the
      // length lower bound inside the join condition + the
      // count-filter bound ([[countFilterPasses]] — sound, so the
      // truth set is unchanged) so the O(|s|²) verify only runs on
      // count-plausible pairs: this is the term that is LINEAR in the
      // corpus, and the prefilter is what keeps its constant small
      val q = base.filter(col("is_smp"))
        .select(col("id").as("qid"), col("s").as("qs"), col("cv").as("qcv"))
      val exactPlan = broadcast(q)
        .join(base.select(col("id"), col("s"), col("cv")),
          col("qid") =!= col("id") &&
            abs(length(col("qs")) - length(col("s"))) <= maxDist)
        .filter(countFilterPasses(col("qcv"), col("cv"), maxDist))
        .filter(levenshtein(col("qs"), col("s")) <= maxDist)
        .select(least(col("qid"), col("id")).as("id_a"),
          greatest(col("qid"), col("id")).as("id_b"))
        .distinct()
      // one blocked run at the loosest cap, each pair tagged with its
      // block population — tighter caps filter on bn
      val maxCap = blockCaps.max
      val census = base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      val keep = base.join(census.filter(col("bn") <= maxCap), Seq("blk"))
      // the count filter applies HERE too (unlike the shipped blocked
      // screens): the monitor runs at the LOOSEST cap of its operating
      // points, so hot blocks near maxCap contribute cap²-scale pair
      // volume — at 30× the two filtered sides together measured
      // 2.9 s where exact-side-only read 50.8 (the found side was the
      // dominant lev consumer on a hot-block corpus)
      val a = keep.select(col("blk"), col("bn"), col("id").as("id_a"),
        col("s").as("s_a"), col("cv").as("cv_a"), col("is_smp").as("smp_a"))
      val b = keep.select(col("blk"), col("id").as("id_b"),
        col("s").as("s_b"), col("cv").as("cv_b"), col("is_smp").as("smp_b"))
      val foundPlan = a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .filter(col("smp_a") || col("smp_b"))
        .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
        .filter(countFilterPasses(col("cv_a"), col("cv_b"), maxDist))
        .filter(levenshtein(col("s_a"), col("s_b")) <= maxDist)
        .select(col("id_a"), col("id_b"), col("bn"))
      val (exact, found) =
        if (concurrentLegs) {
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          // active session pinned per thread (the forget-leg idiom —
          // shared pool threads may carry a stale one in
          // multi-session JVMs, e.g. test suites)
          val ef = Future(scala.concurrent.blocking {
            SparkSession.setActiveSession(spark); exactPlan.localCheckpoint() })
          val ff = Future(scala.concurrent.blocking {
            SparkSession.setActiveSession(spark); foundPlan.localCheckpoint() })
          // await BOTH to completion before the finally-unpersist can
          // run: if one leg throws, the other must not be left
          // consuming the cache while `base` is unpersisted under it
          // (r19 advice). Try awaits both; the first failure
          // propagates after both settle.
          val er = scala.util.Try(
            Await.result(ef, scala.concurrent.duration.Duration.Inf))
          val fr = scala.util.Try(
            Await.result(ff, scala.concurrent.duration.Duration.Inf))
          (er.get, fr.get)
        } else (exactPlan.localCheckpoint(), foundPlan.localCheckpoint())
      blockCaps.distinct.sorted.map { cap =>
        exact.join(
            found.filter(col("bn") <= cap)
              .select(col("id_a"), col("id_b"), lit(1L).as("f")),
            Seq("id_a", "id_b"), "left")
          .agg(count(lit(1)).as("n_exact"),
            coalesce(sum(col("f")), lit(0L)).as("n_found"))
          .select(lit(cap).as("block_cap"), col("n_exact"), col("n_found"),
            (round(col("n_found").cast("double") / col("n_exact") * 10000, 0)
              .cast("long") / lit(10000.0)).as("recall"))
      }.reduce(_ unionByName _)
    } finally { base.unpersist(); () }
  }

  /** Stored form of the blocked fuzzy join — the incremental leg the
    * ingest loop probes so record linkage stops re-deriving the
    * corpus side per batch (the SigIndex one-table discipline): a
    * bucketed catalog table `(id, blk, s)` bucketed by the block key,
    * so a batch probe equi-joins co-located buckets. Append is
    * id-idempotent (anti-join on stored ids — a replayed batch
    * no-ops), which keeps the loop's at-least-once contract: the
    * band index stays the sole replay-drop authority. */
  object FuzzyIndex {

    /** Create/overwrite the table from a corpus frame. `rows` must
      * carry (idCol, strCol) and `blockKey` evaluates over it. */
    def write(rows: DataFrame, table: String, idCol: String,
        strCol: String, blockKey: Column, buckets: Int = 4): Unit = {
      prepared(rows, idCol, strCol, blockKey)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("compression", "zstd")
        .bucketBy(buckets, "blk")
        .sortBy("blk")
        .saveAsTable(table)
    }

    /** Fold a batch in, skipping ids already present (replay no-op).
      *
      * The replay check is BLOCK-RESTRICTED (r16): the stored id set
      * is scanned only within batch-touched blocks (semi-join on blk)
      * before the distinct + anti-join, so an append never pays a
      * corpus-wide distinct shuffle — the probe-side restriction
      * ([[probe]]) applied to the write path, per the BandIndex
      * no-per-batch-ledger discipline. Sound because `blockKey` is a
      * deterministic function of the row: a REPLAYED row computes the
      * same blk its stored copy holds, so its stored id is always
      * inside the batch-touched block set. (A same-id row whose
      * CONTENT changed enough to move its block key is not a replay
      * and is outside the idempotence contract — as everywhere in the
      * ingest loop, the band index is the sole replay-drop authority.) */
    def append(spark: org.apache.spark.sql.SparkSession, table: String,
        rows: DataFrame, idCol: String, strCol: String,
        blockKey: Column): Unit = {
      if (rows.isEmpty) return
      val buckets = spark.sessionState.catalog
        .getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec.map(_.numBuckets)
        .getOrElse(throw new IllegalStateException(
          s"$table is not a bucketed fuzzy index table"))
      // resurrection guard FIRST, on the raw prepared batch (the
      // shared Tombstones rule: the replay anti-join below would
      // swallow a tombstoned re-add silently)
      Tombstones.requireNoResurrection(spark, table,
        rows.select(col(idCol)), idCol)
      val b = prepared(rows, idCol, strCol, blockKey)
      val fresh = b.join(storedIdsInBatchBlocks(spark, table, b),
        Seq("id"), "left_anti")
      if (fresh.isEmpty) return // pure replay
      fresh.write.mode(org.apache.spark.sql.SaveMode.Append)
        .option("compression", "zstd")
        .bucketBy(buckets, "blk")
        .sortBy("blk")
        .saveAsTable(table)
    }

    /** Fuzzy matches for a NEW batch against the stored corpus PLUS
      * within-batch pairs (a batch carrying its own near-dups screens
      * completely): `(id_a, id_b, dist)` with id_a < id_b,
      * dist ≤ maxDist. Replay echoes (a batch id already stored)
      * self-pair and are excluded by the id inequality; the
      * corpus-copy-vs-other-batch-doc duplicate of an in-batch pair
      * collapses in the distinct. Hot blocks are capped over the
      * COMBINED (stored ∪ batch) population — the same wholesale
      * refusal as [[blockedCandidates]], sized on what the join would
      * actually expand. */
    def probe(spark: org.apache.spark.sql.SparkSession, table: String,
        batch: DataFrame, idCol: String, strCol: String,
        blockKey: Column, maxDist: Int, blockCap: Int = 1000): DataFrame = {
      require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
      require(blockCap >= 1, s"blockCap must be >= 1, got $blockCap")
      val b = prepared(batch, idCol, strCol, blockKey)
      // only batch-TOUCHED blocks can pair, so both the cap census and
      // the join side restrict to them up front — the stored scan
      // still streams once, but the agg and the probe join carry
      // batch-bounded rows, not the whole corpus's block population
      val bBlks = b.select(col("blk")).distinct()
      // tombstoned ids leave the screen immediately — and the cap
      // census: a block's population is its LIVE population (the
      // from-scratch-on-remaining semantics)
      val all = Tombstones.live(spark, table, spark.table(table), "id")
        .join(bBlks, Seq("blk"), "left_semi")
        .unionByName(b)
      // census over DISTINCT (blk, id): a replayed batch doc appears
      // twice in `all` (stored copy + batch copy) and must count once,
      // or a block near the cap spuriously exceeds it on replay and
      // the screen emits fewer pairs than the original run (r15
      // advice) — replay determinism is the drop policy's contract
      val keep = all.join(
        all.select(col("blk"), col("id")).distinct()
          .groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= blockCap).select(col("blk")),
        Seq("blk"), "left_semi")
      // no count filter here either — the blocked probe's candidate
      // volume is cap-bounded (see the [[matches]] measured note)
      keep.as("c")
        .join(b.as("p"), col("c.blk") === col("p.blk") &&
          col("c.id") =!= col("p.id"))
        .filter(abs(length(col("c.s")) - length(col("p.s"))) <= maxDist)
        .select(
          least(col("c.id"), col("p.id")).as("id_a"),
          greatest(col("c.id"), col("p.id")).as("id_b"),
          when(col("c.id") < col("p.id"), col("c.s"))
            .otherwise(col("p.s")).as("s_a"),
          when(col("c.id") < col("p.id"), col("p.s"))
            .otherwise(col("c.s")).as("s_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
        .filter(col("dist") <= maxDist)
        .distinct()
    }

    /** Shared tombstone protocol (see [[Tombstones]]): immediate
      * forget on the fuzzy screen (census AND pairs read the live
      * population), physical cleanup at compaction. */
    def addTombstones(spark: org.apache.spark.sql.SparkSession,
        table: String, ids: DataFrame): Unit =
      Tombstones.add(spark, table, ids)

    def compactTombstones(spark: org.apache.spark.sql.SparkSession,
        table: String): Unit = {
      if (!Tombstones.exists(spark, table)) return
      Tombstones.compactBucketedTable(spark, table, table,
        "id", Seq("blk"))
      Tombstones.clear(spark, table)
    }

    /** Stored ids restricted to the batch's block keys — the replay-
      * check probe side. The semi-join's build is the batch's tiny
      * distinct blk set (broadcast), so the stored scan filters
      * map-side and the distinct shuffles only the surviving
      * (batch-touched) slice, never the corpus. Package-visible so
      * FuzzyJoinSpec can pin the plan shape. */
    private[graft] def storedIdsInBatchBlocks(
        spark: org.apache.spark.sql.SparkSession, table: String,
        b: DataFrame): DataFrame =
      spark.table(table)
        .join(b.select(col("blk")).distinct(), Seq("blk"), "left_semi")
        .select(col("id")).distinct()

    private def prepared(rows: DataFrame, idCol: String, strCol: String,
        blockKey: Column): DataFrame =
      rows.select(blockKey.cast("string").as("blk"),
          col(idCol).cast("long").as("id"),
          col(strCol).cast("string").as("s"))
        .filter(col("blk").isNotNull && col("id").isNotNull &&
          col("s").isNotNull)
        .select(col("id"), col("blk"), col("s"))
  }
}
