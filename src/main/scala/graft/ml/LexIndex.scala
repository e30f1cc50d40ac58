package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Persistent inverted lexical index: the structural fix for
  * re-tokenizing the corpus on every retrieval query (the r6 BM25
  * plan was scale-safe but index-less — at 100 TB "re-derive tf/df
  * from raw text per query" is wrong no matter how good the plan).
  * Reference anchor: the retrieval surface of
  * /root/reference/src/blq/query.py:77-96 — arbitrary SQL over stored
  * tables; a stored derived table is in-scope engine surface.
  *
  * Layout under `indexDir`:
  *   - `postings/` parquet (term, doc_id, tf, dl, df) — denormalized
  *     so a probe needs NO join beyond the broadcast query attach:
  *     df rides every row of its term, dl every row of its doc.
  *     Range-partitioned by term and sorted within partitions on
  *     (term, doc_id): equal terms share a file, files carry tight
  *     min/max term stats, so a query-vocabulary IN filter prunes row
  *     groups at scan time. At 100 TB this is the same layout
  *     bucketed ([[graft.store.Bucketing]] precedent) — one write-time
  *     shuffle amortized over every probe.
  *   - `stats/` parquet, 1 row (n_docs, avgdl).
  *   - `_fingerprint` — identity of the source corpus file
  *     (size + mtime); [[ensure]] rebuilds when it drifts.
  *
  * Build cost: one explode pass, one (doc,term) aggregation with
  * map-side partials, one range shuffle for the write layout; df is a
  * window count computed ON the range partitioning (no extra
  * exchange). Probe cost: a scan of matching row groups, a broadcast
  * join to attach query ids, ONE shuffle of matched postings for the
  * (query, doc) sum — independent of corpus size given vocabulary
  * selectivity.
  */
object LexIndex {

  /** BM25 parameters (k1, b) fixed to the q83 values so the indexed
    * and index-less paths score identically. */
  private val K1 = 1.2
  private val B = 0.75

  /** (doc_id, dl, term, tf) postings (no df) from a (doc_id, text)
    * frame — the ONLY place tokenization happens; build runs it over
    * the corpus once, [[appendBatch]] only over the new batch. */
  private def tokenizePostings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Range-partition + sort + attach the df window, producing the
    * probe-ready layout. df as a window count over the unique
    * (doc,term) rows, computed after the range repartition —
    * RangePartitioning(term) satisfies the window's clustering
    * requirement, so no second exchange. */
  private def layoutPostings(tf: DataFrame, partitions: Int): DataFrame =
    tf.select(col("doc_id"), col("dl"), col("term"), col("tf"))
      .repartitionByRange(partitions, col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))

  /** Build the index from a (doc_id, text) frame into `indexDir`.
    * Stats are kept as exact integers (n_docs, sum_dl) with avgdl
    * derived by ONE double division — so [[appendBatch]] can update
    * them with integer adds and reproduce the from-scratch value
    * bit-for-bit (dl sums are integers < 2^53: double accumulation is
    * exact in any order). */
  def build(docs: DataFrame, indexDir: String, partitions: Int = 8): Unit = {
    val d = docs.select(col("doc_id"), col("text"))
    val stats = d
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(sum(col("dl")).as("sum_dl"), count(lit(1)).as("n_docs"))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .select(col("avgdl"), col("n_docs"), col("sum_dl"))
    layoutPostings(tokenizePostings(d), partitions)
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$indexDir/postings")
    stats.write.mode("overwrite").parquet(s"$indexDir/stats")
    // a rebuild starts clean: stale tombstones describe the previous
    // corpus's ids
    val tbs = new org.apache.hadoop.fs.Path(s"$indexDir/$TombstoneDir")
    tbs.getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
      .delete(tbs, true)
    invalidate(indexDir)
  }

  /** Incremental maintenance (r8, the r7 verdict's #1): fold a batch
    * of NEW documents (doc_ids disjoint from the indexed corpus —
    * caller's contract) into an existing index WITHOUT re-tokenizing
    * the corpus. The batch alone is tokenized; the stored postings
    * are scanned as-is (df dropped), unioned with the batch postings,
    * and re-laid-out with one range shuffle whose window recomputes
    * df exactly. Stats merge as integer adds on (n_docs, sum_dl).
    *
    * Cost ∝ index size + batch size — never corpus TEXT size: the
    * tokenize + (doc,term) aggregation that dominates a from-scratch
    * build (the text is ~5-10× the postings' bytes and the explode is
    * the CPU wall) happens only on the batch. At 100 TB the remaining
    * postings rewrite is partition-prunable — only term ranges
    * touched by the batch vocabulary (Heaps-bounded, ≪ index vocab)
    * need their files rewritten, the Maintenance.applyPruneByCount
    * per-partition-swap precedent — but the single range shuffle is
    * already the honest daily-ingest shape: it moves stored longs,
    * not text.
    *
    * Crash safety: the merged postings land in `postings_tmp` then
    * swap in rename-aside / rename-in / delete-aside order (the
    * prune-swap pattern, store/Maintenance.scala) — a crash at any
    * point leaves either the old or the new complete table live. */
  def appendBatch(spark: SparkSession, indexDir: String,
      newDocs: DataFrame, partitions: Int = 8): Unit = {
    // Empty-batch short-circuit BEFORE touching the index dir (r11
    // review): an empty batch against a not-yet-built index must be a
    // clean no-op, not a parquet schema-resolution failure — and a
    // trivially-empty batch shouldn't pay the postings scan at all.
    if (newDocs.isEmpty) return
    val old0 = spark.read.parquet(s"$indexDir/postings")
    // IDEMPOTENT on doc_id (r11): docs already in the index are
    // dropped from the batch, so an at-least-once replay (the
    // ingestAndMaintain crash-recovery path) is a no-op instead of a
    // duplicate-postings merge with double-counted stats. The id agg
    // rides the postings scan the merge below pays anyway.
    // resurrection of a deleted id must be explicit (compact first) —
    // checked on the RAW batch: a tombstoned doc still has stored
    // postings rows, so the id-idempotence anti-join below would
    // otherwise swallow it SILENTLY (caller believes it was re-added,
    // the probe filter keeps it invisible)
    tombstoneFrame(spark, indexDir).foreach { tbs =>
      val clash = newDocs.select(col("doc_id").cast("long").as("doc_id"))
        .join(tbs, Seq("doc_id"), "left_semi").limit(1).collect()
      require(clash.isEmpty,
        s"batch contains tombstoned doc_id ${clash.headOption.map(_.get(0))} " +
          s"— run compactTombstones($indexDir) first if the re-add is intended")
    }
    val d = newDocs.select(col("doc_id"), col("text"))
      .join(old0.select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
    // batch stats next (tiny job): empty batch -> no-op, no swap
    val bs = d.select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    val (bn, bsum) = (bs.getLong(0), if (bs.isNullAt(1)) 0L else bs.getLong(1))
    if (bn == 0L) return
    val old = old0
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    val merged = layoutPostings(old.unionByName(tokenizePostings(d)), partitions)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$indexDir/postings")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/postings_tmp")
    val aside = new org.apache.hadoop.fs.Path(s"$indexDir/.postings_old")
    merged.write.mode("overwrite").option("compression", "zstd")
      .parquet(tmp.toString)
    // stats: read the old row BEFORE any swap, merge as exact integers
    val st = spark.read.parquet(s"$indexDir/stats").head()
    val (nDocs, sumDl) =
      (st.getAs[Long]("n_docs") + bn, st.getAs[Long]("sum_dl") + bsum)
    fs.delete(aside, true)
    if (!fs.rename(live, aside))
      throw new java.io.IOException(s"appendBatch rename-aside failed for $live")
    if (!fs.rename(tmp, live)) {
      fs.rename(aside, live)
      throw new java.io.IOException(s"appendBatch rename-in failed for $live")
    }
    fs.delete(aside, true)
    import spark.implicits._
    Seq((sumDl.toDouble / nDocs, nDocs, sumDl))
      .toDF("avgdl", "n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/stats")
    invalidate(indexDir)
  }

  /** Corpus fingerprint: the documents parquet's (length, mtime) —
    * cheap, no scan, and changes whenever the driver regenerates the
    * table in place. */
  private def fingerprint(spark: SparkSession, sfDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/documents.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    // "v2" = index FORMAT version (stats gained sum_dl in r8): a code
    // upgrade over an existing on-disk index must rebuild, not read a
    // schema it no longer writes
    s"v2:${st.getLen}:${st.getModificationTime}"
  }

  /** Index location for a corpus dir: content-addressed under the JVM
    * temp dir so every (machine, corpus path) pair gets a stable spot
    * that survives across processes. */
  def indexDirFor(sfDir: String, tag: String = ""): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val suffix = if (tag.isEmpty) "" else s"_$tag"
    s"${System.getProperty("java.io.tmpdir")}/graft_lexindex/$h$suffix"
  }

  /** Ensure an up-to-date index exists for `sfDir`'s documents table;
    * build (or rebuild on corpus drift) only when the stored
    * fingerprint mismatches. Returns the index dir. Amortization in
    * one line: every probe after the first pays only the probe.
    * `tag` names an independent copy (a query that MUTATES its index
    * — q148's tombstones — must never share the default dir). */
  def ensure(spark: SparkSession, sfDir: String,
      docs: => DataFrame, tag: String = ""): String = {
    val dir = indexDirFor(sfDir, tag)
    val fp = fingerprint(spark, sfDir)
    val fpPath = java.nio.file.Paths.get(dir, "_fingerprint")
    val current =
      if (java.nio.file.Files.exists(fpPath))
        Some(new String(java.nio.file.Files.readAllBytes(fpPath), "UTF-8"))
      else None
    if (!current.contains(fp)) {
      build(docs, dir)
      java.nio.file.Files.createDirectories(fpPath.getParent)
      java.nio.file.Files.write(fpPath, fp.getBytes("UTF-8"))
    }
    dir
  }

  /** The (query_id, term) frame for queries that are themselves
    * indexed documents: read straight from the postings (already
    * unique per (doc, term)) with the doc predicate pushed to the
    * scan — no re-tokenization, no distinct shuffle. */
  def queryTermsFromIndex(spark: SparkSession, indexDir: String,
      docPred: org.apache.spark.sql.Column): DataFrame =
    livePostings(spark, indexDir)
      .filter(docPred)
      .select(col("doc_id").as("query_id"), col("term"))

  /** Collected (query_id, term) sets per (indexDir, predicate) —
    * the r7 verdict's probe-cost finding: an index-RESIDENT query set
    * is immutable for a given index, so the collect job that
    * materializes it driver-side is one-time, like the stats
    * (vocabulary rides the same cache). [[invalidate]] clears on any
    * index rewrite. */
  private val queryCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, String, Long)]]()

  private def invalidate(indexDir: String): Unit = {
    statsCache.remove(indexDir)
    postingsCache.remove(indexDir)
    tombstoneCache.remove(indexDir)
    queryCache.keySet.removeIf(_.startsWith(indexDir + "::"))
    ()
  }

  // ---------------------------------------------------------------
  // Deletion (right-to-be-forgotten) — the NgramIndex tombstone
  // protocol applied to RETRIEVAL, where the leak is most visible: a
  // deleted document must stop being retrievable the moment the
  // tombstone commits. Probes drop tombstoned postings rows BEFORE
  // ranking (a deleted doc neither appears in results nor consumes a
  // top-k slot, and a deleted query doc yields no query terms); BM25
  // stats (df, avgdl, n_docs) deliberately stay at their stored
  // values until [[compactTombstones]] — the Lucene deleted-docs
  // semantics: scores of live docs use slightly stale collection
  // stats, membership is exact immediately. Compaction rewrites the
  // postings without the deleted rows, recomputes df in the same
  // layout pass a build uses and recomputes stats from the remaining
  // postings — post-compact the index equals a from-scratch build on
  // the remaining docs (LexIndexSpec differential). q148 gates the
  // immediate-forget semantics against a from-scratch oracle with
  // full-corpus stats and live-docs-only results.
  // ---------------------------------------------------------------

  private val TombstoneDir = "tombstones"
  private val tombstoneCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Option[DataFrame], SparkSession)]()

  /** Record document ids as deleted. Idempotent set semantics. */
  def addTombstones(spark: SparkSession, indexDir: String,
      ids: DataFrame): Unit = {
    val cast = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .filter(col("doc_id").isNotNull).distinct()
    val novel = tombstoneFrame(spark, indexDir) match {
      case Some(existing) => cast.join(existing, Seq("doc_id"), "left_anti")
      case None => cast
    }
    if (!novel.isEmpty) {
      novel.coalesce(1).write.mode("append")
        .parquet(s"$indexDir/$TombstoneDir")
      // the cached (index, predicate) query sets may contain deleted
      // query docs — drop them along with the tombstone cache
      tombstoneCache.remove(indexDir)
      queryCache.keySet.removeIf(_.startsWith(indexDir + "::"))
      ()
    }
  }

  private def tombstoneFrame(spark: SparkSession,
      indexDir: String): Option[DataFrame] = {
    val cached = tombstoneCache.get(indexDir)
    if (cached != null && (cached._2 eq spark)) cached._1
    else {
      val path = new org.apache.hadoop.fs.Path(s"$indexDir/$TombstoneDir")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val v = if (fs.exists(path))
        Some(spark.read.parquet(path.toString).select(col("doc_id")).distinct())
      else None
      tombstoneCache.put(indexDir, (v, spark))
      v
    }
  }

  /** The postings visible to probes: stored rows minus tombstoned
    * docs (broadcast anti-join; zero-cost when nothing was ever
    * deleted). */
  private def livePostings(spark: SparkSession, indexDir: String): DataFrame = {
    val post = postingsFrame(spark, indexDir)
    tombstoneFrame(spark, indexDir) match {
      case None => post
      case Some(tbs) =>
        post.join(broadcast(tbs.select(col("doc_id").as("__tbs_id"))),
          col("doc_id") === col("__tbs_id"), "left_anti")
    }
  }

  /** Physically drop tombstoned postings: one re-layout pass (df
    * recomputed exactly, like a build), stats recomputed from the
    * remaining rows, tombstones cleared after the swap (idempotent
    * under replay — re-dropping absent ids is a no-op). */
  def compactTombstones(spark: SparkSession, indexDir: String,
      partitions: Int = 8): Unit = {
    if (tombstoneFrame(spark, indexDir).isEmpty) return
    val live = livePostings(spark, indexDir)
      .select(col("doc_id"), col("dl"), col("term"), col("tf"))
    val relaid = layoutPostings(live, partitions)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveP = new org.apache.hadoop.fs.Path(s"$indexDir/postings")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/postings_tmp")
    val aside = new org.apache.hadoop.fs.Path(s"$indexDir/.postings_old")
    relaid.write.mode("overwrite").option("compression", "zstd")
      .parquet(tmp.toString)
    // stats from the remaining docs: dl is constant per doc, so the
    // (doc, dl) distinct is the exact from-scratch recomputation
    val st = spark.read.parquet(tmp.toString)
      .select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head()
    val (nDocs, sumDl) =
      (st.getLong(0), if (st.isNullAt(1)) 0L else st.getLong(1))
    fs.delete(aside, true)
    if (!fs.rename(liveP, aside))
      throw new java.io.IOException(s"compact rename-aside failed for $liveP")
    if (!fs.rename(tmp, liveP)) {
      fs.rename(aside, liveP)
      throw new java.io.IOException(s"compact rename-in failed for $liveP")
    }
    fs.delete(aside, true)
    import spark.implicits._
    Seq((if (nDocs == 0) 0.0 else sumDl.toDouble / nDocs, nDocs, sumDl))
      .toDF("avgdl", "n_docs", "sum_dl")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/stats")
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/$TombstoneDir"), true)
    invalidate(indexDir)
  }

  /** BM25 probe with an index-resident query set named by a doc
    * predicate: the (query_id, term) collect happens at most once per
    * (index, predicate) — every later probe is the single distributed
    * probe job with zero preparatory actions. */
  def probeIndexed(spark: SparkSession, indexDir: String,
      docPred: org.apache.spark.sql.Column, k: Int,
      maxInTerms: Int = 4096): DataFrame = {
    import spark.implicits._
    val key = indexDir + "::" + docPred.toString
    val cached = queryCache.computeIfAbsent(key, { _ =>
      // df rides the collect: Σ df over the (query, term) set is the
      // EXACT matched-postings row count of the probe join, known
      // before any job runs — the probe-shape decision (see
      // probeLocal) is free and precise on this path. livePostings:
      // a deleted doc stops being usable as a QUERY too.
      livePostings(spark, indexDir)
        .filter(docPred)
        .select(col("doc_id").cast("long"), col("term").cast("string"),
          col("df").cast("long"))
        .as[(Long, String, Long)].collect().toSeq
    })
    probeLocal(spark, indexDir, cached.map(t => (t._1, t._2)), k, maxInTerms,
      matchedEst = cached.map(_._3).sum)
  }

  /** BM25 probe for AD-HOC query strings (text not in the index):
    * the query set is driver-local by contract, so tokenization is a
    * plain Scala split on the driver — no Spark job at all before
    * the probe job. The probe's tokenizer must agree with the index
    * builder's (whitespace split); the q107 parity gate holds both
    * to the DuckDB from-scratch oracle. */
  def probeText(spark: SparkSession, indexDir: String,
      queryTexts: Seq[(Long, String)], k: Int,
      maxInTerms: Int = 4096): DataFrame = {
    val qlocal = queryTexts.flatMap { case (id, text) =>
      text.split(" ").distinct.toSeq.map(t => (id, t))
    }
    // Ad-hoc terms carry no df, so the matched estimate is the
    // join-row upper bound |(query, term) pairs| × n_docs (df ≤
    // n_docs for every term). Pessimistic on rare-term queries over
    // big corpora — the penalty for a wrong two-shuffle pick is one
    // extra k-bounded exchange (~0.1 s fixed), vs a
    // query-count-parallel corpus-sized window for a wrong
    // single-shuffle pick. Bound on the cheap side of that asymmetry.
    val (_, nDocs) = corpusStats(spark, indexDir)
    probeLocal(spark, indexDir, qlocal, k, maxInTerms,
      matchedEst = qlocal.length.toLong * nDocs)
  }

  /** BM25 probe of a built index. `queries` is a bounded
    * (query_id, term) frame (a query SET, not a corpus) — it is
    * collected once to the driver (that bound is the contract) so the
    * probe is a single distributed job: the local query relation
    * broadcasts with no build-side scan, and the query vocabulary
    * becomes an IN filter that prunes postings row groups at scan
    * time (the index is term-sorted exactly for this). Past
    * `maxInTerms` the IN filter is skipped and the broadcast join
    * alone does the matching. Returns (query_id, rnk, doc_id, score)
    * for the top `k` docs per query, ties broken on (rounded score,
    * doc_id) exactly like q83. */
  /** Corpus stats per index dir, cached driver-side: the index is
    * immutable for a given fingerprint, so (avgdl, n_docs) are plain
    * literals every probe after the first — no broadcast-build job
    * for a 1-row frame. [[build]] invalidates on rewrite. */
  private val statsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Double, Long)]()

  /** Resolved postings frame per index dir, cached driver-side (r10):
    * `spark.read.parquet` re-lists the directory and re-reads footers
    * on every call — measured 0.14-0.18 s of pure driver-side plan
    * construction per probe (AbBench q102_plan_only), a fixed tax on
    * every repeat probe of an immutable index. The cached frame keeps
    * its resolved schema and file index; [[invalidate]] clears it on
    * any index rewrite (build/append). */
  private val postingsCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def postingsFrame(spark: SparkSession, indexDir: String): DataFrame = {
    // Unlike statsCache/queryCache (plain values), this cache holds a
    // LIVE frame bound to its SparkSession: if that session was
    // stopped and a new one probes the same dir (multi-suite tests,
    // session restart) the cached frame is dead — validate identity
    // and rebuild on mismatch.
    val cached = postingsCache.get(indexDir)
    if (cached != null && (cached.sparkSession eq spark)) cached
    else {
      val df = spark.read.parquet(s"$indexDir/postings")
      postingsCache.put(indexDir, df)
      df
    }
  }

  private def corpusStats(spark: SparkSession, indexDir: String): (Double, Long) =
    statsCache.computeIfAbsent(indexDir, { _ =>
      val r = spark.read.parquet(s"$indexDir/stats")
        .select(col("avgdl"), col("n_docs")).head()
      (r.getDouble(0), r.getLong(1))
    })

  /** Top-k TF-IDF keywords per document, served from the index: tf
    * and df are already in every postings row and n_docs is a cached
    * literal, so the whole operator is one postings scan + one
    * hash(doc_id) exchange for the ranking window (WindowGroupLimit
    * keeps only per-partition top-k) — no tokenize, no explode, no
    * df aggregation. The index-less q82 recomputes all of that per
    * call; this is the amortized form. */
  def tfidfTopK(spark: SparkSession, indexDir: String, k: Int): DataFrame = {
    val (_, nDocs) = corpusStats(spark, indexDir)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(round(col("score"), 6).desc, col("term"))
    livePostings(spark, indexDir)
      .withColumn("score",
        col("tf") * log(lit(nDocs.toDouble) / col("df")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term").as("tok"),
        round(col("score"), 4).as("score"))
  }

  def probe(spark: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, maxInTerms: Int = 4096): DataFrame = {
    import spark.implicits._
    val qlocal = queries
      .select(col("query_id").cast("long"), col("term").cast("string"))
      .distinct().as[(Long, String)].collect().toSeq
    val (_, nDocs) = corpusStats(spark, indexDir)
    probeLocal(spark, indexDir, qlocal, k, maxInTerms,
      matchedEst = qlocal.length.toLong * nDocs)
  }

  /** Matched-volume cutover for the probe plan shape (r11, measured
    * on ScaleGen corpora; units = matched JOIN rows, i.e. Σ df over
    * the (query, term) set — exactly what [[probeIndexed]] computes
    * from its cached df column): at Σdf ≈ 430k (1× corpus, 25k
    * result groups) the single-shuffle plan won 0.27 vs 0.36 s; at
    * Σdf ≈ 2.37M (30×, 489k groups) the two-shuffle plan won 0.63 vs
    * 1.22 s — the single shuffle repartitions corpus-sized partials
    * into |queries| partitions, so agg + window parallelism collapses
    * to the query count and the probe grows linearly on a handful of
    * cores. The cutover sits between the measured anchors; the
    * misprediction costs are asymmetric (~0.1 s fixed extra exchange
    * vs an unboundedly-growing serial window). */
  private[graft] var TwoShuffleAbove = 1000000L

  /** The probe proper, over a driver-local query set. Small matched
    * volume: ONE distributed job — pruned postings scan, broadcast
    * query attach, single hash(query_id) exchange serving both the
    * (query, doc) sum and the ranking window (plan pinned in
    * LexIndexSpec). Large matched volume (est ≥ [[TwoShuffleAbove]]
    * with fewer queries than cores): the agg keeps its natural
    * hash(query_id, doc_id) exchange at FULL parallelism, and the
    * ranking window pays a second, k-BOUNDED exchange —
    * WindowGroupLimit keeps only per-partition top-k before the
    * shuffle, so the second exchange moves ≤ partitions×queries×k
    * rows regardless of corpus size. */
  private def probeLocal(spark: SparkSession, indexDir: String,
      qlocal: Seq[(Long, String)], k: Int, maxInTerms: Int,
      matchedEst: Long): DataFrame = {
    import spark.implicits._
    val (avgdl, nDocs) = corpusStats(spark, indexDir)
    val post0 = livePostings(spark, indexDir)
    val qdf = qlocal.toDF("query_id", "term")
    val vocab = qlocal.map(_._2).distinct
    val post =
      if (vocab.length <= maxInTerms)
        post0.filter(col("term").isin(vocab: _*))
      else post0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("score"), 6).desc, col("doc_id"))
    val nQueries = qlocal.map(_._1).distinct.length
    val scored = post
      .join(broadcast(qdf), Seq("term"))
      .withColumn("idf",
        log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c",
        col("idf") * col("tf") * (K1 + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))))
    val twoShuffle = matchedEst >= TwoShuffleAbove &&
      nQueries < spark.sparkContext.defaultParallelism
    val grouped =
      if (twoShuffle) scored
      else scored.repartition(col("query_id"))
    grouped
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }
}
