package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.ml.{Similarity, TextAnalysis, TextDedup}

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal plumbing) as driver-checkable queries with
  * exact DuckDB oracles. Library implementations live in [[graft.ml]];
  * this file binds them to the TESTDATA tables and mirrors each
  * computation as oracle SQL.
  *
  * Every hash primitive is md5-based (identical in both engines), all
  * float emission is rounded, all ranking ties are broken on rounded
  * values + ids — so the driver's hash-compare is exact, not "close".
  */
object PipelineQueries {

  // ---------------------------------------------------------------- Spark

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup via hash-groupBy (one shuffle, no pairs). Key = first
    // two tokens — a boilerplate/prefix dedup that actually collapses
    // groups on this corpus; swap the key expression for md5(text) to
    // get full-content dedup with the identical plan.
    "q30_exact_dedup" -> { (s, dir) =>
      val key = concat_ws(" ", slice(split(col("text"), " "), 1, 2))
      TextDedup.exactDuplicates(t(s, dir, "documents"), key)
        .filter(col("group_size") > 1)
        .select(col("content_hash"), col("keep_id"), col("group_size"),
          concat_ws(",", transform(col("members"), m => m.cast("string"))).as("members"))
        .orderBy(col("content_hash"))
    },

    // Pairwise 3-gram Jaccard near-dup via inverted index with
    // stop-shingle df cap — the direct baseline MinHash approximates.
    // Postings-list form (group-per-shingle, in-row pair expansion, no
    // sort anywhere): measured 20-25% faster than the window-df +
    // self-join form at sf0.1 (1.07 vs 1.34 s same-session A/B, r4);
    // results identical by construction (MlSpec equivalence-gates the
    // two forms against each other).
    // doc_id cast to int engages the packed-pair-key fast path (exact
    // for any corpus under 2^31 docs; the library falls back to the
    // struct form on long ids — see jaccardPairsPostings scaladoc).
    "q31_ngram_jaccard" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("doc_id", col("doc_id").cast("int"))
      TextDedup.jaccardPairsPostings(docs, n = 3, threshold = 0.3, dfCap = 50)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // q31's exact output via PREFIX FILTERING (r15,
    // TextDedup.jaccardPairsPrefixFilter — the AllPairs/PPJoin
    // candidate principle): same oracle text as q31/q125 (the one-
    // oracle-gates-all-plans discipline), third plan for the same
    // semantics. Candidates come from each doc's rarest-first prefix
    // instead of all rare shingles — threshold-adaptive volume (10×
    // fewer candidate slots at t=0.8 on sf0.1), the high-threshold
    // near-dup screen's plan.
    "q133_ngram_jaccard_prefix" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .withColumn("doc_id", col("doc_id").cast("int"))
      TextDedup.jaccardPairsPrefixFilter(docs, n = 3, threshold = 0.3,
          dfCap = 50)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // q31 from the STORED n-gram postings index (r14 — the q83→q102
    // precedent applied to the dedup-pairs family): ensure() builds
    // the index once per corpus snapshot (one tokenize+xxhash64 pass);
    // every later run reads 8-byte keys + int doc lists from parquet
    // and never touches the text. Same oracle as q31 — identical
    // output proves the index IS the postings q31 recomputes per run.
    "q125_ngram_jaccard_indexed" -> { (s, dir) =>
      val idx = graft.ml.NgramIndex.ensure(s, dir,
        t(s, dir, "documents")
          .withColumn("doc_id", col("doc_id").cast("int"))
          .select(col("doc_id"), col("text")),
        n = 3, dfMax = 64, tag = "full")
      graft.ml.NgramIndex.pairsJaccard(s, idx, threshold = 0.3, dfCap = 50)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // MinHash(12) + LSH(4 bands × 3 rows) candidate generation with the
    // slot-agreement estimate pre-filter (minAgree = 5: candidates whose
    // estimated Jaccard < 5/12 never reach the verify join), verified
    // with true Jaccard — the 100 TB dedup path: candidate cost is
    // O(docs·bands), never O(docs²), and the verify join sees only
    // estimate-screened pairs. The oracle mirrors the identical filter.
    "q32_minhash_lsh" -> { (s, dir) =>
      TextDedup.minhashLshPairs(t(s, dir, "documents"), n = 3, k = 12,
        bands = 4, threshold = 0.3, minAgree = 5)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // LSH-screen recall monitor (r15 — the q116 ANN-recall analog for
    // the dedup family): recall of the minhash screen vs the exact
    // Jaccard truth at two slot-agreement operating points — the
    // shipped minAgree=5 (recall 1.0 on this corpus) and a
    // deliberately strict 11 (recall < 1 at BOTH gate scales: 23/25
    // at sf0.01, 25/28 at sf0.001 — the miss-counting path is live).
    // One LSH run carries agreement per pair; tighter points filter.
    "q135_lsh_recall" -> { (s, dir) =>
      TextDedup.lshRecallProbe(t(s, dir, "documents"), n = 3, k = 12,
          bands = 4, threshold = 0.3, agreePoints = Seq(5, 11))
        .orderBy(col("min_agree"))
    },

    // Sample-bounded LSH recall (r16 — closes VERDICT r15 #2): the
    // same two operating points, but recall measured over pairs
    // touching the doc_id % 3 sample, so the exact-truth side is
    // sample×corpus (flagged-postings incremental expansion), never
    // corpus². The mod-3 residue is the gate-scale choice keeping the
    // miss path live at BOTH scales (12/13 at sf0.01, 17/19 at
    // sf0.001, point 11 — probed non-vacuous driver-side before
    // shipping); production cadence uses a smaller hash-bucket
    // fraction. q135 stays as the small-scale exhaustive gate,
    // demoted to a bench baseline.
    "q136_lsh_recall_sampled" -> { (s, dir) =>
      TextDedup.lshRecallProbeSampled(t(s, dir, "documents"),
          col("doc_id") % 3 === 0, n = 3, k = 12,
          bands = 4, threshold = 0.3, agreePoints = Seq(5, 11))
        .orderBy(col("min_agree"))
    },

    // 32-bit SimHash signature per document (bit-string form).
    "q33_simhash" -> { (s, dir) =>
      TextDedup.simhashSignatures(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    },

    // SimHash near-dup pairs: bucket on the 8-bit signature prefix,
    // hamming <= 8 within bucket.
    "q34_simhash_pairs" -> { (s, dir) =>
      TextDedup.simhashPairs(t(s, dir, "documents"), prefixBits = 8, maxHamming = 8)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Embedding-cosine near-duplicate pairs (exact all-pairs baseline;
    // cosineNearDupPairs(bucketBits>0) is the blocked scale path).
    "q35_embedding_neardup" -> { (s, dir) =>
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.45)
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // Brute-force cosine top-5 for 10 query vectors — the ANN quality
    // baseline.
    "q36_ann_brute" -> { (s, dir) =>
      val p = Similarity.prepared(t(s, dir, "embeddings"))
      Similarity.bruteForceTopK(p.filter(col("vec_id") < 10), p, k = 5)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    },

    // Sign-bucketed LSH ANN: candidates only within the 4-bit sign
    // bucket — the equi-join scale path (recall<1 by construction).
    "q37_ann_lsh" -> { (s, dir) =>
      Similarity.lshTopK(t(s, dir, "embeddings"), q => q < 10, k = 3, bits = 4)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    },

    // Language ID: marker-word n-gram heuristic (integer scores,
    // deterministic argmax).
    "q38_lang_id" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring + token counting profile.
    "q39_text_profile" -> { (s, dir) =>
      TextAnalysis.profile(t(s, dir, "documents")).drop("pred_lang")
        .orderBy(col("doc_id"))
    },

    // Winnowing-style document fingerprint (min shingle hash).
    "q40_doc_fingerprint" -> { (s, dir) =>
      TextAnalysis.docFingerprint(t(s, dir, "documents"), n = 3)
        .orderBy(col("doc_id"))
    },

    // J8: non-equi range (interval) join — quantity bands from the
    // nation dimension; broadcast-BNL, the right physical shape when
    // the interval side is small.
    "q41_range_join" -> { (s, dir) =>
      val n = t(s, dir, "nation")
        .select(col("n_name"), (col("n_nationkey") * 2 + 1).as("lo"),
          (col("n_nationkey") * 2 + 2).as("hi"))
      t(s, dir, "lineitem")
        .join(broadcast(n), col("l_quantity") >= col("lo") && col("l_quantity") <= col("hi"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_items"), round(sum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("n_name"))
    },

    // ROLLUP hierarchy totals (Spark built-in; extension beyond the
    // reference's GROUP BY surface).
    "q42_rollup" -> { (s, dir) =>
      t(s, dir, "documents")
        .rollup(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"), col("n"))
        .orderBy(col("lang"), col("source"))
    },

    // Blocked (sign-bucketed) embedding near-dup — the SAME operator as
    // q35 but exercising the bucketBits > 0 path that actually runs at
    // 100 TB: candidates come from an equi-join on the bucket key, never
    // an all-pairs product. Recall < 1 vs q35 by construction; the
    // oracle applies the identical blocking, so the gate checks the
    // scale path's exact output.
    "q53_embedding_neardup_blocked" -> { (s, dir) =>
      Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), threshold = 0.45,
        bucketBits = 4)
        .orderBy(col("vec_a"), col("vec_b"))
    },

    // IVF ANN top-k with deterministic seed centroids (iters = 0: cells
    // are the k lowest vec_ids' vectors) so the whole index build +
    // probe + rank chain is SQL-expressible. The d2 used for cell
    // assignment is a sequential fold of squared diffs — bit-identical
    // to the oracle's list_dot_product over the element-wise diff list.
    "q54_ivf_topk" -> { (s, dir) =>
      graft.ml.Ivf.topK(t(s, dir, "embeddings"), q => q < 10, k = 3,
        cells = 8, nprobe = 2, iters = 0)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    },

    // Indexed IVF probe (r10): q54's exact output served from the
    // STORED ml/IvfIndex instead of a per-call train+assign — the
    // q83→q102 precedent applied to the vector index (the oracle IS
    // q54's from-scratch SQL). The index builds once per session
    // (first call; tableExists memo) and every later probe is the
    // bucketed no-exchange cell join — a fresh-session bench rep1
    // pays the build, rep2 measures the served path, exactly like
    // the LexIndex ensure amortization. The pre-write catalog/
    // warehouse clear handles a prior session's surviving managed-
    // table dirs (saveAsTable refuses a location the in-memory
    // catalog doesn't own — the IndexSweep `fresh` dance).
    "q112_ivf_indexed" -> { (s, dir) =>
      graft.ml.IvfIndex.probe(s, ensureQ112Index(s, dir),
          t(s, dir, "embeddings").filter(col("vec_id") < 10), k = 3, nprobe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    },

    // Right-to-be-forgotten on the ANN path (r16, the q147/q148
    // companion): tombstone the %13 vectors on a dedicated index
    // copy, then probe — deleted vectors must stop appearing as
    // anyone's neighbor immediately, while centroids stay as-trained
    // (the immediate-forget contract; compaction/rebuild is the
    // physical cleanup). Query 0 is itself deleted but remains a
    // legal QUERY: probes take caller-provided embeddings — only the
    // candidate side filters.
    "q149_forget_ann" -> { (s, dir) =>
      val table = "g_q149_ivf_" + Integer.toHexString(dir.hashCode)
      if (!s.catalog.tableExists(table)) {
        for (t0 <- Seq(table, graft.ml.IvfIndex.centroidsTable(table),
            graft.ml.IvfIndex.statsTable(table)))
          graft.store.Bucketing.dropWithDir(s, t0)
        graft.ml.IvfIndex.write(t(s, dir, "embeddings"), table,
          cells = 8, iters = 0, buckets = 4)
      }
      graft.ml.IvfIndex.addTombstones(s, table,
        t(s, dir, "embeddings").filter(col("vec_id") % 13 === 0)
          .select(col("vec_id")))
      graft.ml.IvfIndex.probe(s, table,
          t(s, dir, "embeddings").filter(col("vec_id") < 10), k = 3, nprobe = 2)
        .withColumnRenamed("rank", "rnk")
        .orderBy(col("query_id"), col("rnk"))
    },

    // The COMPLETE takedown (r17, closing the forget family): ONE
    // CorpusPipeline.forgetWithStore call serves the request across
    // the source-of-truth store (partition-targeted anti-join rewrite,
    // Maintenance.forgetRows — the reference's row-DELETE semantics,
    // storage.py:606-618) AND the stored band index (tombstones). The
    // emission gates both surfaces in one frame: per-source count +
    // id-sum of the SURVIVING store rows (the %13 docs physically
    // gone), unioned with the band probe's pairs (batch = the %11==7
    // non-deleted docs; any pair mentioning a deleted doc would add a
    // row the oracle lacks — hash mismatch). Its own store dir + index
    // tag (the CLAUDE.md mutating-query rule); replay-idempotent, so
    // Bench's second run and any later session land the same rows.
    // Non-vacuity probed driver-side at both gate scales: pairs exist
    // and the %13 exclusions change the store sums at every source.
    // Cost envelope (AbBench interleaved r17, sf0.1 min-of-5, loadavg
    // ~4 window): cur 1.66 s = probe_only 1.02 (the stored-index
    // probe floor class — q112/q125/q126 territory) + forget_only
    // 0.29 (idempotent tombstone add + store semi-join detection) +
    // store_agg 0.22 + compose overhead.
    "q150_forget_everywhere" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_q150/$h"
      val storeDir = s"$root/store"
      val table = "g_q150_band_" + Integer.toHexString(dir.hashCode)
      // fingerprint guard (the NgramIndex.ensure precedent): rebuild
      // the store copy + band index when the source data regenerates
      val srcP = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
      val fs = srcP.getFileSystem(s.sparkContext.hadoopConfiguration)
      val st = fs.getFileStatus(srcP)
      val fp = s"v2:${st.getLen}:${st.getModificationTime}"
      val fpPath = java.nio.file.Paths.get(root, "_fingerprint")
      val current =
        if (java.nio.file.Files.exists(fpPath))
          Some(new String(java.nio.file.Files.readAllBytes(fpPath), "UTF-8"))
        else None
      // rebuild on a stale fingerprint OR a missing catalog entry:
      // the tmp store outlives a session whose metastore is fresh
      // (the fingerprint alone would skip the build while the band
      // tables' warehouse dirs sit orphaned — LOCATION_ALREADY_EXISTS
      // on the first tombstone add); dropWithDir clears those dirs
      if (!current.contains(fp) || !s.catalog.tableExists(table) ||
          !s.catalog.tableExists(table + "_keys")) {
        val rootP = new org.apache.hadoop.fs.Path(root)
        val rfs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
        rfs.delete(rootP, true)
        docs.select(col("doc_id"), col("text"), col("source"))
          .write.mode("overwrite").partitionBy("source").parquet(storeDir)
        Seq(table, table + "_keys", table + "_tombstones")
          .foreach(t0 => graft.store.Bucketing.dropWithDir(s, t0))
        // the index holds the PRIOR corpus (the ~91% outside the
        // %11==7 batch residue — corpus-SCALE, the incremental
        // ideal: big stored index, small probing batch) — the q73
        // contract; a batch already present in the index would echo
        // self-pairs and double its verify sets. %11 is coprime to
        // the generator cycle (the CLAUDE.md residue rule) and the
        // batch-touching pair counts were probed non-vacuous
        // driver-side at both gate scales (3 at sf0.001, 4+ at
        // sf0.01 before the minAgree=0 widening).
        graft.ml.BandIndex.write(
          docs.filter(col("doc_id") % 11 =!= 7)
            .select(col("doc_id"), col("text")),
          table, n = 3, k = 12, bands = 4, buckets = 8)
        java.nio.file.Files.createDirectories(fpPath.getParent)
        java.nio.file.Files.write(fpPath, fp.getBytes("UTF-8"))
        ()
      }
      val maint = graft.ml.CorpusPipeline.IndexMaintenance(table,
        n = 3, k = 12, bands = 4, threshold = 0.3)
      graft.ml.CorpusPipeline.forgetWithStore(s, maint,
        graft.ml.CorpusPipeline.CorpusStore(storeDir, "source"),
        docs.filter(col("doc_id") % 13 === 0).select(col("doc_id")))
      val storeRows = s.read.parquet(storeDir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("a"), sum(col("doc_id")).as("b"))
        .select(concat(lit("store:"), col("source")).as("surface"),
          col("a"), col("b"))
      val batch = docs
        .filter(col("doc_id") % 11 === 7 && col("doc_id") % 13 =!= 0)
        .select(col("doc_id"), col("text"))
      val pairs = graft.ml.BandIndex.probe(s, table, batch,
          n = 3, k = 12, bands = 4, threshold = 0.3)
        .select(lit("band").as("surface"), col("doc_a").as("a"),
          col("doc_b").as("b"))
      storeRows.unionByName(pairs)
        .orderBy(col("surface"), col("a"), col("b"))
    },

    // ANN recall monitoring (r11): recall@3 of the STORED IVF probe vs
    // the exact brute-force answer over the same payload — the quality
    // half of the rebuild decision (driftStats is the geometry half).
    // The exact pass is sample×corpus by contract (10 queries here),
    // a monitoring-cadence job, never the serving path.
    "q116_ann_recall" -> { (s, dir) =>
      graft.ml.IvfIndex.recallProbe(s, ensureQ112Index(s, dir),
          t(s, dir, "embeddings").filter(col("vec_id") < 10), k = 3, nprobe = 2)
        .orderBy(col("query_id"))
    },

    // Hybrid retrieval (r15, ml/HybridRetrieval): RRF fusion of the
    // two STORED retrieval indexes — LexIndex BM25 top-5 and IvfIndex
    // cosine top-3 (nprobe=2), the q102/q112 serving paths — into one
    // calibration-free ranking. Both legs are k-bounded index probes;
    // the fusion is a tiny full-outer join + window. The oracle
    // recomputes both legs from raw data (BM25 chain + the IVF
    // assignment CTEs) and fuses with the same integer-rank
    // arithmetic — exact cross-engine because each RRF term is one
    // IEEE division of exact integers and the 2-term sum is a single
    // commutative addition. Cost pin (AbBench interleaved r15, sf0.1
    // min-of-5): q129_cur 0.61 s ≈ q102_cur 0.33 + q112_cur 0.34 with
    // partial stage overlap — the fusion itself adds nothing; any
    // future q129 speedup must come from the legs' own pinned paths.
    "q129_hybrid_rrf" -> { (s, dir) =>
      val lexIdx = graft.ml.LexIndex.ensure(s, dir,
        t(s, dir, "documents").select(col("doc_id"), col("text")))
      val lex = graft.ml.LexIndex
        .probeIndexed(s, lexIdx, col("doc_id") < 10, k = 5)
        .select(col("query_id"), col("doc_id").as("cand_id"), col("rnk"))
      val vec = graft.ml.IvfIndex
        .probe(s, ensureQ112Index(s, dir),
          t(s, dir, "embeddings").filter(col("vec_id") < 10),
          k = 3, nprobe = 2)
        .select(col("query_id"), col("cand_id"), col("rank").as("rnk"))
      graft.ml.HybridRetrieval.rrfFuse(lex, vec, kRrf = 60, topK = 5)
        .orderBy(col("query_id"), col("rnk"))
    },

    // Blocked fuzzy join (r15, ml/FuzzyJoin): edit-distance record
    // linkage over document "titles" (first 14 tokens), blocked on the
    // first 2 tokens with a hot-block cap and the |Δlen| ≤ maxDist
    // lower-bound prefilter. Emits ALL surviving candidates with their
    // distance (182 rows at sf0.01, 25 matched — 24 exact dups plus
    // one genuinely fuzzy pair), so the gate pins levenshtein parity
    // across every candidate pair, not just the accepted tail.
    "q130_fuzzy_join" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 14)).as("title"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"))
      graft.ml.FuzzyJoin.blockedCandidates(docs, "doc_id", "title",
          col("blk"), maxDist = 8, blockCap = 64)
        .orderBy(col("id_a"), col("id_b"))
    },

    // Fuzzy-match clusters (r15): the q130 match edges fed through the
    // q51 connected-components machinery — the composition a linkage
    // pipeline actually runs (pairs are evidence; the ENTITY is the
    // component). 23 clusters at sf0.01 incl. one size-3 transitive
    // group the pairwise view can't express.
    "q131_fuzzy_clusters" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 14)).as("title"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"))
      // localCheckpoint: assign's bounded probe is an executeTake that
      // scales 1→4→16→32 partitions, re-running the levenshtein verify
      // stage each attempt on an un-materialized edge frame; one
      // parallel materialization removes that (r16 AbBench interleaved
      // sf0.1 min: 0.64 s vs 0.78 un-checkpointed vs 1.97 pre-fix)
      val edges = graft.ml.FuzzyJoin.matches(docs, "doc_id", "title",
          col("blk"), maxDist = 8, blockCap = 64)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        .localCheckpoint()
      graft.ml.DedupClusters.assign(docs.select(col("doc_id")), edges)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("size"),
          concat_ws(",", array_sort(collect_list(col("doc_id"))))
            .as("members"))
        .filter(col("size") > 1)
        .orderBy(col("cluster_id"))
    },

    // Fuzzy blocking recall monitor (r16 — VERDICT r15 #6): recall of
    // the q130 block-then-verify screen vs the brute-force
    // edit-distance truth on a FIXED-SIZE sample (doc_id < 100 — the
    // q116 fixed-query-sample pattern: monitor cost stays constant as
    // the corpus grows; the first-shipped mod-5 residue scaled WITH
    // the corpus and cost 12.7 s at sf0.1), at two blockCap operating
    // points — the shipped cap 64 (recall 1.0 on this corpus: every
    // true pair shares its first-2-token block, probed through
    // first-5-token keys driver-side) and a deliberately hot cap 3
    // where the wholesale block refusal's recall cost is LIVE at both
    // gate scales (8/13 at sf0.01, 8/17 at sf0.001) — the cap is the
    // drop policy production actually tunes, so its cost is what the
    // monitor must price.
    "q137_fuzzy_block_recall" -> { (s, dir) =>
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 14)).as("title"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"))
      graft.ml.FuzzyJoin.blockingRecallProbe(docs, "doc_id", "title",
          col("blk"), maxDist = 8, isSample = col("doc_id") < 100,
          blockCaps = Seq(3, 64))
        .orderBy(col("block_cap"))
    },

    // SemDeDup-style semantic dedup (r11): k-means cells over the
    // embeddings (the q54 deterministic first-k init), within-cell
    // cosine pairs >= 0.45 (the q35/q53 threshold for this corpus,
    // row count probed non-vacuous: 7 drops at sf0.01), keep the
    // centroid-closest member of each high-cosine pair. Emits every
    // vector with its cell and keep flag — the per-vector decision a
    // curation pipeline joins against.
    "q114_semantic_dedup" -> { (s, dir) =>
      graft.ml.Similarity.semanticDedup(t(s, dir, "embeddings"),
        cells = 8, threshold = 0.45)
        .orderBy(col("vec_id"))
    },

    // DSIR-style importance-resampling selection (r11): hashed-bigram
    // LMs for the target (lang='en') vs the source corpus, per-doc
    // tf-weighted log-ratio, selection by rounded-weight sign. Probed
    // non-vacuous at sf0.01: 195 of 500 docs selected, weights
    // spanning -4.2..3.7.
    "q115_dsir_selection" -> { (s, dir) =>
      graft.ml.Dsir.hashedBigramWeights(t(s, dir, "documents"),
        isTarget = col("lang") === "en", buckets = 256)
        .orderBy(col("doc_id"))
    },

    // Trained-classifier inference plumbing (QualityClassifier.score's
    // exact fold, with INTEGER literal coefficients in place of a
    // fitted model so the oracle can score identically): per-doc
    // margin = Σ_tokens coef[md5_bucket(token)] / n_tokens. Emission
    // is EXACT INTEGERS (the coefficient sum and the token count) —
    // the one float division only orders the top-100, where exact-int
    // IEEE division is identical across engines and ties break on
    // doc_id (the q71 contract, no rounding anywhere). Map-only at
    // corpus scale: the ranking LIMIT is a TakeOrdered, not a sort.
    "q117_classifier_score" -> { (s, dir) =>
      val B = 64
      val coefs = (0 until B).map(i => ((i * 37) % 13 - 6).toLong)
      val cArr = array(coefs.map(lit): _*)
      // single-file testdata = one input partition: spread the
      // md5-per-token work before the narrow fold (the q38/q40
      // pattern); at real scale the scan has many splits and AQE can
      // coalesce the no-op exchange.
      // The empty-doc filter runs BEFORE the bucket transform, on the
      // md5-FREE tokenizer: a post-fold filter(n_toks > 0) gets pushed
      // below the repartition and re-evaluates the whole md5 transform
      // inside the Filter on the single-partition scan (AbBench r11:
      // 0.46 s vs 0.25 s for this form — the md5 pass ran twice, once
      // on one core)
      t(s, dir, "documents")
        .filter(size(graft.ml.QualityClassifier.toksCol(col("text"))) > 0)
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          transform(
            graft.ml.QualityClassifier.toksCol(col("text")),
            tk => graft.ml.QualityClassifier.bucketOf(tk, B).cast("int"))
            .as("bk"))
        .select(col("doc_id"),
          aggregate(col("bk"), lit(0L),
            (acc, b) => acc + element_at(cArr, b + 1)).as("sum_coef"),
          size(col("bk")).cast("long").as("n_toks"))
        .orderBy((col("sum_coef").cast("double") / col("n_toks")).desc,
          col("doc_id"))
        .limit(100)
    },

    // Training-shard manifest (ShardExport.assign + .manifest's exact
    // expressions): deterministic md5 shard assignment + per-shard
    // doc/token/char totals — integer-only emission. The agg's key
    // space is bounded at nShards, so the partial agg reduces each
    // input partition to ≤16 rows before the (tiny) exchange; at
    // 100 TB this is a map-side-combine scan, nothing else.
    "q118_shard_manifest" -> { (s, dir) =>
      t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(
          graft.ml.ShardExport.shardId(col("doc_id"), 16).as("shard"),
          size(graft.ml.QualityClassifier.toksCol(col("text")))
            .cast("long").as("tk"),
          length(col("text")).cast("long").as("ch"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_toks"),
          sum(col("ch")).as("n_chars"))
        .orderBy(col("shard"))
    },

    // Perceptual-hash signature plumbing (r12): per-doc 64-bucket
    // token-histogram "pixel grid" → exact-integer aHash bit rule
    // (Multimodal.aHashBitsCol — the SAME rule the real ImageIO path
    // applies to decoded pixel grids; MlSpec pins the two
    // implementations bit-for-bit). DuckDB can't decode images, so
    // the oracle gates the grid→signature math on a grid both engines
    // can derive (the q33/q34 md5 template); the real-pixel path is
    // MlSpec-gated on planted PNGs.
    "q119_phash_sig" -> { (s, dir) =>
      phashSigs(s, dir).orderBy(col("doc_id"))
    },

    // Banded hamming-LSH near-dup pairs over the q119 signatures +
    // codegen bit_hamming verify (exact by pigeonhole: bands=8 >
    // maxDist=2). doc_id-capped by contract — the token-histogram
    // bits are corpus-correlated, so band buckets are fat and the
    // uncapped pair set grows quadratically at bigger SFs (real
    // 64-bit image hashes debias this; the cap bounds the oracle's
    // all-pairs comparator the same way q36/q116 bound theirs).
    "q120_phash_pairs" -> { (s, dir) =>
      graft.ml.Multimodal.hammingNearDupPairs(
          phashSigs(s, dir).filter(col("doc_id") < 600), "doc_id", "sig",
          maxDist = 2, bands = 8)
        .withColumnRenamed("id_a", "doc_a")
        .withColumnRenamed("id_b", "doc_b")
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Audio near-dup screen over REAL WAV bytes (r14 — the audio gate
    // q119/q120 gave images): per doc, a deterministic 16-bit PCM
    // mono WAV is SYNTHESIZED (AudioCodec.pcmWav — samples are a pure
    // integer function of (doc_id, i), five amplitude-mask families),
    // then BYTE-PARSED back through AudioCodec.windowEnergySums's
    // real RIFF walk into the exact integer window-energy vector the
    // float envelope normalizes — so the gate covers the synth→parse
    // round trip, not just column math. Pair screen = cosine over the
    // energy vectors: dot/norms are exact longs, cos is three IEEE
    // ops on exact integers (identical doubles both engines), emitted
    // via the q71 integer-target round. doc_id < 200 caps the
    // all-pairs comparator (the q116/q120 bounded-contract class —
    // the blocked scale path for signatures is SigIndex).
    "q127_audio_neardup" -> { (s, dir) =>
      import s.implicits._
      import graft.ml.Multimodal.AudioCodec
      val env = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("doc_id"))
        .filter(col("doc_id") < 200)
        .as[Long]
        .mapPartitions(_.map { d =>
          val n = 512 + (d % 4).toInt * 128
          val fam = (d % 5).toInt
          val samples = Array.tabulate(n) { i =>
            val w = i * 16 / n
            if ((w + fam) % 4 < 2) ((i * 7 + d.toInt) % 61) - 30 else 0
          }
          val wav = AudioCodec.pcmWav(samples)
          (d, AudioCodec.windowEnergySums(wav, 16).get.toSeq)
        }).toDF("doc_id", "env")
        .withColumn("n2", aggregate(transform(col("env"), e => e * e),
          lit(0L), (a, v) => a + v))
      val a = env.select(col("doc_id").as("doc_a"), col("env").as("ea"),
        col("n2").as("na2"))
      val b = env.select(col("doc_id").as("doc_b"), col("env").as("eb"),
        col("n2").as("nb2"))
      a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
        .withColumn("dot", aggregate(
          zip_with(col("ea"), col("eb"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v))
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double"))))
        .filter(col("cos") >= 0.9)
        .select(col("doc_a"), col("doc_b"), col("dot"),
          (round(col("cos") * 10000, 0).cast("long") / lit(10000.0))
            .as("cos_sim"))
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Data-validation report (r13, analytics/DataQuality): the
    // admission gate a training pipeline runs before the expensive
    // stages. All row-local rules per table fuse into ONE aggregate
    // scan (a 40-rule suite over 100 TB is one pass with map-side
    // partials); Unique is a bounded groupBy; RefIntegrity is an
    // anti-join count. Exact-integer emission, mixed pass/violate
    // suite probed non-vacuous at sf0.01 (5088 'P' orders, 29896
    // out-of-range quantities, 45257 excess duplicate line rows).
    "q121_data_quality" -> { (s, dir) =>
      import graft.analytics.DataQuality._
      checkAll(Seq(
        t(s, dir, "orders") -> Seq(
          NotNull("o_custkey"),
          Accepted("o_orderstatus", Seq("F", "O")),
          Unique(Seq("o_orderkey"))),
        t(s, dir, "lineitem") -> Seq(
          InRange("l_quantity", 1, 25),
          Unique(Seq("l_orderkey")),
          RefIntegrity("l_orderkey", t(s, dir, "orders"), "o_orderkey",
            "orders")),
        t(s, dir, "documents") -> Seq(
          Matches("lang", "[a-z]{2}"),
          Matches("source", "src[0-9]+")),
        t(s, dir, "events") -> Seq(
          RefIntegrity("user_id", t(s, dir, "customer"), "c_custkey",
            "customer"))))
        .orderBy(col("rule"))
    },

    // The actionable half of q121 (DataQuality.flagRows): per-row
    // quarantine routing. Row-local flags are map-only codegen'd
    // expressions; the referential rule is ONE left join against the
    // dim's distinct keys (broadcast here). 50011 flagged rows at
    // sf0.01 (probed); reasons string in suite order; full-row
    // ORDER BY because (l_orderkey, l_linenumber) is non-unique in
    // this synthetic lineitem (11785 dup groups probed).
    "q122_quarantine" -> { (s, dir) =>
      import graft.analytics.DataQuality._
      flagRows(
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
          Seq(InRange("l_quantity", 1, 25),
            RefIntegrity("l_orderkey",
              t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
              "o_orderkey", "orders_f")))
        .filter(col("quarantine") === 1)
        .select(col("l_orderkey"), col("l_linenumber"),
          concat_ws(";", col("violations")).as("reasons"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("reasons"))
    },

    // KMV distinct-count sketch (r13, ml/Sketches): bounded-state
    // approximate cardinality whose VALUE is still bit-reproducible
    // cross-engine (md5 hash space — an approximate operator with an
    // EXACT oracle, which Spark's HLL++ can never have). Two suites
    // exercise both branches: events per type has 150 distinct users
    // (> k=64 → estimate path, kth-minimum hash emitted and gated),
    // documents per lang has 20 sources (< k → sketch IS the set,
    // count exact). n_exact joined alongside as the accuracy
    // demonstration the monitoring job would chart.
    "q123_kmv_distinct" -> { (s, dir) =>
      import graft.ml.Sketches
      val k = 64
      val ev = Sketches.kmvDistinct(t(s, dir, "events"),
          "event_type", "user_id", k)
        .select(concat(lit("events:"), col("event_type")).as("grp"),
          col("n_mins"), col("h_k"), col("distinct_est"))
      val dc = Sketches.kmvDistinct(t(s, dir, "documents"),
          "lang", "source", k)
        .select(concat(lit("docs:"), col("lang")).as("grp"),
          col("n_mins"), col("h_k"), col("distinct_est"))
      val exact = t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .select(concat(lit("events:"), col("event_type")).as("grp"),
          col("n_exact"))
        .unionByName(t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(countDistinct(col("source")).as("n_exact"))
          .select(concat(lit("docs:"), col("lang")).as("grp"),
            col("n_exact")))
      ev.unionByName(dc).join(exact, Seq("grp")).orderBy(col("grp"))
    },

    // KMV set-overlap estimate (r13, Sketches.kmvOverlap — the Beyer
    // et al. set-operation result): distinct-overlap between two
    // corpus slices (long docs vs English docs, by doc_id) answered
    // from two k-long sketch arrays. Estimate path exercised at both
    // driver scales (|A| ≈ 255, |B| ≈ 218 > k=64, true J ≈ 0.3);
    // every emitted number derives from exact integers through
    // identically-rounded doubles, so the estimate oracles exactly.
    "q124_kmv_overlap" -> { (s, dir) =>
      import graft.ml.Sketches
      val docs = t(s, dir, "documents").withColumn("grp", lit("docs"))
      Sketches.kmvOverlap(
        Sketches.kmvState(docs.filter(col("n_chars") > 300),
          "grp", "doc_id", 64),
        Sketches.kmvState(docs.filter(col("lang") === "en"),
          "grp", "doc_id", 64),
        "grp", 64)
        .orderBy(col("grp"))
    },

    // Bottom-k sample quantiles (r14, Sketches.kmvSampleQuantiles):
    // distribution monitoring with an exact cross-engine gate — the
    // q123 trick extended from counting to quantiles. Both branches
    // exercised at sf0.01: 5 langs × 100 docs > k=32 (sample path),
    // 20 sources × 25 docs < k (exact path — the sample IS the
    // group). Emitted quantiles are raw data VALUES (no interpolation
    // arithmetic), selected identically by both engines.
    "q128_kmv_quantiles" -> { (s, dir) =>
      import graft.ml.Sketches
      val k = 32
      val byLang = Sketches.kmvSampleQuantiles(t(s, dir, "documents"),
          "lang", "doc_id", "n_chars", k, Seq(0.5, 0.9))
        .select(concat(lit("lang:"), col("lang")).as("grp"),
          col("n_sample"), col("p50"), col("p90"))
      val bySource = Sketches.kmvSampleQuantiles(t(s, dir, "documents"),
          "source", "doc_id", "n_chars", k, Seq(0.5, 0.9))
        .select(concat(lit("src:"), col("source")).as("grp"),
          col("n_sample"), col("p50"), col("p90"))
      byLang.unionByName(bySource).orderBy(col("grp"))
    },

    // Weighted systematic resampling (r15, ml/WeightedSample): m=400
    // slots ∝ n_chars WITH replication — the selection step an
    // importance-resampling mix (DSIR) consumes. Integer-only slot
    // math (exact long DIV end to end; the exponential-keys scheme
    // would ride engine-divergent pow/ln), distributed prefix sum
    // under the hood. Σ n_copies = 400 exactly; replication exercised
    // at both gate scales (max n_copies = 2, 354 picked rows at
    // sf0.01).
    "q132_weighted_sample" -> { (s, dir) =>
      graft.ml.WeightedSample.systematic(
          t(s, dir, "documents").filter(col("n_chars") > 0),
          "doc_id", "n_chars", m = 400)
        .orderBy(col("doc_id"))
    },

    // Resampled training-shard manifest (r15): the q132 systematic
    // resample REPLICATED into shard assignments — a doc worth 2
    // slots appears twice, each replica sharded independently by the
    // (doc_id, copy) composite key so duplicates spread across shards
    // (training-mix construction's actual output shape). The picked
    // set is ≤ m rows, so the docs join broadcasts it; integer-only
    // emission throughout.
    "q134_resampled_manifest" -> { (s, dir) =>
      val docs = t(s, dir, "documents").filter(col("n_chars") > 0)
      val picked = graft.ml.WeightedSample.systematic(docs, "doc_id",
        "n_chars", m = 400)
      picked
        .withColumn("copy", explode(sequence(lit(1L), col("n_copies"))))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .withColumn("shard", graft.ml.ShardExport.shardId(
          concat_ws("#", col("doc_id"), col("copy")), 16))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(size(graft.ml.QualityClassifier.toksCol(col("text")))
            .cast("long")).as("n_toks"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .orderBy(col("shard"))
    },

    // Salted two-stage aggregation over a pathologically hot key
    // (l_returnflag has 3 values): groupBy(key, salt) partials then a
    // tiny final combine — the planned skew shape for when the table
    // arrives clustered by the hot key. Result identical to a plain
    // GROUP BY (the oracle is exactly that).
    "q55_salted_hotkey_agg" -> { (s, dir) =>
      graft.ml.Skew.saltedCountSum(
        t(s, dir, "lineitem"), key = "l_returnflag", value = "l_quantity", salts = 16)
        .select(col("l_returnflag"), col("n"), round(col("total"), 2).as("qty"))
        .orderBy(col("l_returnflag"))
    },

    // Vocabulary pruning: drop the corpus's top-10 most frequent tokens
    // from every document (stopword removal with a corpus-derived stop
    // list). The stop list is a k-row collect (bounded, like IVF
    // centroids) broadcast into a per-row array filter — the corpus
    // itself never shuffles for the pruning pass.
    "q56_stopword_prune" -> { (s, dir) =>
      // Tokenized once, consumed twice (stop-list aggregation, then
      // the per-row prune) — persisting after the repartition+split
      // saves the second scan+shuffle+tokenize pass entirely.
      val toks = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stop = toks
        .select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(10)
        .select(col("tok")).collect().map(_.getString(0)).toSeq
      val stopArr = array(stop.map(lit): _*)
      toks
        .withColumn("kept", filter(col("toks"), tk => !array_contains(stopArr, tk)))
        .select(col("doc_id"),
          size(col("toks")).as("n_before"),
          size(col("kept")).as("n_after"),
          md5(concat_ws(" ", col("kept"))).as("cleaned_hash"))
        .orderBy(col("doc_id"))
    },

    // As-of (backward) join: each event picks up the user's most recent
    // order at-or-before the event time. Spark has no native ASOF; the
    // operator is the scalable union-window form (graft.operators
    // .AsofJoin — one shuffle, no range-join pair blowup). DuckDB has
    // native ASOF JOIN, which is the oracle. Orders are pre-aggregated
    // to one row per (user, time) — ambiguous as-of matches are
    // engine-defined, so the contract requires uniqueness.
    "q57_asof_join" -> { (s, dir) =>
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("user_id"),
          // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC, so the
          // cast interprets it as UTC — same epoch DuckDB assigns.
          unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"))
        .agg(max(col("o_orderkey")).as("ord_key"))
      graft.operators.AsofJoin.asofBackward(ev, ord, "user_id", "ts_ms", "ord_ms")
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("asof.ord_key").as("last_order_key"),
          col("asof.ord_ms").as("last_order_ms"))
        .orderBy(col("event_id"))
    },

    // Deterministic train/validation/test split from a content hash:
    // split membership must be a pure function of content (not row
    // order, not a random() that re-shuffles on every re-run, not a
    // partition index that changes with parallelism) so re-ingestion
    // and backfills land every document in the same split. At 100 TB
    // this is a per-row expression — no shuffle at all.
    "q61_hash_split" -> { (s, dir) =>
      val bucket = (conv(substring(md5(col("text")), 1, 8), 16, 10)
        .cast("long") % 100).as("bucket")
      t(s, dir, "documents")
        .select(col("doc_id"), bucket)
        .withColumn("split",
          when(col("bucket") < 90, "train")
            .when(col("bucket") < 95, "validation")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    },

    // Stratified deterministic sampling: keep ~10% per language, chosen
    // by content-hash order (reproducible across runs/engines, unlike
    // TABLESAMPLE). One shuffle on the stratum key; stratum sizes come
    // from the same window, no extra pass.
    "q62_stratified_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang")).orderBy(md5(col("text")), col("doc_id"))
      val cw = Window.partitionBy(col("lang"))
      t(s, dir, "documents")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(cw))
        .filter(col("rnk") <= ceil(col("n_lang") * 0.1))
        .select(col("doc_id"), col("lang"), col("rnk"))
        .orderBy(col("doc_id"))
    },

    // Concat-and-chunk sequence packing: documents are concatenated in
    // a stable order per source and sliced into fixed token-budget
    // packs — the standard LLM pretraining batching shape. pack_id and
    // offset fall out of a prefix-sum window: one shuffle on source,
    // no iteration. (True first-fit bin packing is stateful/sequential
    // by nature; concat-and-chunk is what the big pipelines actually
    // run.)
    "q63_sequence_packing" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("prefix", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          floor(col("prefix") / 2048.0).cast("long").as("pack_id"),
          (col("prefix") % 2048).as("offset_in_pack"))
        .orderBy(col("doc_id"))
    },

    // Benchmark decontamination: training docs sharing any 4-gram with
    // the eval set (doc_id < 25 here) are flagged with overlap counts.
    // (Real pipelines use 8-13-gram windows; the synthetic corpus's
    // documents are short, so the gram size is scaled down to keep the
    // checked overlap non-trivial.)
    // Same inverted-index shape as q31: the join is on the shingle key,
    // pairs exist only where overlap exists — never an all-pairs scan.
    // At 100 TB the eval-set shingle side is small and broadcasts.
    "q64_decontaminate" -> { (s, dir) =>
      // persist: both join branches derive from sh, and without it the
      // tokenize/gram/explode pipeline (the expensive part) runs twice
      val sh = TextDedup.shingleTable(t(s, dir, "documents"), 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val eval = sh.filter(col("doc_id") < 25)
        .select(col("shingle"), col("doc_id").as("eval_id"))
      val train = sh.filter(col("doc_id") >= 25)
        .select(col("shingle"), col("doc_id").as("train_id"))
      train.join(eval, Seq("shingle"))
        .groupBy(col("train_id"))
        .agg(countDistinct(col("shingle")).as("shared_grams"),
          countDistinct(col("eval_id")).as("eval_docs"))
        .orderBy(col("train_id"))
    },

    // PII scrubbing: redact emails, IPv4s and phone-ish numbers with
    // typed placeholders — the standard pre-training hygiene pass.
    // The synthetic corpus contains no PII, so deterministic PII is
    // synthesized per doc_id FIRST (identically in the oracle) and the
    // scrub is verified by redaction counts + a hash of the scrubbed
    // text: the gate checks the exact transformation. Pure per-row
    // regexp work (no shuffle, full codegen); patterns are RE2-safe so
    // DuckDB runs them verbatim.
    "q68_pii_scrub" -> { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
      val phone = "\\b\\d{3}[-]\\d{3}[-]\\d{4}\\b"
      val id = col("doc_id")
      val full = concat(col("text"),
        when(id % 2 === 0,
          concat(lit(" reach me at u"), id.cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(id % 3 === 0,
          concat(lit(" from 10.2."), (id % 200).cast("string"), lit(".7")))
          .otherwise(lit("")),
        when(id % 5 === 0, lit(" call 555-867-5309")).otherwise(lit("")))
      val scrubbed =
        regexp_replace(
          regexp_replace(
            regexp_replace(full, email, "<EMAIL>"),
            ip, "<IP>"),
          phone, "<PHONE>")
      t(s, dir, "documents")
        // single-file table => one input partition; spread the regex
        // work (the whole cost of this query) across cores first
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"),
          (size(split(full, email, -1)) - 1).cast("long").as("n_emails"),
          (size(split(full, ip, -1)) - 1).cast("long").as("n_ips"),
          md5(scrubbed).as("scrubbed_hash"))
        .orderBy(col("doc_id"))
    },

    // Per-source document cap (the "domain capping" web-corpus op:
    // no single source may dominate the mix): keep at most 20 docs
    // per source, chosen deterministically by content-hash order.
    // 20 is deliberately BELOW the sf0.01 per-source maximum (25) so
    // the gate verifies rows are actually dropped — a cap the data
    // never reaches would hash-match even if the filter were broken.
    // One shuffle on the source key; survives any corpus size because
    // the window never leaves its partition.
    "q69_source_cap" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source")).orderBy(md5(col("text")), col("doc_id"))
      t(s, dir, "documents")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 20)
        .select(col("doc_id"), col("source"), col("rnk"))
        .orderBy(col("doc_id"))
    },

    // Distribution profile per group: exact interpolated percentiles
    // (Spark `percentile` == DuckDB `quantile_cont`, both linear
    // interpolation), sample stddev, and value↔time correlation. The
    // exact percentile is the correctness baseline for the
    // approx_percentile/t-digest path used at 100 TB (ml/Approx).
    "q58_group_stats" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          round(stddev_samp(col("value")), 4).as("sd"),
          round(corr(col("value"), unix_millis(col("ts"))), 4).as("corr_ts"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // Per-group top-k through the typed Aggregator (functions/TopK):
    // partial aggregation sends ≤ k rows per group per map task across
    // the shuffle — the bounded-combine alternative to the rank-window
    // oracle it is checked against. Ties break (score desc, id asc) on
    // both sides.
    "q59_topk_agg" -> { (s, dir) =>
      import s.implicits._
      // NULL values would throw in the non-nullable Double encoder
      // (while the oracle's row_number would happily rank them) —
      // exclude them on both sides of the gate.
      val ds = t(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value").cast("double"), col("event_id"))
        .as[(String, Double, Long)]
      ds.groupByKey(_._1)
        .mapValues(r => graft.functions.ScoredId(r._2, r._3))
        .agg(graft.functions.TopK.topK(3))
        .toDF("event_type", "top")
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "sc")))
        .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
          round(col("sc.score"), 4).as("score"), col("sc.id").as("event_id"))
        .orderBy(col("event_type"), col("rnk"))
    },

    // Forward as-of: each order picks up the customer's EARLIEST event
    // at-or-after the order date (orders precede the event stream, so
    // user_ids ≤ 150 match their first event; the rest are nulls —
    // exercising both the match and the left-join null path). Events
    // are pre-aggregated to one row per (user, ms) for the uniqueness
    // contract.
    "q60_asof_forward" -> { (s, dir) =>
      val ord = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey").as("user_id"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"))
      val ev = t(s, dir, "events")
        .groupBy(col("user_id"), unix_millis(col("ts")).as("ts_ms"))
        .agg(min(col("event_id")).as("ev_id"))
      graft.operators.AsofJoin.asofForward(ord, ev, "user_id", "ord_ms", "ts_ms")
        .select(col("o_orderkey"), col("user_id"), col("ord_ms"),
          col("asof.ev_id").as("next_event_id"),
          col("asof.ts_ms").as("next_event_ms"))
        .orderBy(col("o_orderkey"))
    },

    // Incremental near-dup detection — the CONTINUOUS-INGESTION dedup
    // shape: docs with id >= 400 stand in for a newly-ingested batch,
    // the rest for the already-deduped corpus. Only new↔corpus and
    // new↔new pairs are generated (corpus-only LSH buckets
    // short-circuit); at 100 TB the corpus band table is stored
    // bucketed by (band, key) and each ingest probes it co-located —
    // the corpus×corpus quadratic term never exists. Same
    // minhash/band/minAgree parameters as q32; the oracle is q32's
    // with the at-least-one-new condition mirrored in the cand CTE.
    // r17 adjudication of the r16 x3.2 move (0.80 -> 2.56 s): the
    // shipped path (minhashLshPairsIncremental) had NO r16 diff (the
    // +110 TextDedup lines were new q135/q136 functions); this
    // round's reads: 1.18 s single-shot full bench, 1.50-1.52
    // interleaved q73_cur mins in loadavg 2-4 windows, 0.73 s in a
    // close-candidate pairing, 0.87 s in the clean contended:false
    // close — the r15 0.80 envelope restored with no code change.
    // NOISE-PINNED: the r16 2.56 was steal-tail (r17's tail spikes
    // bounced 2-3x between back-to-back runs on whichever queries
    // caught the wave, and vanished in the clean window).
    "q73_incremental_dedup" -> { (s, dir) =>
      TextDedup.minhashLshPairsIncremental(t(s, dir, "documents"),
        isNew = col("doc_id") >= 400, n = 3, k = 12, bands = 4,
        threshold = 0.3, minAgree = 5)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    // Quality-weighted deterministic sampling: acceptance probability
    // equals the document's quality score, decided by a content-hash
    // uniform draw — reproducible across runs/engines (no random()),
    // and a pure per-row expression (zero shuffle at any scale). The
    // standard "keep more of the good text" downsampling pass.
    "q74_quality_sample" -> { (s, dir) =>
      val q4 = round(TextAnalysis.qualityScore(col("text")), 4)
      t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), q4.as("quality"),
          (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 10000)
            .as("bucket"))
        .filter(col("bucket") < col("quality") * 10000)
        .orderBy(col("doc_id"))
    },

    // Duplicated-substring removal (Lee et al. 2022 exact substring
    // dedup at 5-gram granularity): any 5-token span occurring in more
    // than one document is excised from every document — the passage-
    // level complement of whole-document dedup. Inverted-count shape:
    // positional gram keys (per-row), ONE corpus shuffle to count
    // distinct docs per gram, hot grams semi-join back, covered
    // positions resolved per-row. Never O(docs²). Spark joins on
    // xxhash64 gram keys while the oracle joins the gram strings —
    // same q31 precedent: outputs agree modulo 64-bit collision odds.
    "q76_span_dedup" -> { (s, dir) =>
      graft.ml.SpanDedup.removeDuplicateSpans(t(s, dir, "documents"), k = 5, dfMax = 1)
        .orderBy(col("doc_id"))
    },

    // Temperature-scaled language mixture (the multilingual-LM
    // alpha-sampling pass, XLM-R style): effective language counts are
    // flattened toward n^α (α = 0.5) by DOWNSAMPLING only — keep rate
    // r_l = sqrt(n_min / n_l), so the rarest language keeps 100% and
    // dominant ones shed proportionally (the corpus's `lang` column is
    // genuinely skewed, 218 en vs 64 fr at sf0.01, so the filter is
    // actually exercised — `source` is uniform and would gate
    // nothing). Acceptance is the same deterministic content-hash
    // draw as q74 (reproducible across runs/engines). Per-language
    // rates come from a lang-cardinality agg broadcast back onto the
    // corpus: the docs table itself never shuffles — the 100 TB
    // shape. sqrt and double division are IEEE correctly-rounded in
    // both engines, so the filter is exact.
    "q78_lang_mixture" -> { (s, dir) =>
      // NO repartition: the acceptance filter is one md5 per row —
      // not worth a corpus shuffle, and the shuffle would contradict
      // the map-only contract this query exists to demonstrate.
      val docs = t(s, dir, "documents")
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      val rates = counts
        .crossJoin(broadcast(counts.agg(min(col("n_lang")).as("n_min"))))
        .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_lang")))
      docs.join(broadcast(rates), Seq("lang"))
        .filter((conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long") % 10000)
          < col("rate") * 10000)
        .select(col("doc_id"), col("lang"), col("n_lang"),
          round(col("rate"), 4).as("rate"))
        .orderBy(col("doc_id"))
    },

    // Multimodal plumbing: opaque binary column + typed metadata. The
    // decode itself is stubbed (graft.ml.Multimodal); this query proves
    // the binary-column path: utf8 encode → byte length, content hash,
    // deterministic derived dimensions.
    "q43_binary_meta" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          expr("octet_length(text)").as("n_bytes"),
          md5(col("text")).as("content_hash"))
        .withColumn("width", lit(64) + col("n_bytes") % 512)
        .withColumn("height", lit(64) + (col("n_bytes") * 7) % 512)
        .withColumn("n_frames", col("n_bytes") % 16)
        .orderBy(col("doc_id"))
    })

  // ------------------------------------------------------------- oracles

  /** DISTINCT (doc_id, shingle) 3-gram CTE body over `documents`.
    * Mirrors TextDedup.shingles exactly, INCLUDING the short-doc
    * fallback: a doc with fewer than 3 tokens contributes its whole
    * text as a single shingle (generate_series alone would silently
    * drop such docs and diverge from Spark on any corpus containing
    * one). */
  /** Word n-gram CTE (`sh(doc_id, shingle)`) mirroring
    * TextDedup.shingleTable for any n, including the whole-text
    * fallback for short docs. */
  private[queries] def ngramCte(n: Int, src: String = "documents"): String =
    s"""sh AS (
       |  SELECT DISTINCT doc_id, s AS shingle FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(toks) >= $n
       |      THEN list_transform(generate_series(1, len(toks)-${n - 1}),
       |        i -> array_to_string(toks[i:i+${n - 1}], ' '))
       |      ELSE [array_to_string(toks, ' ')] END) AS s
       |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM $src)))""".stripMargin

  private[queries] val shingleCte: String = ngramCte(3)

  /** Shared q31/q125 oracle: the full df-capped 3-gram Jaccard pair
    * computation — the ad-hoc and stored-index plans both gate against
    * this ONE text. */
  private val ngramJaccardOracle: String =
    s"""WITH $shingleCte,
       |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 50),
       |rsh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM rsh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM rsh a JOIN rsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       | round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
       |FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) >= 0.3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** 32-bit simhash CTE chain ending in sig(doc_id, simhash). */
  private val simhashCte: String = {
    val dCols = (0 until 8)
      .map(c => s"instr('0123456789abcdef', substr(h, ${c + 1}, 1)) - 1 AS d$c")
      .mkString(", ")
    val sums = (0 until 32).map { i =>
      val c = i / 4; val k = i % 4
      s"sum(((d$c >> $k) & 1) * 2 - 1) AS s$i"
    }.mkString(", ")
    val bits = (0 until 32)
      .map(i => s"CASE WHEN s$i > 0 THEN '1' ELSE '0' END")
      .mkString(" || ")
    s"""toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
       |hh AS (SELECT doc_id, md5(tok) AS h FROM toks),
       |dd AS (SELECT doc_id, $dCols FROM hh),
       |ss AS (SELECT doc_id, $sums FROM dd GROUP BY doc_id),
       |sig AS (SELECT doc_id, $bits AS simhash FROM ss)""".stripMargin
  }

  /** Prepared embeddings CTE: e(vec_id, v DOUBLE[], nrm). */
  private val embCte: String =
    """e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
      |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings)""".stripMargin

  private def langScoreSql(words: Seq[String]): String =
    words.map(w => s"len(regexp_extract_all(text, '\\b$w\\b'))").mkString(" + ")

  /** TextAnalysis.qualityScore mirrored in DuckDB SQL — ONE definition
    * shared by the q39 profile oracle, the q74 sampling oracle and the
    * q77 canonical-selection oracle so they can never drift apart. */
  private[queries] val qualitySql: String = {
    val stop = langScoreSql(Seq("the", "a", "of", "is", "and"))
    s"""(CASE WHEN length(text) >= 200 AND length(text) <= 2000 THEN 1.0
       |        WHEN length(text) >= 50 THEN 0.5 ELSE 0.0 END) * 0.3
       |  + least(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |      / len(string_split(text, ' ')) * 2.0, 1.0) * 0.3
       |  + least(CAST($stop AS DOUBLE) / len(string_split(text, ' ')) * 5.0, 1.0) * 0.2
       |  + (1.0 - least(CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
       |      / length(text) * 10.0, 1.0)) * 0.2""".stripMargin
  }

  /** The q32 minhash+LSH oracle pipeline, parameterized on an extra
    * cand-CTE condition (q73 adds the at-least-one-new predicate).
    * The verify stage (kh/sizes/shared CTEs) runs on DISTINCT 63-bit
    * md5-half keys — (h1 mod 2^31)·2^32 + h2, max 2^63-1 so DuckDB's
    * checked BIGINT arithmetic cannot overflow — mirroring
    * TextDedup.keySetsFromDigests exactly: a key collision perturbs
    * both engines identically, keeping the compare exact. */
  /** q32's chain at minAgree = 0 over the full corpus — the oracle
    * for stored-band-index pair derivations (q99's pairsAll form). */
  private[queries] def minhashPairsSqlAnyAgree: String =
    minhashLshOracle("", minAgree = 0)

  private def minhashLshOracle(candExtra: String, minAgree: Int = 5): String = {
    import TextDedup.{permA, permB, minhashP}
    val mhs = (0 until 12).map(j =>
      s"min((h1 * ${permA(j)} + h2 * ${permB(j)} + $j) % $minhashP) AS mh$j")
      .mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      val ks = (0 until 3).map(r => s"CAST(mh${b * 3 + r} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $ks AS key FROM sigs"
    }.mkString(" UNION ALL ")
    val agree = (0 until 12)
      .map(j => s"(CASE WHEN sx.mh$j = sy.mh$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH $shingleCte,
       |hv AS (SELECT doc_id,
       |  CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
       |  CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2 FROM sh),
       |sigs AS (SELECT doc_id, $mhs FROM hv GROUP BY doc_id),
       |kh AS (SELECT DISTINCT doc_id,
       |  (h1 % 2147483648) * 4294967296 + h2 AS k FROM hv),
       |bands AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
       |   AND x.doc_id < y.doc_id
       |  JOIN sigs sx ON sx.doc_id = x.doc_id
       |  JOIN sigs sy ON sy.doc_id = y.doc_id
       |  WHERE $agree >= $minAgree$candExtra),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kh GROUP BY doc_id),
       |shared AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS shared
       |  FROM cand c JOIN kh a ON a.doc_id = c.doc_a
       |   JOIN kh b ON b.doc_id = c.doc_b AND b.k = a.k
       |  GROUP BY 1, 2)
       |SELECT s.doc_a, s.doc_b,
       | round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) AS jaccard
       |FROM shared s JOIN sizes sa ON s.doc_a = sa.doc_id
       | JOIN sizes sb ON s.doc_b = sb.doc_id
       |WHERE round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) >= 0.3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q135/q136: the q31 exact chain (df-uncapped) and the q32 LSH
    * chain (agreement exposed on the candidate) joined into
    * per-operating-point recall rows — each chain is the SAME SQL its
    * own gate already hash-matches. `sampleMod > 0` restricts BOTH
    * sides to pairs touching the doc_id % sampleMod == 0 sample
    * (q136's sampled contract); 0 = corpus-wide (q135). */
  private def lshRecallOracle: String = lshRecallOracleWith(0)

  private def lshRecallOracleWith(sampleMod: Int): String = {
    import TextDedup.{permA, permB, minhashP}
    val mhs = (0 until 12).map(j =>
      s"min((h1 * ${permA(j)} + h2 * ${permB(j)} + $j) % $minhashP) AS mh$j")
      .mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      val ks = (0 until 3).map(r => s"CAST(mh${b * 3 + r} AS VARCHAR)")
        .mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, $ks AS key FROM sigs"
    }.mkString(" UNION ALL ")
    val agree = (0 until 12)
      .map(j => s"(CASE WHEN sx.mh$j = sy.mh$j THEN 1 ELSE 0 END)")
      .mkString(" + ")
    val exactSample = if (sampleMod > 0)
      s"\n    AND (doc_a % $sampleMod = 0 OR doc_b % $sampleMod = 0)" else ""
    val candSample = if (sampleMod > 0)
      s"\n    AND (x.doc_id % $sampleMod = 0 OR y.doc_id % $sampleMod = 0)" else ""
    s"""WITH $shingleCte,
       |rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000000),
       |rsh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
       |sizes0 AS (SELECT doc_id, count(*) AS n_sh FROM rsh GROUP BY doc_id),
       |epairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM rsh a JOIN rsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT doc_a, doc_b FROM epairs
       |  JOIN sizes0 sa ON doc_a = sa.doc_id JOIN sizes0 sb ON doc_b = sb.doc_id
       |  WHERE round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) >= 0.3$exactSample),
       |hv AS (SELECT doc_id,
       |  CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
       |  CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2 FROM sh),
       |sigs AS (SELECT doc_id, $mhs FROM hv GROUP BY doc_id),
       |kh AS (SELECT DISTINCT doc_id,
       |  (h1 % 2147483648) * 4294967296 + h2 AS k FROM hv),
       |bands AS ($bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, $agree AS agree
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.key = y.key
       |   AND x.doc_id < y.doc_id
       |  JOIN sigs sx ON sx.doc_id = x.doc_id
       |  JOIN sigs sy ON sy.doc_id = y.doc_id
       |  WHERE $agree >= 5$candSample),
       |ksizes AS (SELECT doc_id, count(*) AS n_sh FROM kh GROUP BY doc_id),
       |vshared AS (
       |  SELECT c.doc_a, c.doc_b, c.agree, count(*) AS shared
       |  FROM cand c JOIN kh a ON a.doc_id = c.doc_a
       |   JOIN kh b ON b.doc_id = c.doc_b AND b.k = a.k
       |  GROUP BY 1, 2, 3),
       |found AS (
       |  SELECT v.doc_a, v.doc_b, v.agree
       |  FROM vshared v JOIN ksizes sa ON v.doc_a = sa.doc_id
       |   JOIN ksizes sb ON v.doc_b = sb.doc_id
       |  WHERE round(shared * 1.0 / (sa.n_sh + sb.n_sh - shared), 4) >= 0.3),
       |pts(min_agree) AS (VALUES (5), (11)),
       |summary AS (
       |  SELECT p.min_agree,
       |    CAST(count(*) AS BIGINT) AS n_exact,
       |    CAST(sum(CASE WHEN f.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found
       |  FROM pts p CROSS JOIN exact e
       |  LEFT JOIN found f ON f.doc_a = e.doc_a AND f.doc_b = e.doc_b
       |   AND f.agree >= p.min_agree
       |  GROUP BY p.min_agree)
       |SELECT min_agree, n_exact, n_found,
       |  CAST(round(n_found * 1.0 / n_exact * 10000, 0) AS BIGINT) / 10000.0 AS recall
       |FROM summary ORDER BY min_agree""".stripMargin
  }

  /** q119/q120 shared signature build: 64-bucket md5 token histogram
    * as the "pixel grid", then [[graft.ml.Multimodal.aHashBitsCol]]'s
    * exact-integer bit rule (bit = count*64 >= n_tokens — no float
    * mean, the q71 contract). Relational explode+groupBy shape (the
    * q115 precedent): md5 evaluated exactly once per token, map-side
    * combinable histogram agg, grid assembly over the ≤64-cell
    * aggregated array — no higher-order lambda ever re-touches text
    * or md5 (the CLAUDE.md re-evaluation trap). explode_outer per the
    * shingleTable note: plain explode's implicit size>0 filter gets
    * pushed below the repartition and re-runs the split on the
    * single-file input partition. */
  private def phashSigs(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"),
        explode_outer(col("toks")).as("tk"))
    val hist = tok
      .select(col("doc_id"), col("n"),
        (conv(substring(md5(col("tk")), 1, 8), 16, 10).cast("long") % 64)
          .cast("int").as("b"))
      .groupBy(col("doc_id"), col("n"), col("b"))
      .agg(count(lit(1)).as("c"))
    val cells = hist.groupBy(col("doc_id"), col("n"))
      .agg(collect_list(struct(col("b"), col("c"))).as("cells"))
    val grid = cells.select(col("doc_id"), col("n"),
      transform(sequence(lit(0), lit(63)), i =>
        // get() is null-safe past the array end (ANSI element_at
        // throws on the empty buckets this coalesce exists for)
        coalesce(get(filter(col("cells"),
          cl => cl.getField("b") === i), lit(0)).getField("c"), lit(0L)))
        .as("grid"))
    grid.select(col("doc_id"),
      graft.ml.Multimodal.aHashBitsCol(col("grid"), col("n")).as("sig"))
  }

  /** q119/q120 shared signature CTE (through `sig`): dense 64-bucket
    * histogram via generate_series cross join, integer-exact bit rule
    * c*64 >= n — mirrors [[phashSigs]] term for term. */
  private val phashSigCte: String =
    """WITH tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |tok AS (SELECT doc_id, len(toks) AS n, unnest(toks) AS tk FROM tt),
      |hb AS (SELECT doc_id, n,
      |  CAST(('0x' || substr(md5(tk), 1, 8)) AS BIGINT) % 64 AS b FROM tok),
      |hist AS (SELECT doc_id, n, b, count(*) AS c FROM hb GROUP BY 1, 2, 3),
      |dense AS (SELECT d.doc_id, d.n, gs.i AS b, coalesce(h.c, 0) AS c
      |  FROM (SELECT DISTINCT doc_id, n FROM hist) d
      |  CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) gs
      |  LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.b = gs.i),
      |sig AS (SELECT doc_id,
      |  string_agg(CASE WHEN c * 64 >= n THEN '1' ELSE '0' END, '' ORDER BY b) AS sig
      |  FROM dense GROUP BY doc_id)""".stripMargin

  /** The q54 IVF top-k oracle — shared verbatim by q112 (stored-index
    * probe), which must reproduce the from-scratch scores exactly. */
  /** Build-once memo for the stored IVF index q112/q116 probe (the
    * q54 config: cells=8, iters=0, deterministic first-k init). The
    * pre-write catalog/warehouse clear handles a prior session's
    * surviving managed-table dirs. */
  private def ensureQ112Index(s: SparkSession, dir: String): String = {
    val table = "g_q112_ivf_" + Integer.toHexString(dir.hashCode)
    if (!s.catalog.tableExists(table)) {
      for (t0 <- Seq(table, graft.ml.IvfIndex.centroidsTable(table),
          graft.ml.IvfIndex.statsTable(table)))
        graft.store.Bucketing.dropWithDir(s, t0)
      graft.ml.IvfIndex.write(t(s, dir, "embeddings"), table,
        cells = 8, iters = 0, buckets = 4)
    }
    table
  }

  /** Shared CTE prefix (through `ranked`) for the IVF-probe oracles —
    * q54/q112 append the top-k final SELECT, q116 appends the
    * brute-force recall comparison. A shared prefix constant instead
    * of string surgery on a finished query keeps the two finals from
    * silently diverging when the CTEs change. */
  /** The IVF CTE chain, parameterized on an extra candidate-side
    * predicate (q149 excludes tombstoned vectors; everything else
    * uses the unfiltered form via [[ivfCtePrefix]]). */
  private def ivfCte(candFilter: String): String =
    s"""WITH $embCte,
       |cent AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v AS c
       |  FROM e ORDER BY vec_id LIMIT 8),
       |ad AS (
       |  SELECT e.vec_id, cent.cell_id,
       |    list_dot_product(
       |      list_transform(generate_series(1, len(e.v)), i -> e.v[i] - cent.c[i]),
       |      list_transform(generate_series(1, len(e.v)), i -> e.v[i] - cent.c[i])) AS d2
       |  FROM e CROSS JOIN cent),
       |assigned AS (
       |  SELECT vec_id, cell_id FROM (
       |    SELECT vec_id, cell_id, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d2 ASC, cell_id ASC) AS rn FROM ad)
       |  WHERE rn = 1),
       |qcells AS (
       |  SELECT vec_id AS query_id, cell_id FROM (
       |    SELECT vec_id, cell_id, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY d2 ASC, cell_id ASC) AS rn
       |    FROM ad WHERE vec_id < 10)
       |  WHERE rn <= 2),
       |scored AS (
       |  SELECT q.query_id, c.vec_id AS cand_id,
       |    list_dot_product(qe.v, c.v) / (qe.nrm * c.nrm) AS cos
       |  FROM qcells q
       |  JOIN e qe ON qe.vec_id = q.query_id
       |  JOIN assigned a ON a.cell_id = q.cell_id
       |  JOIN e c ON c.vec_id = a.vec_id AND c.vec_id != q.query_id$candFilter),
       |ranked AS (
       |  SELECT query_id, cand_id, cos, row_number() OVER (
       |    PARTITION BY query_id ORDER BY round(cos, 6) DESC, cand_id) AS rnk
       |  FROM scored)""".stripMargin

  private lazy val ivfCtePrefix: String = ivfCte("")

  private lazy val ivfTopkOracleSql: String =
    ivfCtePrefix +
      """
        |SELECT query_id, cand_id, round(cos, 4) AS cos, rnk
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin

  val oracles: Map[String, String] = Map(
    "q30_exact_dedup" ->
      """SELECT md5(array_to_string(string_split(text, ' ')[1:2], ' ')) AS content_hash,
        | min(doc_id) AS keep_id, count(*) AS group_size,
        | array_to_string(list_sort(list(doc_id)), ',') AS members
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY content_hash""".stripMargin,

    "q31_ngram_jaccard" -> ngramJaccardOracle,

    // The indexed plan must reproduce the ad-hoc plan's output exactly
    // — ONE oracle text gates both (the q97/q101 containmentOracle
    // discipline: a semantics edit cannot reach one and leave the
    // other gating stale behavior).
    "q125_ngram_jaccard_indexed" -> ngramJaccardOracle,

    // Third plan, same semantics, same oracle (prefix-filtered form).
    "q133_ngram_jaccard_prefix" -> ngramJaccardOracle,

    // Mirrors TextDedup.minhashSignatures: ONE md5 per shingle, two
    // 32-bit halves, slot j = (h1*A_j + h2*B_j + j) mod 2^31-1 with the
    // A/B constants generated by the same permA/permB functions the
    // Spark side uses — byte-identical arithmetic in both engines. The
    // cand CTE mirrors the minAgree=5 slot-agreement estimate pre-filter.
    "q32_minhash_lsh" -> minhashLshOracle(""),

    // q32's pipeline with the at-least-one-new condition (docs >= 400
    // form the incoming batch) — mirrors minhashLshPairsIncremental.
    "q73_incremental_dedup" ->
      minhashLshOracle(" AND (x.doc_id >= 400 OR y.doc_id >= 400)"),

    // store half: per-source survivors of the %13 delete (counts +
    // id sums — the physical rewrite's content gate; HUGEINT sum cast
    // back per the q132 lesson). band half: q73's incremental chain
    // (minAgree=0, the BandIndex.probe differential) with the deleted
    // docs excluded on BOTH sides — a probe output that still
    // mentioned one would have no oracle row to hash against.
    "q150_forget_everywhere" -> {
      val band = minhashLshOracle(
        " AND (x.doc_id % 11 = 7 OR y.doc_id % 11 = 7)" +
          " AND x.doc_id % 13 <> 0 AND y.doc_id % 13 <> 0", minAgree = 0)
      s"""SELECT surface, a, b FROM (
         |  SELECT 'store:' || source AS surface, count(*) AS a,
         |    CAST(sum(doc_id) AS BIGINT) AS b
         |  FROM documents WHERE doc_id % 13 <> 0 GROUP BY source
         |  UNION ALL
         |  SELECT 'band' AS surface, doc_a AS a, doc_b AS b FROM ($band))
         |ORDER BY surface, a, b""".stripMargin
    },

    "q74_quality_sample" ->
      s"""WITH scored AS (SELECT doc_id, round($qualitySql, 4) AS quality,
         |  CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 AS bucket
         |  FROM documents)
         |SELECT doc_id, quality, bucket FROM scored
         |WHERE bucket < quality * 10000 ORDER BY doc_id""".stripMargin,

    "q33_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin,

    "q34_simhash_pairs" -> {
      val ham = (1 to 32)
        .map(i => s"(CASE WHEN substr(a.simhash, $i, 1) != substr(b.simhash, $i, 1) THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH $simhashCte,
         |bs AS (SELECT doc_id, simhash, substr(simhash, 1, 8) AS bucket FROM sig)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $ham AS hamming
         |FROM bs a JOIN bs b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
         |WHERE $ham <= 8
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "q35_embedding_neardup" ->
      s"""WITH $embCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         | round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q36_ann_brute" ->
      s"""WITH $embCte,
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM e q JOIN e c ON q.vec_id != c.vec_id
         |  WHERE q.vec_id < 10),
         |ranked AS (
         |  SELECT query_id, cand_id, cos, row_number() OVER (
         |    PARTITION BY query_id ORDER BY round(cos, 6) DESC, cand_id) AS rnk
         |  FROM scored)
         |SELECT query_id, cand_id, round(cos, 4) AS cos, rnk
         |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    "q37_ann_lsh" -> {
      val bucket = (1 to 4)
        .map(i => s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |  $bucket AS bucket FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
         |  FROM eb q JOIN eb c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
         |  WHERE q.vec_id < 10),
         |ranked AS (
         |  SELECT query_id, cand_id, cos, row_number() OVER (
         |    PARTITION BY query_id ORDER BY round(cos, 6) DESC, cand_id) AS rnk
         |  FROM scored)
         |SELECT query_id, cand_id, round(cos, 4) AS cos, rnk
         |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin
    },

    "q68_pii_scrub" -> {
      val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val ip = """\b(?:\d{1,3}\.){3}\d{1,3}\b"""
      val phone = """\b\d{3}[-]\d{3}[-]\d{4}\b"""
      s"""WITH full_t AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 2 = 0
         |      THEN ' reach me at u' || CAST(doc_id AS VARCHAR) || '@example.com'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 3 = 0
         |      THEN ' from 10.2.' || CAST(doc_id % 200 AS VARCHAR) || '.7'
         |      ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-867-5309' ELSE '' END
         |    AS full_text FROM documents)
         |SELECT doc_id,
         |  len(regexp_split_to_array(full_text, '$email')) - 1 AS n_emails,
         |  len(regexp_split_to_array(full_text, '$ip')) - 1 AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(full_text,
         |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
         |    '$phone', '<PHONE>', 'g')) AS scrubbed_hash
         |FROM full_t ORDER BY doc_id""".stripMargin
    },

    "q69_source_cap" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source ORDER BY md5(text), doc_id) AS rnk
        |  FROM documents)
        |SELECT doc_id, source, rnk FROM ranked
        |WHERE rnk <= 20 ORDER BY doc_id""".stripMargin,

    "q61_hash_split" ->
      """SELECT doc_id,
        | CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 AS bucket,
        | CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 90 THEN 'train'
        |      WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 100 < 95 THEN 'validation'
        |      ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q62_stratified_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rnk,
        |    count(*) OVER (PARTITION BY lang) AS n_lang
        |  FROM documents)
        |SELECT doc_id, lang, rnk FROM ranked
        |WHERE rnk <= ceil(n_lang * 0.1) ORDER BY doc_id""".stripMargin,

    "q63_sequence_packing" ->
      """WITH sized AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |pref AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix
        |  FROM sized)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(prefix / 2048.0) AS BIGINT) AS pack_id,
        |  prefix % 2048 AS offset_in_pack
        |FROM pref ORDER BY doc_id""".stripMargin,

    "q64_decontaminate" ->
      s"""WITH ${ngramCte(4)}
         |SELECT a.doc_id AS train_id,
         |  count(DISTINCT a.shingle) AS shared_grams,
         |  count(DISTINCT b.doc_id) AS eval_docs
         |FROM sh a JOIN sh b ON a.shingle = b.shingle
         |WHERE a.doc_id >= 25 AND b.doc_id < 25
         |GROUP BY a.doc_id ORDER BY train_id""".stripMargin,

    "q58_group_stats" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.95), 4) AS p95,
        | round(stddev_samp(value), 4) AS sd,
        | round(corr(value, epoch_ms(ts)), 4) AS corr_ts,
        | count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q59_topk_agg" ->
      """SELECT event_type, rnk, round(value, 4) AS score, event_id FROM (
        |  SELECT event_type, value, event_id, row_number() OVER (
        |    PARTITION BY event_type ORDER BY value DESC, event_id) AS rnk
        |  FROM events WHERE value IS NOT NULL)
        |WHERE rnk <= 3 ORDER BY event_type, rnk""".stripMargin,

    "q60_asof_forward" ->
      """WITH ord AS (
        |  SELECT o_orderkey, o_custkey AS user_id, epoch_ms(o_orderdate) AS ord_ms
        |  FROM orders),
        |ev AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, min(event_id) AS ev_id
        |  FROM events GROUP BY 1, 2)
        |SELECT o.o_orderkey, o.user_id, o.ord_ms,
        | e.ev_id AS next_event_id, e.ts_ms AS next_event_ms
        |FROM ord o ASOF LEFT JOIN ev e
        |  ON o.user_id = e.user_id AND o.ord_ms <= e.ts_ms
        |ORDER BY o.o_orderkey""".stripMargin,

    "q57_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events),
        |ord AS (
        |  SELECT o_custkey AS user_id, epoch_ms(o_orderdate) AS ord_ms,
        |    max(o_orderkey) AS ord_key
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts_ms,
        | o.ord_key AS last_order_key, o.ord_ms AS last_order_ms
        |FROM ev e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.user_id AND e.ts_ms >= o.ord_ms
        |ORDER BY e.event_id""".stripMargin,

    // q121: every count is the rule's definition written directly in
    // SQL; rule/target strings are the exact literals DataQuality
    // emits. DISTINCT-vs-Spark NULL-key caveat documented on Unique
    // (no NULL keys in these suites).
    "q121_data_quality" ->
      """SELECT rule, target, checked, violations,
        |  CAST(violations = 0 AS INTEGER) AS pass
        |FROM (
        |  SELECT 'not_null(o_custkey)' AS rule, 'o_custkey' AS target,
        |    (SELECT count(*) FROM orders) AS checked,
        |    (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS violations
        |  UNION ALL
        |  SELECT 'accepted(o_orderstatus)', 'o_orderstatus',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders
        |     WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O'))
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)', 'o_orderkey',
        |    (SELECT count(o_orderkey) FROM orders),
        |    (SELECT count(o_orderkey) - count(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL
        |  SELECT 'in_range(l_quantity,1.0,25.0)', 'l_quantity',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 25.0))
        |  UNION ALL
        |  SELECT 'unique(l_orderkey)', 'l_orderkey',
        |    (SELECT count(l_orderkey) FROM lineitem),
        |    (SELECT count(l_orderkey) - count(DISTINCT l_orderkey) FROM lineitem)
        |  UNION ALL
        |  SELECT 'ref_integrity(l_orderkey->orders.o_orderkey)', 'l_orderkey',
        |    (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL),
        |    (SELECT count(*) FROM lineitem l
        |     WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS (
        |       SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |  UNION ALL
        |  SELECT 'matches(lang)', 'lang',
        |    (SELECT count(*) FROM documents),
        |    (SELECT count(*) FROM documents
        |     WHERE lang IS NOT NULL AND NOT regexp_matches(lang, '^(?:[a-z]{2})$'))
        |  UNION ALL
        |  SELECT 'matches(source)', 'source',
        |    (SELECT count(*) FROM documents),
        |    (SELECT count(*) FROM documents
        |     WHERE source IS NOT NULL AND NOT regexp_matches(source, '^(?:src[0-9]+)$'))
        |  UNION ALL
        |  SELECT 'ref_integrity(user_id->customer.c_custkey)', 'user_id',
        |    (SELECT count(*) FROM events WHERE user_id IS NOT NULL),
        |    (SELECT count(*) FROM events e
        |     WHERE e.user_id IS NOT NULL AND NOT EXISTS (
        |       SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
        |) r ORDER BY rule""".stripMargin,

    "q122_quarantine" ->
      """SELECT l_orderkey, l_linenumber,
        |  rtrim(concat(
        |    CASE WHEN l_quantity IS NOT NULL
        |      AND (l_quantity < 1.0 OR l_quantity > 25.0)
        |      THEN 'in_range(l_quantity,1.0,25.0);' ELSE '' END,
        |    CASE WHEN l_orderkey IS NOT NULL AND NOT EXISTS (
        |        SELECT 1 FROM orders o
        |        WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
        |      THEN 'ref_integrity(l_orderkey->orders_f.o_orderkey);' ELSE '' END
        |  ), ';') AS reasons
        |FROM lineitem l
        |WHERE (l_quantity IS NOT NULL AND (l_quantity < 1.0 OR l_quantity > 25.0))
        |   OR (l_orderkey IS NOT NULL AND NOT EXISTS (
        |        SELECT 1 FROM orders o
        |        WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F'))
        |ORDER BY l_orderkey, l_linenumber, reasons""".stripMargin,

    // q128: the bottom-k sample written in window SQL — the k
    // smallest key hashes per group, the (value, hash)-ordered rank,
    // and the floor-indexed quantile pick, all over the SAME md5 hash
    // space so both engines select the identical rows
    "q128_kmv_quantiles" ->
      """WITH h AS (
        |  SELECT 'lang:' || lang AS grp,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
        |    CAST(n_chars AS DOUBLE) AS v
        |  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
        |  UNION ALL
        |  SELECT 'src:' || source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
        |    CAST(n_chars AS DOUBLE)
        |  FROM documents WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL),
        |r AS (SELECT grp, h, v,
        |        row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
        |      FROM h),
        |s AS (SELECT grp, h, v FROM r WHERE rn <= 32),
        |o AS (SELECT grp, v,
        |        row_number() OVER (PARTITION BY grp ORDER BY v, h) AS vr,
        |        count(*) OVER (PARTITION BY grp) AS m
        |      FROM s)
        |SELECT grp, CAST(max(m) AS BIGINT) AS n_sample,
        |  max(CASE WHEN vr = CAST(floor(0.5 * (m - 1)) AS BIGINT) + 1 THEN v END) AS p50,
        |  max(CASE WHEN vr = CAST(floor(0.9 * (m - 1)) AS BIGINT) + 1 THEN v END) AS p90
        |FROM o GROUP BY grp ORDER BY grp""".stripMargin,

    // q127: the same deterministic sample formula written over
    // generate_series — window energies as exact integer sums, cosine
    // as the identical three IEEE ops on them
    "q127_audio_neardup" ->
      """WITH d AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |         512 + (doc_id % 4) * 128 AS n
        |  FROM documents WHERE doc_id < 200),
        |smp AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d),
        |sv AS (SELECT doc_id, (i * 16) // n AS w,
        |  CASE WHEN ((i * 16) // n + doc_id % 5) % 4 < 2
        |       THEN (i * 7 + doc_id) % 61 - 30 ELSE 0 END AS s
        |  FROM smp),
        |env AS (SELECT doc_id, w, CAST(sum(s * s) AS BIGINT) AS e
        |        FROM sv GROUP BY 1, 2),
        |nrm AS (SELECT doc_id, CAST(sum(e * e) AS BIGINT) AS n2
        |        FROM env GROUP BY doc_id),
        |dots AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         CAST(sum(a.e * b.e) AS BIGINT) AS dot
        |  FROM env a JOIN env b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, dot,
        |  CAST(round(dot / (sqrt(na.n2) * sqrt(nb.n2)) * 10000) AS BIGINT)
        |    / 10000.0 AS cos_sim
        |FROM dots
        | JOIN nrm na ON doc_a = na.doc_id
        | JOIN nrm nb ON doc_b = nb.doc_id
        |WHERE dot / (sqrt(na.n2) * sqrt(nb.n2)) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,

    // q123: the KMV definition written directly in window SQL — the
    // per-group k minima of the SAME md5-derived 60-bit hash space,
    // kth-minimum hash gated exactly, estimate = (k−1)·2^60/h_k from
    // identically-rounded doubles both sides
    "q123_kmv_distinct" ->
      """WITH h AS (
        |  SELECT 'events:' || event_type AS grp,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'docs:' || lang,
        |    CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT)
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY grp) AS nd FROM h),
        |s AS (
        |  SELECT grp, CAST(LEAST(min(nd), 64) AS BIGINT) AS n_mins,
        |    max(CASE WHEN rn = LEAST(nd, 64) THEN h END) AS h_k
        |  FROM r GROUP BY grp),
        |ex AS (
        |  SELECT 'events:' || event_type AS grp,
        |    count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
        |  UNION ALL
        |  SELECT 'docs:' || lang, count(DISTINCT source) FROM documents GROUP BY 1)
        |SELECT s.grp, s.n_mins, s.h_k,
        |  CASE WHEN s.n_mins < 64 THEN CAST(s.n_mins AS DOUBLE)
        |       ELSE CAST(round(63.0 * 1152921504606846976 / s.h_k * 100) AS BIGINT) / 100.0
        |  END AS distinct_est,
        |  ex.n_exact
        |FROM s JOIN ex ON s.grp = ex.grp ORDER BY s.grp""".stripMargin,

    // q124: both sketches, their union's k minima, and the membership
    // fraction written directly in window SQL — same hash space, same
    // branch structure, same operation order as the Spark side
    "q124_kmv_overlap" ->
      """WITH ah AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents WHERE n_chars > 300),
        |ak AS (SELECT h FROM (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ah) WHERE rn <= 64),
        |bh AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM documents WHERE lang = 'en'),
        |bk AS (SELECT h FROM (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn FROM bh) WHERE rn <= 64),
        |u AS (SELECT h FROM (
        |  SELECT h, row_number() OVER (ORDER BY h) AS rn
        |  FROM (SELECT h FROM ak UNION SELECT h FROM bk)) WHERE rn <= 64),
        |s AS (
        |  SELECT count(*) AS nu, max(h) AS hk,
        |    count(*) FILTER (h IN (SELECT h FROM ak)
        |                 AND h IN (SELECT h FROM bk)) AS nb
        |  FROM u)
        |SELECT 'docs' AS grp, nu AS n_union_mins, hk AS h_k, nb AS n_both,
        |  CAST(round(CAST(nb AS DOUBLE) / nu * 10000) AS BIGINT) / 10000.0
        |    AS jaccard_est,
        |  CAST(round(nb * (CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
        |                        ELSE 63.0 * 1152921504606846976 / hk END)
        |             / nu * 100) AS BIGINT) / 100.0
        |    AS inter_est
        |FROM s""".stripMargin,

    "q55_salted_hotkey_agg" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q56_stopword_prune" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |top AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |    ORDER BY n DESC, tok LIMIT 10)),
        |sl AS (SELECT list(tok) AS stops FROM top)
        |SELECT doc_id,
        | len(string_split(text, ' ')) AS n_before,
        | len(list_filter(string_split(text, ' '), t -> NOT list_contains(sl.stops, t))) AS n_after,
        | md5(array_to_string(
        |   list_filter(string_split(text, ' '), t -> NOT list_contains(sl.stops, t)), ' ')) AS cleaned_hash
        |FROM documents CROSS JOIN sl ORDER BY doc_id""".stripMargin,

    "q53_embedding_neardup_blocked" -> {
      val bucket = (1 to 4)
        .map(i => s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)")
        .mkString(" || ")
      s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
         |  $bucket AS bucket FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         | round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos
         |FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin
    },

    // IVF: centroids = 8 lowest vec_ids (iters=0), assignment = argmin
    // of d2 over cells, queries probe the 2 nearest cells, cosine top-3
    // within probed cells. d2 = ldp(diff, diff) over the element-wise
    // diff list == Spark's sequential fold of squared diffs, bit-exact.
    "q54_ivf_topk" -> ivfTopkOracleSql,

    // q116: q54's approx CTEs + a brute-force exact ranking over the
    // same vectors; recall = |approx ∩ exact| / |exact| per query
    // (|exact| = min(k, corpus-1) — flat k under-reads small corpora)
    "q116_ann_recall" -> (ivfCtePrefix +
      """, brute AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, row_number() OVER (
        |    PARTITION BY q.vec_id
        |    ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC,
        |      c.vec_id) AS rnk
        |  FROM e q JOIN e c ON c.vec_id != q.vec_id WHERE q.vec_id < 10),
        |hits AS (
        |  SELECT b.query_id,
        |    CAST(sum(CASE WHEN r.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
        |    count(*) AS n_exact
        |  FROM (SELECT query_id, cand_id FROM brute WHERE rnk <= 3) b
        |  LEFT JOIN (SELECT query_id, cand_id FROM ranked WHERE rnk <= 3) r
        |    USING (query_id, cand_id)
        |  GROUP BY b.query_id)
        |SELECT query_id, hits, round(CAST(hits AS DOUBLE) / n_exact, 4) AS recall
        |FROM hits ORDER BY query_id""".stripMargin),

    // q129: both legs recomputed from raw data — the BM25 chain is the
    // q102 oracle text (query docs < 10, k=5), the vector leg is the
    // IVF assignment CTEs (renamed to avoid colliding with the fused
    // ranking's names; identical arithmetic to ivfCtePrefix, k=3,
    // nprobe=2) — then RRF-fused with the same integer-rank math as
    // HybridRetrieval.rrfFuse. Leg ranks emit 0 when a leg missed the
    // candidate (nullable rank columns would compare as NaN-laden
    // floats; exact longs are the stronger gate).
    "q129_hybrid_rrf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
         |st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 10),
         |contrib AS (
         |  SELECT qt.query_id, tf.doc_id,
         |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
         |      (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS c
         |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
         |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
         |lscored AS (SELECT query_id, doc_id, sum(c) AS score FROM contrib GROUP BY 1, 2),
         |lex AS (
         |  SELECT query_id, cand_id, lrnk FROM (
         |    SELECT query_id, doc_id AS cand_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) AS lrnk
         |    FROM lscored) WHERE lrnk <= 5),
         |$embCte,
         |cent AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v AS c
         |  FROM e ORDER BY vec_id LIMIT 8),
         |ad AS (
         |  SELECT e.vec_id, cent.cell_id,
         |    list_dot_product(
         |      list_transform(generate_series(1, len(e.v)), i -> e.v[i] - cent.c[i]),
         |      list_transform(generate_series(1, len(e.v)), i -> e.v[i] - cent.c[i])) AS d2
         |  FROM e CROSS JOIN cent),
         |assigned AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT vec_id, cell_id, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell_id ASC) AS rn FROM ad)
         |  WHERE rn = 1),
         |qcells AS (
         |  SELECT vec_id AS query_id, cell_id FROM (
         |    SELECT vec_id, cell_id, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell_id ASC) AS rn
         |    FROM ad WHERE vec_id < 10)
         |  WHERE rn <= 2),
         |vscored AS (
         |  SELECT q.query_id, c.vec_id AS cand_id,
         |    list_dot_product(qe.v, c.v) / (qe.nrm * c.nrm) AS cos
         |  FROM qcells q
         |  JOIN e qe ON qe.vec_id = q.query_id
         |  JOIN assigned a ON a.cell_id = q.cell_id
         |  JOIN e c ON c.vec_id = a.vec_id AND c.vec_id != q.query_id),
         |vec AS (
         |  SELECT query_id, cand_id, vrnk FROM (
         |    SELECT query_id, cand_id, row_number() OVER (
         |      PARTITION BY query_id ORDER BY round(cos, 6) DESC, cand_id) AS vrnk
         |    FROM vscored) WHERE vrnk <= 3),
         |fused AS (
         |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         |    coalesce(l.cand_id, v.cand_id) AS cand_id,
         |    coalesce(l.lrnk, 0) AS lex_rnk, coalesce(v.vrnk, 0) AS vec_rnk
         |  FROM lex l FULL OUTER JOIN vec v
         |    ON l.query_id = v.query_id AND l.cand_id = v.cand_id),
         |rrfed AS (
         |  SELECT query_id, cand_id, lex_rnk, vec_rnk,
         |    (CASE WHEN lex_rnk > 0 THEN 1.0 / (60 + lex_rnk) ELSE 0.0 END) +
         |    (CASE WHEN vec_rnk > 0 THEN 1.0 / (60 + vec_rnk) ELSE 0.0 END) AS rrf
         |  FROM fused),
         |franked AS (
         |  SELECT query_id, cand_id, lex_rnk, vec_rnk, rrf, row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf DESC, cand_id) AS rnk
         |  FROM rrfed)
         |SELECT query_id, rnk, cand_id, lex_rnk, vec_rnk,
         |  CAST(round(rrf * 1000000, 0) AS BIGINT) / 1000000.0 AS rrf_score
         |FROM franked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // q130: same blocking, cap, length prefilter and distance as
    // FuzzyJoin.blockedCandidates — every candidate pair's levenshtein
    // is pinned cross-engine (DuckDB and Spark both implement the
    // classic full edit-distance DP).
    "q130_fuzzy_join" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:14], ' ') AS title,
        |    array_to_string(string_split(text, ' ')[1:2], ' ') AS blk
        |  FROM documents),
        |ok AS (SELECT blk FROM t GROUP BY blk HAVING count(*) <= 64),
        |tk AS (SELECT t.* FROM t JOIN ok USING (blk))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist,
        |  levenshtein(a.title, b.title) <= 8 AS is_match
        |FROM tk a JOIN tk b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE abs(length(a.title) - length(b.title)) <= 8
        |ORDER BY id_a, id_b""".stripMargin,

    // q131: the q130 match edges through the q51 recursive-CTE
    // component labeling (min-id cluster labels, same as
    // DedupClusters.assign's contract).
    "q131_fuzzy_clusters" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(text, ' ')[1:14], ' ') AS title,
        |    array_to_string(string_split(text, ' ')[1:2], ' ') AS blk
        |  FROM documents),
        |ok AS (SELECT blk FROM t GROUP BY blk HAVING count(*) <= 64),
        |tk AS (SELECT t.* FROM t JOIN ok USING (blk)),
        |m AS (
        |  SELECT a.doc_id AS s0, b.doc_id AS d0
        |  FROM tk a JOIN tk b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |  WHERE abs(length(a.title) - length(b.title)) <= 8
        |    AND levenshtein(a.title, b.title) <= 8),
        |edges AS (SELECT s0 AS s, d0 AS d FROM m UNION SELECT d0, s0 FROM m),
        |reach(doc_id, label) AS (
        |  SELECT DISTINCT s, s FROM edges
        |  UNION
        |  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc_id),
        |labels AS (
        |  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id)
        |SELECT cluster_id, count(*) AS size,
        | array_to_string(list_sort(list(doc_id)), ',') AS members
        |FROM labels GROUP BY cluster_id HAVING count(*) > 1
        |ORDER BY cluster_id""".stripMargin,

    "q135_lsh_recall" -> lshRecallOracle,

    "q136_lsh_recall_sampled" -> lshRecallOracleWith(3),

    // q137: brute-force sample×corpus edit-distance truth vs the q130
    // blocked screen, per blockCap point (found pairs carry their
    // block population bn; points filter on it)
    "q137_fuzzy_block_recall" ->
      """WITH docs AS (
        |  SELECT doc_id AS id,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 14), ' ') AS s,
        |    array_to_string(list_slice(string_split(text, ' '), 1, 2), ' ') AS blk
        |  FROM documents),
        |exact AS (
        |  SELECT DISTINCT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b
        |  FROM docs a JOIN docs b ON a.id <> b.id
        |  WHERE a.id < 100 AND abs(length(a.s) - length(b.s)) <= 8
        |    AND levenshtein(a.s, b.s) <= 8),
        |sizes AS (SELECT blk, count(*) AS bn FROM docs GROUP BY blk),
        |cand AS (
        |  SELECT a.id AS id_a, b.id AS id_b, z.bn
        |  FROM docs a JOIN docs b ON a.blk = b.blk AND a.id < b.id
        |  JOIN sizes z ON z.blk = a.blk
        |  WHERE (a.id < 100 OR b.id < 100)
        |    AND abs(length(a.s) - length(b.s)) <= 8
        |    AND levenshtein(a.s, b.s) <= 8),
        |pts(block_cap) AS (VALUES (3), (64)),
        |summary AS (
        |  SELECT p.block_cap,
        |    CAST(count(*) AS BIGINT) AS n_exact,
        |    CAST(sum(CASE WHEN f.id_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found
        |  FROM pts p CROSS JOIN exact e
        |  LEFT JOIN cand f ON f.id_a = e.id_a AND f.id_b = e.id_b
        |   AND f.bn <= p.block_cap
        |  GROUP BY p.block_cap)
        |SELECT block_cap, n_exact, n_found,
        |  CAST(round(n_found * 1.0 / n_exact * 10000, 0) AS BIGINT) / 10000.0 AS recall
        |FROM summary ORDER BY block_cap""".stripMargin,

    // q132: the same integer slot arithmetic — cum·m and the floor
    // divisions all in BIGINT (DuckDB's sum() returns HUGEINT, cast
    // back down before the division so both engines divide the same
    // 64-bit integers).
    "q132_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS wt
        |  FROM documents WHERE n_chars > 0),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS t FROM w),
        |c AS (SELECT doc_id, wt,
        |  CAST(sum(wt) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM w)
        |SELECT doc_id, wt,
        |  (cum * 400) // t - ((cum - wt) * 400) // t AS n_copies
        |FROM c CROSS JOIN tot
        |WHERE (cum * 400) // t - ((cum - wt) * 400) // t > 0
        |ORDER BY doc_id""".stripMargin,

    // q134: q132's slot arithmetic, replicas exploded via
    // generate_series, sharded by the (doc_id, copy) composite md5 —
    // the q118 shard/tokenizer contract.
    "q134_resampled_manifest" ->
      """WITH w AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS wt, text
        |  FROM documents WHERE n_chars > 0),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS t FROM w),
        |c AS (SELECT doc_id, wt, text,
        |  CAST(sum(wt) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM w),
        |picked AS (
        |  SELECT doc_id, text,
        |    (cum * 400) // t - ((cum - wt) * 400) // t AS nc
        |  FROM c CROSS JOIN tot
        |  WHERE (cum * 400) // t - ((cum - wt) * 400) // t > 0),
        |rep AS (
        |  SELECT doc_id, text, unnest(generate_series(1, nc)) AS copy
        |  FROM picked),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(
        |      CAST(doc_id AS VARCHAR) || '#' || CAST(copy AS VARCHAR)
        |    ), 1, 8) AS BIGINT) % 16 AS INT) AS shard,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      t -> length(t) > 0)) AS BIGINT) AS tk,
        |    CAST(length(text) AS BIGINT) AS ch
        |  FROM rep)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(sum(tk) AS BIGINT) AS n_toks,
        |  CAST(sum(ch) AS BIGINT) AS n_chars
        |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,

    // q115: hashed-bigram importance weights; md5 bucketing is the q61
    // cross-engine hash, counts are exact integers (add-1 smoothing),
    // each probability ONE division, selection from the ROUNDED weight
    "q115_dsir_selection" ->
      """WITH tt AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |pos AS (SELECT doc_id, lang, unnest(generate_series(1, len(toks) - 1)) AS i, toks
        |        FROM tt),
        |inst AS (
        |  SELECT doc_id, lang = 'en' AS is_t,
        |    CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1]), 1, 8)) AS BIGINT) % 256 AS f
        |  FROM pos),
        |sstat AS (SELECT f, count(*) AS ns,
        |    CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS nt
        |  FROM inst GROUP BY f),
        |tot AS (SELECT (SELECT CAST(sum(ns) AS DOUBLE) FROM sstat) AS st,
        |               (SELECT CAST(sum(nt) AS DOUBLE) FROM sstat) AS tt2),
        |w AS (
        |  SELECT doc_id,
        |    round(sum(ln((nt + 1) / (tt2 + 256)) - ln((ns + 1) / (st + 256))), 4) AS logw
        |  FROM inst JOIN sstat USING (f) CROSS JOIN tot
        |  GROUP BY doc_id)
        |SELECT doc_id, logw,
        |  CAST(CASE WHEN logw > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
        |FROM w ORDER BY doc_id""".stripMargin,

    // q117: same integer coefficient table derived from the same
    // formula ((i*37)%13 - 6 for bucket i), md5 bucket = the q61
    // hash; exact-integer emission, ordering division of exact ints
    "q117_classifier_score" -> {
      val coefs = (0 until 64).map(i => (i * 37) % 13 - 6)
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS INT) AS bk
         |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
         |        FROM documents)
         |  WHERE length(tok) > 0),
         |s AS (
         |  SELECT doc_id,
         |    CAST(sum(${coefs.mkString("[", ", ", "]")}[bk + 1]) AS BIGINT) AS sum_coef,
         |    CAST(count(*) AS BIGINT) AS n_toks
         |  FROM b GROUP BY doc_id)
         |SELECT doc_id, sum_coef, n_toks
         |FROM s
         |ORDER BY CAST(sum_coef AS DOUBLE) / n_toks DESC, doc_id
         |LIMIT 100""".stripMargin
    },

    // q118: md5-of-decimal-doc_id shard bucket (the q61 hash form) +
    // whitespace token counts (the q117 tokenizer contract); all
    // integer emission
    "q118_shard_manifest" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 16 AS INT) AS shard,
        |    CAST(len(list_filter(string_split(lower(text), ' '), t -> length(t) > 0)) AS BIGINT) AS tk,
        |    CAST(length(text) AS BIGINT) AS ch
        |  FROM documents)
        |SELECT shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tk) AS BIGINT) AS n_toks,
        |  CAST(sum(ch) AS BIGINT) AS n_chars
        |FROM tk GROUP BY shard ORDER BY shard""".stripMargin,

    // q119/q120: 64-bucket md5 token histogram as the pixel grid,
    // aHash bit = c*64 >= n (exact integers both sides). The pairs
    // oracle is deliberately ALL-PAIRS (no banding): Spark's banded
    // hamming-LSH claims pigeonhole exactness for maxDist < bands, so
    // the unblocked form is the stronger comparator — any pair the
    // bands failed to generate would hash-mismatch here.
    "q119_phash_sig" ->
      (phashSigCte + "\nSELECT doc_id, sig FROM sig ORDER BY doc_id"),

    "q120_phash_pairs" -> {
      val ham = (1 to 64)
        .map(i => s"(CASE WHEN substr(a.sig, $i, 1) != substr(b.sig, $i, 1) THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""$phashSigCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $ham AS hamming
         |FROM sig a JOIN sig b
         |  ON a.doc_id < b.doc_id AND a.doc_id < 600 AND b.doc_id < 600
         |WHERE $ham <= 2
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    // q114: the q54 cell-assignment CTEs + within-cell better-neighbor
    // rule; d2 and cos folds are list_dot_product — bit-identical to
    // the Spark VectorOps expressions (the q54 precedent)
    "q114_semantic_dedup" ->
      s"""WITH $embCte,
         |cent AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id, v AS c
         |  FROM e ORDER BY vec_id LIMIT 8),
         |ad AS (
         |  SELECT e.vec_id, cent.cell_id,
         |    list_dot_product(
         |      list_transform(generate_series(1, len(e.v)), i -> e.v[i] - cent.c[i]),
         |      list_transform(generate_series(1, len(e.v)), i -> e.v[i] - cent.c[i])) AS d2
         |  FROM e CROSS JOIN cent),
         |assigned AS (
         |  SELECT vec_id, cell_id, d2 FROM (
         |    SELECT vec_id, cell_id, d2, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell_id ASC) AS rn FROM ad)
         |  WHERE rn = 1),
         |dropped AS (
         |  SELECT DISTINCT a.vec_id FROM assigned a
         |  JOIN assigned b ON b.cell_id = a.cell_id AND b.vec_id != a.vec_id
         |  JOIN e ea ON ea.vec_id = a.vec_id
         |  JOIN e eb ON eb.vec_id = b.vec_id
         |  WHERE round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) >= 0.45
         |    AND (b.d2 < a.d2 OR (b.d2 = a.d2 AND b.vec_id < a.vec_id)))
         |SELECT a.vec_id, CAST(a.cell_id AS INTEGER) AS cell_id,
         |  CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM assigned a LEFT JOIN dropped d ON d.vec_id = a.vec_id
         |ORDER BY a.vec_id""".stripMargin,

    // Same oracle, indexed path: the stored IvfIndex probe must
    // reproduce the from-scratch IVF scores — the q83→q102 precedent
    // applied to the vector index.
    "q112_ivf_indexed" -> ivfTopkOracleSql,

    // same chain, candidate side minus the deleted vectors; centroids
    // and assignments stay full-corpus (the immediate-forget contract)
    "q149_forget_ann" -> (ivfCte(" AND c.vec_id % 13 <> 0") +
      """
        |SELECT query_id, cand_id, round(cos, 4) AS cos, rnk
        |FROM ranked WHERE rnk <= 3 ORDER BY query_id, rnk""".stripMargin),

    "q38_lang_id" -> {
      val scores = TextAnalysis.langProfiles
        .map { case (l, ws) => s"${langScoreSql(ws)} AS s_$l" }.mkString(",\n ")
      val langs = TextAnalysis.langProfiles.map(_._1)
      val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val cases = langs
        .map(l => s"WHEN s_$l = $best AND s_$l > 0 THEN '$l'").mkString(" ")
      s"""WITH scored AS (SELECT doc_id, lang,
         | $scores
         |FROM documents)
         |SELECT doc_id, lang, CASE $cases ELSE 'und' END AS pred_lang
         |FROM scored ORDER BY doc_id""".stripMargin
    },

    "q39_text_profile" ->
      s"""SELECT doc_id,
         | len(string_split(text, ' ')) AS n_tokens,
         | len(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_subwords,
         | len(list_distinct(string_split(text, ' '))) AS n_distinct,
         | round($qualitySql, 4) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q40_doc_fingerprint" ->
      s"""WITH $shingleCte
         |SELECT doc_id, min(md5(shingle)) AS fingerprint, count(*) AS n_shingles
         |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q41_range_join" ->
      """SELECT n_name, count(*) AS n_items, round(sum(l_quantity), 2) AS qty
        |FROM nation JOIN lineitem
        | ON l_quantity >= n_nationkey * 2 + 1 AND l_quantity <= n_nationkey * 2 + 2
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q42_rollup" ->
      """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
        | count(*) AS n
        |FROM documents GROUP BY ROLLUP(lang, source) ORDER BY lang, source""".stripMargin,

    // Mirrors SpanDedup.removeDuplicateSpans(k=5, dfMax=1) on gram
    // STRINGS (Spark joins 64-bit gram keys — q31 precedent). 1-based
    // positions throughout (Spark's are 0-based; indices are internal,
    // the outputs are position-free). Docs shorter than 5 tokens
    // contribute no grams and pass through unchanged via the left
    // joins.
    "q76_span_dedup" ->
      """WITH tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |pos0 AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 4)) AS s, toks FROM tt),
        |g AS (SELECT doc_id, s, array_to_string(toks[s:s+4], ' ') AS gram FROM pos0),
        |hot AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) > 1),
        |hs AS (SELECT doc_id, s FROM g JOIN hot USING (gram)),
        |ptok AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS p, toks FROM tt),
        |cov AS (SELECT DISTINCT ptok.doc_id, ptok.p FROM ptok
        |  JOIN hs ON ptok.doc_id = hs.doc_id AND ptok.p BETWEEN hs.s AND hs.s + 4),
        |kept AS (
        |  SELECT k.doc_id, array_to_string(list(k.toks[k.p] ORDER BY k.p), ' ') AS cleaned,
        |    count(*) AS n_kept
        |  FROM (SELECT ptok.doc_id, ptok.p, ptok.toks FROM ptok
        |        LEFT JOIN cov ON ptok.doc_id = cov.doc_id AND ptok.p = cov.p
        |        WHERE cov.p IS NULL) k
        |  GROUP BY k.doc_id)
        |SELECT tt.doc_id, CAST(len(tt.toks) AS BIGINT) AS n_tokens,
        | CAST(len(tt.toks) - coalesce(kept.n_kept, 0) AS BIGINT) AS n_removed,
        | md5(coalesce(kept.cleaned, '')) AS cleaned_hash
        |FROM tt LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // Mirrors q78: keep rate sqrt(n_min/n_l) per language, content-
    // hash acceptance draw. DuckDB '/' on integers is float division,
    // but the cast keeps it explicit and engine-proof.
    "q78_lang_mixture" ->
      """WITH counts AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
        |m AS (SELECT min(n_lang) AS n_min FROM counts),
        |rates AS (SELECT lang, n_lang,
        |  sqrt(CAST(n_min AS DOUBLE) / n_lang) AS rate FROM counts CROSS JOIN m)
        |SELECT doc_id, lang, n_lang, round(rate, 4) AS rate
        |FROM documents JOIN rates USING (lang)
        |WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 10000 < rate * 10000
        |ORDER BY doc_id""".stripMargin,

    "q43_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_hash,
        | 64 + octet_length(encode(text)) % 512 AS width,
        | 64 + (octet_length(encode(text)) * 7) % 512 AS height,
        | octet_length(encode(text)) % 16 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)
}
