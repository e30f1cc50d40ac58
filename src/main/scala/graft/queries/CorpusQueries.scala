package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Corpus-statistics operators: unigram-LM surprisal scoring (the
  * statistical upgrade of the heuristic quality score) and event
  * sessionization (gap-based session assignment) — both classic
  * training-data/behavior-pipeline ops with exact oracles.
  *
  * Oracle-portability rule (hard-won): NEVER emit a bare integer
  * `sum()` from a DuckDB oracle — DuckDB `sum(INTEGER)` returns
  * HUGEINT (int128), which hash-mismatches Spark's BIGINT even when
  * every value is equal. Always `CAST(sum(x) AS BIGINT)`. `count(*)`
  * is already BIGINT and needs no cast.
  */
object CorpusQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Unigram language-model surprisal: p(tok) estimated from the
    // corpus itself; per-doc mean -ln p. High surprisal = unusual
    // token mix (gibberish/outlier detector). Scale (r11 rewrite, the
    // q82 docpart pattern): ONE explode pass builds the (doc_id, tok)
    // tf table; BOTH the LM (vocab agg of tf) and the per-doc score
    // (tf-weighted mean) derive from that vocab×docs-sized frame, so
    // the corpus is exploded exactly once — the shipped r10 form paid
    // a second full explode for the scoring join (AbBench r11:
    // 0.56→0.46 s min at sf0.1; explode floor 0.15 s, LM pass 0.27 s).
    // The corpus total folds in via a 1-row broadcast crossJoin —
    // never a driver count() of the exploded corpus. tf feeds two
    // consumers (vocab agg + scoring join) ⇒ persist; vocab-bounded
    // residency, reclaimed when the result frame is GC'd.
    // At 100 TB the lm broadcast becomes a shuffle join on tok — tf is
    // already the small side's natural partitioning input.
    // Reference-LM bigram surprisal (r16, ml/NgramLm — the CCNet
    // quality-filter primitive q48 only approximates: train a Stupid
    // Backoff bigram LM on the doc_id < 250 REFERENCE slice, score
    // the rest; transitions the reference never saw take the add-1-
    // smoothed unigram backoff, so the backoff path — the part q48
    // structurally lacks — is live at every gate scale (n_backoff > 0
    // on most scored docs). At sf0.1 the reference is 5% of the
    // corpus: the LM tables are reference-bounded and broadcast while
    // small, which is the recipe's actual 100 TB shape (curated
    // reference ≪ scored crawl).
    "q138_bigram_backoff" -> { (s, dir) =>
      graft.ml.NgramLm.bigramSurprisal(
          t(s, dir, "documents")
            .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
          isRef = col("doc_id") < 250)
        .orderBy(col("doc_id"))
    },

    "q48_unigram_surprisal" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      val tf = docs
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("n"))
      val lm = vocab.crossJoin(broadcast(vocab.agg(sum(col("n")).as("total"))))
        .select(col("tok"), log(col("n") / col("total").cast("double")).as("logp"))
      tf.join(broadcast(lm), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(round(sum(-col("logp") * col("tf")) / sum(col("tf")).cast("double"), 4)
          .as("surprisal"),
          sum(col("tf")).as("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // Sessionization: a new session starts after a >1h silence per
    // user; running sum of session starts assigns session indexes —
    // all partition-scoped windows.
    "q49_sessionize" -> { (s, dir) =>
      val wLag = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("gap_s",
          (unix_millis(col("ts")) - lag(unix_millis(col("ts")), 1).over(wLag)) / 1000)
        .withColumn("new_session",
          when(col("gap_s").isNull || col("gap_s") > 3600, 1).otherwise(0))
        .withColumn("session_idx", sum(col("new_session")).over(wRun))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_millis(col("ts"))).as("start_ms"),
          (max(unix_millis(col("ts"))) - min(unix_millis(col("ts")))).as("duration_ms"))
        .orderBy(col("user_id"), col("session_idx"))
    })

  // Gopher-style repetition filters (token-level on this single-line
  // corpus): type-token ratio complement and top-token dominance.
  private val q50 = "q50_repetition_filters" -> { (s: SparkSession, dir: String) =>
    val docs = t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("n"))
    counts.groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("top_n"))
      .select(col("doc_id"),
        round(lit(1.0) - col("n_distinct") / col("n_tokens").cast("double"), 4)
          .as("dup_fraction"),
        round(col("top_n") / col("n_tokens").cast("double"), 4).as("top_share"),
        col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  // Dedup cluster assignment over the MinHash-LSH near-dup graph:
  // connected components (min-label propagation), canonical keeper per
  // cluster. Only multi-member clusters emitted.
  private val q51 = "q51_dedup_clusters" -> { (s: SparkSession, dir: String) =>
    val docs = t(s, dir, "documents")
    // localCheckpoint before assign: the cluster probe's executeTake
    // scale-up otherwise re-runs the LSH verify stage per attempt
    // (the q131 finding applied here — r16 AbBench interleaved sf0.1
    // min 0.89 s checkpointed vs 1.23 not)
    val pairs = graft.ml.TextDedup.minhashLshPairs(docs, n = 3, k = 12,
      bands = 4, threshold = 0.3, minAgree = 5)
      .localCheckpoint()
    graft.ml.DedupClusters.assign(docs.select(col("doc_id")), pairs)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("size"),
        concat_ws(",", array_sort(collect_list(col("doc_id")))).as("members"))
      .filter(col("size") > 1)
      .orderBy(col("cluster_id"))
  }

  // Leakage-safe split (r16, DedupClusters.leakageSafeSplit): the
  // q61 deterministic hash split drawn at CLUSTER granularity so
  // near-dup cluster members can never straddle train/test — the
  // standard eval-contamination hazard a per-document split cannot
  // prevent by construction. Composes the q51 cluster machinery
  // (edges localCheckpointed per the executeTake rule) with
  // integer-permyriad cut points.
  private val q139 = "q139_cluster_split" -> { (s: SparkSession, dir: String) =>
    val docs = t(s, dir, "documents")
    val pairs = graft.ml.TextDedup.minhashLshPairs(docs, n = 3, k = 12,
      bands = 4, threshold = 0.3, minAgree = 5)
      .localCheckpoint()
    val labels = graft.ml.DedupClusters.assign(docs.select(col("doc_id")), pairs)
    graft.ml.DedupClusters.leakageSafeSplit(labels,
        Seq(("train", 8000), ("validation", 1000), ("test", 1000)))
      .orderBy(col("doc_id"))
  }

  // Canonical document selection — the policy step a production dedup
  // pipeline runs AFTER clustering: within each near-dup cluster keep
  // the highest-quality member (ties: lowest doc_id), drop the rest.
  // q51 labels clusters by min-id; this replaces the arbitrary min-id
  // keeper with a quality-ranked one — the "keep the best copy"
  // behavior that actually matters when near-dups differ in quality
  // (truncated mirrors, boilerplate-wrapped copies). Window is
  // partitioned by cluster (clusters are small by construction), so
  // the ranking never leaves its partition at any corpus size. keep
  // is emitted as BIGINT 1/0: the parity gate compares str-rendered
  // values, and engine boolean renderings aren't guaranteed to agree.
  private val q77 = "q77_canonical_selection" -> { (s: SparkSession, dir: String) =>
    val docs = t(s, dir, "documents")
    val pairs = graft.ml.TextDedup.minhashLshPairs(docs, n = 3, k = 12,
      bands = 4, threshold = 0.3, minAgree = 5)
    val scored = docs.select(col("doc_id"),
      round(graft.ml.TextAnalysis.qualityScore(col("text")), 4).as("quality"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    graft.ml.DedupClusters.assign(docs.select(col("doc_id")), pairs)
      .join(scored, Seq("doc_id"))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("sz") > 1)
      .withColumn("keep", when(row_number().over(w) === 1, 1L).otherwise(0L))
      .select(col("cluster_id"), col("doc_id"), col("quality"), col("keep"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  // TF-IDF keyword extraction: top-3 terms per document by
  // tf·ln(N/df). The classic corpus-statistics op (indexing, topic
  // labeling, search-side of a training-data pipeline). One explode
  // pass; tf persists because BOTH the df aggregation and the scoring
  // join consume it; N arrives as a broadcast 1-row cross join (never
  // a driver collect). Determinism: tf/df/N are exact integers, both
  // engines compute the identical tf·ln(N/df) double, ranking ties
  // break on (rounded score, tok).
  // Shape (r6): tf rows are unique per (doc, tok), so df is a COUNT
  // over a tok-partitioned window on the tf table itself — the
  // separate df aggregation + tf⋈df join of the first form collapsed
  // into one exchange, and the tf persist (only needed because two
  // consumers read it) is gone. Linear pipeline: explode → tf groupBy
  // → tok window (df) → doc window (rank). In-session A/B
  // (tools/AbBench, sf0.1): join form 1.13 s min → this 0.93 s.
  private val q82 = "q82_tfidf_keywords" -> { (s: SparkSession, dir: String) =>
    val docs = t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val wDf = Window.partitionBy(col("tok"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(round(col("score"), 6).desc, col("tok"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(wDf))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * log(col("n_docs").cast("double") / col("df")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("tok"), round(col("score"), 4).as("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  // BM25 retrieval: the text-side similarity-search baseline (the ANN
  // family covers embeddings; this covers lexical search over the
  // corpus — the retrieval half of a dedup-against-queries or
  // RAG-indexing pipeline). Queries = the first 5 documents' distinct
  // tokens; score(q,d) = Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))
  // with k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1) (the
  // Robertson-Sparck-Jones form, always positive). Scale shape: query
  // terms are a bounded broadcast side; the corpus tf table joins it
  // map-side, then ONE shuffle groups (query, doc) contributions.
  // Determinism: tf/df/dl/N are exact integers, avgdl and every idf
  // are the identical IEEE doubles in both engines; ranking ties break
  // on (rounded score, doc_id).
  // Shape (r6): only QUERY terms ever reach a shuffle. Doc length is
  // per-row arithmetic (size(split)) carried through the explode as a
  // grouping column, so tf and dl come out of ONE aggregation (the
  // first form aggregated the full tf table twice more for dl and df
  // and joined three times); exploded tokens are broadcast-semi-joined
  // to the bounded query-term set BEFORE the tf groupBy, so the big
  // exchange carries matching tokens only — df for those terms is
  // still exact (every doc containing a query term passes the filter).
  // Corpus-wide avgdl/N come from a separate cheap scan (1-row
  // broadcast). df = window count over the unique (doc,term) rows, no
  // join. At 100 TB the early-filter win dominates — the corpus-sized
  // shuffle shrinks to |docs matching query vocabulary|.
  private val q83 = "q83_bm25_search" -> { (s: SparkSession, dir: String) =>
    // The repartitioned raw docs feed THREE consumers (stats, query
    // terms, the main pipeline) — persisted once or each consumer
    // re-pays the repartition shuffle (measured: that cost more than
    // the old tf-persist form). The early filter is a LEFT SEMI
    // against the same broadcast(qterms) the query_id attach reuses
    // (one broadcast build, ReusedExchange). A/B'd in-session via
    // tools/AbBench: old 1.91 s → this 0.87 s min at sf0.1.
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), col("text"))
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = docs
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
    val qterms = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        explode(split(col("text"), " ")).as("term"))
      .distinct()
    val tfq = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("term"))
      .join(broadcast(qterms), Seq("term"), "left_semi")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val contrib = tfq
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("c",
        col("idf") * col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("score"), 6).desc, col("doc_id"))
    contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("query_id"), col("rnk"), col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(col("query_id"), col("rnk"))
  }

  // The BPE training loop's inner counting step as an oracle-gated
  // query: top-20 adjacent token pairs across the corpus (count desc,
  // pair asc — the exact selection order ml/Bpe.train uses each
  // iteration; the full iterative loop is differential-gated in
  // BpeSpec against an in-memory reference). One explode + one
  // groupBy; pair structs come from a positional zip_with, per-row.
  private val q84 = "q84_bpe_pairs" -> { (s: SparkSession, dir: String) =>
    val toks = t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    graft.ml.Bpe.pairCounts(toks)
      .orderBy(col("n").desc, col("a"), col("b"))
      .limit(20)
  }

  // Embedding outlier screen (r6): vectors whose cosine to their own
  // label centroid falls below the gate — the quality filter run
  // before ANN indexing (ml/Similarity.centroidCosine scaladoc for
  // the scale shape). Threshold −0.05 flags the bottom ~5% of the
  // driver corpus (labels are weak clusters, median own-centroid cos
  // ≈ 0.15); the 6-dp filter guard + 4-dp output follow the q53
  // float-portability pattern.
  // r8: the litmap form (AbBench min 0.61→0.36) — centroids collect
  // once (labels × dims, bounded) and scoring is a single scan job
  // against map literals; values identical (SimilaritySpec
  // differential).
  private val q85 = "q85_embedding_outliers" -> { (s: SparkSession, dir: String) =>
    graft.ml.Similarity.centroidCosineLitmap(t(s, dir, "embeddings"))
      .filter(round(col("cos"), 6) < -0.05)
      .select(col("vec_id"), col("label"), round(col("cos"), 4).as("cos"))
      .orderBy(col("vec_id"))
  }

  // Winnowing fingerprints (r6): the MOSS selection rule, k=4-token
  // grams winnowed through w=5 windows — per-row array math end to
  // end, zero shuffle (scale story + guarantee in
  // ml/TextAnalysis.winnowFingerprints).
  private val q88 = "q88_winnow_fingerprints" -> { (s: SparkSession, dir: String) =>
    graft.ml.TextAnalysis.winnowFingerprints(
        t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id")),
        k = 4, w = 5)
      .orderBy(col("doc_id"))
  }

  // Per-source boilerplate detection (r6): the contrastive-df
  // primitive behind per-domain cleanup in the big public corpora —
  // n-grams frequent WITHIN a source (df_src >= 2 distinct docs) but
  // confined to few sources globally (<= 3) are that source's
  // headers/footers/navigation, not natural language; the top-3 per
  // source by in-source df are the removal candidates a SpanDedup
  // pass would then excise source-locally. One explode; the
  // (gram, source) aggregation is the only corpus-sized shuffle
  // (map-side partials bound it by distinct grams); the source-spread
  // count is a window over the aggregated (already tiny) frame.
  private val q89 = "q89_source_boilerplate" -> { (s: SparkSession, dir: String) =>
    // r6 perf form (AbBench q89_old/q89_new, interleaved min 0.67→0.61,
    // med 0.75→0.67 at sf0.1): grams built TextDedup-style — transform
    // over the materialized token array with O(1) get()s instead of a
    // sequence+slice allocation per gram — and made distinct PER DOC in
    // the row expression, so the (gram, source) aggregate is a plain
    // count instead of countDistinct's two-phase expand. explode_outer
    // + isNotNull keeps the inferred size>0 filter from re-evaluating
    // the gram expression below the repartition (the shingleTable trap).
    val toks = col("toks")
    val grams = transform(toks, (x, i) =>
      concat_ws(" ", x, get(toks, i + lit(1)), get(toks, i + lit(2))))
    val d = t(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("source"),
        explode_outer(when(size(toks) >= 3,
          array_distinct(slice(grams, lit(1), size(toks) - 2)))
          .otherwise(array().cast("array<string>"))).as("gram"))
      .filter(col("gram").isNotNull)
      .groupBy(col("gram"), col("source"))
      .agg(count(lit(1)).as("df_src"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("df_src").desc, col("gram"))
    d.withColumn("n_sources", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("df_src") >= 2 && col("n_sources") <= 3)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("source"), col("rnk"), col("gram"), col("df_src"),
        col("n_sources"))
      .orderBy(col("source"), col("rnk"))
  }

  // Indexed BM25 (r7): identical scoring and output to q83, but served
  // from the persistent inverted index (ml/LexIndex) instead of
  // re-tokenizing the corpus — build once (amortized via the
  // fingerprint check), probe per query. The probe plan: pruned
  // postings scan → broadcast query attach → ONE shuffle of matched
  // postings. The oracle recomputes from raw text (DuckDB has no
  // index), which is exactly the point of the gate: the index path
  // must reproduce the from-scratch scores bit-for-bit at 4 dp.
  private val q102 = "q102_bm25_indexed" -> { (s: SparkSession, dir: String) =>
    val idx = graft.ml.LexIndex.ensure(s, dir,
      t(s, dir, "documents").select(col("doc_id"), col("text")))
    // query docs' terms come from the index too — no re-tokenization,
    // and (r8) the collected query set rides the driver cache keyed by
    // (index, predicate): the first probe pays one pruned-scan collect,
    // every later probe is the single distributed probe job.
    graft.ml.LexIndex.probeIndexed(s, idx, col("doc_id") < 5, k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  // Right-to-be-forgotten on the RETRIEVAL path (r16, the q147
  // companion): tombstone the %13 docs on a dedicated index copy, then
  // probe — deleted docs must vanish from results (and from the query
  // set: doc 0 is deleted, so queries are 1-4) the moment the
  // tombstone commits, while BM25 stats stay at their stored values
  // until compaction (the Lucene deleted-docs semantics). The oracle
  // computes exactly that contract from scratch: full-corpus df/avgdl/
  // n_docs, live-docs-only results, re-ranked.
  private val q148 = "q148_forget_retrieval" -> { (s: SparkSession, dir: String) =>
    val idx = graft.ml.LexIndex.ensure(s, dir,
      t(s, dir, "documents").select(col("doc_id"), col("text")),
      tag = "forget")
    graft.ml.LexIndex.addTombstones(s, idx,
      t(s, dir, "documents").filter(col("doc_id") % 13 === 0)
        .select(col("doc_id")))
    graft.ml.LexIndex.probeIndexed(s, idx, col("doc_id") < 5, k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  // The index BUILDER's own gate (r7): the stored postings must equal
  // a from-scratch tf/dl/df computation row-for-row — this is what
  // lets q102 trust the index. Emits the full postings table (11.7k
  // rows at sf0.01 — probed non-vacuous before shipping).
  private val q103 = "q103_lex_postings" -> { (s: SparkSession, dir: String) =>
    val idx = graft.ml.LexIndex.ensure(s, dir,
      t(s, dir, "documents").select(col("doc_id"), col("text")))
    s.read.parquet(s"$idx/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("df"))
      .orderBy(col("term"), col("doc_id"))
  }

  /** Fixed merge table for the encode/fertility oracles: a tokenizer
    * is trained once and applied to any corpus, so a LITERAL rule
    * list is the honest gate shape (and the only DuckDB-expressible
    * one — train's argmax loop has no SQL form; the LOOP is
    * differential-gated in BpeSpec). Rules are top corpus pairs
    * (probed non-vacuous: 224 fuses at sf0.01); rule 5 shares tokens
    * with rules 1-2, so application ORDER is exercised. */
  private val encodeMerges = Seq(
    graft.ml.Bpe.Merge("table", "hash", 0),
    graft.ml.Bpe.Merge("part", "filter", 0),
    graft.ml.Bpe.Merge("customer", "join", 0),
    graft.ml.Bpe.Merge("merge", "group", 0),
    graft.ml.Bpe.Merge("filter", "hash", 0))

  // BPE encode gate (r7): per-doc token count after applying the fixed
  // merge table with the greedy left-to-right non-overlapping fold.
  // The DuckDB oracle expresses the SAME fold as a replace() chain
  // over a doubled-space token string (each adjacent pair keeps its
  // own flanking spaces, so one match never consumes a neighbor's
  // delimiter — verified fold-equivalent on every sf0.01 doc before
  // shipping).
  private val q104 = "q104_bpe_encode" -> { (s: SparkSession, dir: String) =>
    graft.ml.Bpe.encode(
        t(s, dir, "documents")
          .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
          .select(col("doc_id"), col("text")),
        encodeMerges)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  // Fertility per source over the same fixed merge table — flips
  // ml/Bpe.fertility from lib-only to oracle-backed (the r6 verdict's
  // one remaining lib-only text operator).
  private val q105 = "q105_bpe_fertility" -> { (s: SparkSession, dir: String) =>
    graft.ml.Bpe.fertility(
      t(s, dir, "documents")
        .repartition(s.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("source"), col("text")),
      encodeMerges, "source")
  }

  // TF-IDF keywords from the stored index (r7): q82's exact output,
  // zero tokenization — tf/df/n_docs all come from LexIndex, the plan
  // is one postings scan + one window exchange.
  private val q106 = "q106_tfidf_indexed" -> { (s: SparkSession, dir: String) =>
    val idx = graft.ml.LexIndex.ensure(s, dir,
      t(s, dir, "documents").select(col("doc_id"), col("text")))
    graft.ml.LexIndex.tfidfTopK(s, idx, k = 3)
      .orderBy(col("doc_id"), col("rnk"))
  }

  // Off-index BM25 probe (r8, the r7 verdict's #7): the query set is
  // NEW text, not index-resident — tokenized at probe time on the
  // driver (bounded query set is the probe contract), so the
  // tokenizer branch of the probe path is oracle-gated too. One of
  // the terms ("nosuchtoken") is absent from the corpus and must
  // contribute nothing on either engine.
  private val q107 = "q107_bm25_adhoc" -> { (s: SparkSession, dir: String) =>
    val idx = graft.ml.LexIndex.ensure(s, dir,
      t(s, dir, "documents").select(col("doc_id"), col("text")))
    graft.ml.LexIndex.probeText(s, idx, Seq(
        (100L, "table hash join"),
        (101L, "customer query filter fast"),
        (102L, "merge group sort nosuchtoken")), k = 5)
      .orderBy(col("query_id"), col("rnk"))
  }

  val queries2: Map[String, (SparkSession, String) => DataFrame] =
    Map(q50, q51, q77, q82, q83, q84, q85, q88, q89, q102, q103, q104, q105,
      q106, q107, q139, q148)

  val oracles: Map[String, String] = Map(
    // q138: the identical Stupid Backoff arithmetic — every score is
    // one IEEE division of exact reference counts (or the alpha·add-1
    // unigram), ln per row, round(mean, 4) — the q48 emission
    // precedent
    "q138_bigram_backoff" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    doc_id < 250 AS is_ref FROM documents),
        |bgf AS (
        |  SELECT doc_id, is_ref, b['prev'] AS prev, b['cur'] AS cur FROM (
        |    SELECT doc_id, is_ref,
        |      unnest(list_transform(generate_series(2, len(toks)),
        |        i -> struct_pack(prev := toks[i-1], cur := toks[i]))) AS b
        |    FROM docs WHERE len(toks) >= 2)),
        |refbg AS (
        |  SELECT prev, cur, count(*) AS c_bg FROM bgf WHERE is_ref
        |  GROUP BY prev, cur),
        |refuni AS (
        |  SELECT tok, count(*) AS c_uni FROM (
        |    SELECT unnest(toks) AS tok FROM docs WHERE is_ref)
        |  GROUP BY tok),
        |stats AS (
        |  SELECT CAST(sum(c_uni) AS BIGINT) AS n_total,
        |    CAST(count(*) AS BIGINT) AS v FROM refuni),
        |sc AS (
        |  SELECT s.doc_id,
        |    CASE WHEN r.c_bg IS NOT NULL
        |      THEN CAST(r.c_bg AS DOUBLE) / pu.c_uni
        |      ELSE 0.4 * CAST(COALESCE(cu.c_uni, 0) + 1 AS DOUBLE)
        |        / (st.n_total + st.v + 1) END AS sv,
        |    CASE WHEN r.c_bg IS NULL THEN 1 ELSE 0 END AS backoff
        |  FROM bgf s
        |  LEFT JOIN refbg r ON r.prev = s.prev AND r.cur = s.cur
        |  LEFT JOIN refuni pu ON pu.tok = s.prev
        |  LEFT JOIN refuni cu ON cu.tok = s.cur
        |  CROSS JOIN stats st
        |  WHERE NOT s.is_ref)
        |SELECT doc_id, round(sum(-ln(sv)) / count(*), 4) AS surprisal,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(backoff) AS BIGINT) AS n_backoff
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q48_unigram_surprisal" ->
      """WITH tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok),
        |vocab AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY tok),
        |lm AS (
        |  SELECT tok, ln(n / (SELECT CAST(sum(n) AS DOUBLE) FROM vocab)) AS logp
        |  FROM vocab)
        |SELECT doc_id,
        |  round(sum(-logp * tf) / CAST(sum(tf) AS DOUBLE), 4) AS surprisal,
        |  CAST(sum(tf) AS BIGINT) AS n_tokens
        |FROM tf JOIN lm USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q50_repetition_filters" ->
      """WITH counts AS (
        |  SELECT doc_id, tok, count(*) AS n FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY doc_id, tok)
        |SELECT doc_id,
        | round(1.0 - count(*) / CAST(sum(n) AS DOUBLE), 4) AS dup_fraction,
        | round(max(n) / CAST(sum(n) AS DOUBLE), 4) AS top_share,
        | CAST(sum(n) AS BIGINT) AS n_tokens
        |FROM counts GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Connected components over the q32 LSH pair graph via a recursive
    // CTE (min reachable id per node = component label).
    "q51_dedup_clusters" -> {
      val pairSql = PipelineQueries.oracles("q32_minhash_lsh")
      s"""WITH RECURSIVE pairs AS ($pairSql),
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(doc_id, label) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc_id),
         |labels AS (
         |  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id)
         |SELECT cluster_id, count(*) AS size,
         | array_to_string(list_sort(list(doc_id)), ',') AS members
         |FROM labels GROUP BY cluster_id HAVING count(*) > 1
         |ORDER BY cluster_id""".stripMargin
    },

    // q139: q51's component labels (singletons = own id) + the q61
    // md5-bucket arithmetic at cluster granularity, integer permyriad
    // cut points
    "q139_cluster_split" -> {
      val pairSql = PipelineQueries.oracles("q32_minhash_lsh")
      s"""WITH RECURSIVE pairs AS ($pairSql),
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(doc_id, label) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc_id),
         |labels AS (
         |  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
         |alldocs AS (
         |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
         |b AS (
         |  SELECT doc_id, cluster_id,
         |    CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 10000 AS bucket
         |  FROM alldocs)
         |SELECT doc_id, cluster_id, bucket,
         |  CASE WHEN bucket < 8000 THEN 'train'
         |       WHEN bucket < 9000 THEN 'validation'
         |       ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin
    },

    // q51's component labels + the shared quality score, keeper =
    // row_number 1 over (quality DESC, doc_id) within cluster.
    "q77_canonical_selection" -> {
      val pairSql = PipelineQueries.oracles("q32_minhash_lsh")
      s"""WITH RECURSIVE pairs AS ($pairSql),
         |edges AS (
         |  SELECT doc_a AS s, doc_b AS d FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(doc_id, label) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.doc_id),
         |labels AS (
         |  SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
         |scored AS (SELECT doc_id, round(${PipelineQueries.qualitySql}, 4) AS quality
         |  FROM documents),
         |mem AS (
         |  SELECT l.cluster_id, l.doc_id, s.quality,
         |    count(*) OVER (PARTITION BY l.cluster_id) AS sz,
         |    row_number() OVER (PARTITION BY l.cluster_id
         |      ORDER BY s.quality DESC, l.doc_id) AS rn
         |  FROM labels l JOIN scored s USING (doc_id))
         |SELECT cluster_id, doc_id, quality,
         | CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM mem WHERE sz > 1 ORDER BY cluster_id, doc_id""".stripMargin
    },

    // Mirrors q83 term-for-term; float-sum portability rests on the
    // q65/q70 magnitude argument (≤ ~60 addends of magnitude ~1-30 →
    // accumulation error ~1e-14 ≪ the 1e-4/1e-6 rounding units).
    "q83_bm25_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 5),
        |contrib AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |      (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS c
        |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |scored AS (SELECT query_id, doc_id, sum(c) AS score FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, doc_id, round(score, 4) AS score FROM ranked
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // Same oracle text as q83 (the indexed path must reproduce the
    // from-scratch BM25 exactly); kept as its own entry so the gate
    // reports the two paths independently.
    "q102_bm25_indexed" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf WHERE doc_id < 5),
        |contrib AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |      (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS c
        |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |scored AS (SELECT query_id, doc_id, sum(c) AS score FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, doc_id, round(score, 4) AS score FROM ranked
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // q102's chain with the immediate-forget contract: df/avgdl/n_docs
    // over the FULL corpus (stats stay stored until compaction), tf
    // rows for deleted docs excluded from contrib (results AND query
    // set), ranks recomputed over the live docs.
    "q148_forget_retrieval" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT DISTINCT doc_id AS query_id, term FROM tf
        |  WHERE doc_id < 5 AND doc_id % 13 <> 0),
        |contrib AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |      (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS c
        |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st
        |  WHERE tf.doc_id % 13 <> 0),
        |scored AS (SELECT query_id, doc_id, sum(c) AS score FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, doc_id, round(score, 4) AS score FROM ranked
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // q102's BM25 chain with the query terms from literal VALUES —
    // the ad-hoc (probe-time-tokenized) path must reproduce the
    // from-scratch scores for query text DuckDB splits itself.
    "q107_bm25_adhoc" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |st AS (SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |qt AS (SELECT DISTINCT query_id, term FROM (
        |  SELECT query_id, unnest(string_split(qtext, ' ')) AS term
        |  FROM (VALUES (100, 'table hash join'),
        |               (101, 'customer query filter fast'),
        |               (102, 'merge group sort nosuchtoken')) AS q(query_id, qtext))),
        |contrib AS (
        |  SELECT qt.query_id, tf.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        |      (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)) AS c
        |  FROM tf JOIN qt USING (term) JOIN dfq USING (term)
        |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN st),
        |scored AS (SELECT query_id, doc_id, sum(c) AS score FROM contrib GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, doc_id, score, row_number() OVER (
        |    PARTITION BY query_id ORDER BY round(score, 6) DESC, doc_id) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, doc_id, round(score, 4) AS score FROM ranked
        |WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin,

    // dl is the raw token count (split length), matching the index
    // builder; tf sums to it per doc by construction, so the two
    // definitions coincide — asserted here by the oracle itself.
    "q103_lex_postings" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
        |         unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, dl, term, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
        |d AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        |SELECT tf.term, tf.doc_id, tf.tf, tf.dl, d.df
        |FROM tf JOIN d USING (term) ORDER BY tf.term, tf.doc_id""".stripMargin,

    // q82's oracle verbatim — the indexed path must reproduce the
    // from-scratch TF-IDF exactly.
    "q106_tfidf_indexed" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok, tf * ln(CAST(n_docs AS DOUBLE) / df) AS score
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, tok, score, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY round(score, 6) DESC, tok) AS rnk
        |  FROM scored)
        |SELECT doc_id, rnk, tok, round(score, 4) AS score FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    // The encode fold as a replace() chain: ' '||replace(text,' ','  ')||' '
    // gives every token its own flanking spaces; pattern ' a  b ' →
    // ' a<sep>b ' consumes one space each side (the shared halves stay
    // for the neighbors), and replace() scans left-to-right without
    // re-reading its own output — exactly mergePair's greedy fold
    // ("a a a" + (a,a) → [aa, a] both ways).
    "q104_bpe_encode" ->
      """WITH enc AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(replace(
        |      ' ' || replace(text, ' ', '  ') || ' ',
        |      ' table  hash ', ' table' || chr(1) || 'hash '),
        |      ' part  filter ', ' part' || chr(1) || 'filter '),
        |      ' customer  join ', ' customer' || chr(1) || 'join '),
        |      ' merge  group ', ' merge' || chr(1) || 'group '),
        |      ' filter  hash ', ' filter' || chr(1) || 'hash ') AS s
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(string_split(s, ' '), x -> x <> '')) AS BIGINT)
        |    AS n_tokens
        |FROM enc ORDER BY doc_id""".stripMargin,

    "q105_bpe_fertility" ->
      """WITH enc AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(text) AS BIGINT)
        |      - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1) AS n_chars,
        |    CAST(len(list_filter(string_split(
        |      replace(replace(replace(replace(replace(
        |        ' ' || replace(text, ' ', '  ') || ' ',
        |        ' table  hash ', ' table' || chr(1) || 'hash '),
        |        ' part  filter ', ' part' || chr(1) || 'filter '),
        |        ' customer  join ', ' customer' || chr(1) || 'join '),
        |        ' merge  group ', ' merge' || chr(1) || 'group '),
        |        ' filter  hash ', ' filter' || chr(1) || 'hash '),
        |      ' '), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS n_words,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(n_tokens) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE), 4)
        |    AS fertility,
        |  round(CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE), 4)
        |    AS chars_per_token
        |FROM enc GROUP BY source ORDER BY source""".stripMargin,

    "q84_bpe_pairs" ->
      """WITH tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |pos AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i, toks
        |        FROM tt)
        |SELECT toks[i] AS a, toks[i+1] AS b, count(*) AS n
        |FROM pos GROUP BY 1, 2
        |ORDER BY n DESC, a, b LIMIT 20""".stripMargin,

    "q89_source_boilerplate" ->
      """WITH tt AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, source, array_to_string(toks[i:i+2], ' ') AS gram
        |      FROM (SELECT doc_id, source,
        |              unnest(generate_series(1, len(toks) - 2)) AS i, toks
        |            FROM tt)),
        |d AS (SELECT gram, source, count(DISTINCT doc_id) AS df_src
        |      FROM g GROUP BY 1, 2),
        |s AS (SELECT gram, count(*) AS n_sources FROM d GROUP BY 1),
        |r AS (
        |  SELECT d.source, d.gram, d.df_src, s.n_sources,
        |    row_number() OVER (PARTITION BY d.source
        |      ORDER BY d.df_src DESC, d.gram) AS rnk
        |  FROM d JOIN s USING (gram)
        |  WHERE df_src >= 2 AND n_sources <= 3)
        |SELECT source, rnk, gram, df_src, n_sources FROM r
        |WHERE rnk <= 3 ORDER BY source, rnk""".stripMargin,

    // Mirrors q88 gram-for-gram: identical 63-bit md5-half hashes,
    // identical window minima (integer min — no float anywhere),
    // identical sorted-set md5 summary. Slices: Spark slice(x,i,len)
    // == DuckDB x[i:i+len-1] (both 1-based, DuckDB's upper inclusive).
    "q88_winnow_fingerprints" ->
      """WITH tt AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(toks) >= 4 THEN
        |    [array_to_string(toks[i:i+3], ' ') FOR i IN generate_series(1, len(toks)-3)]
        |  ELSE [] END AS grams FROM tt),
        |h AS (SELECT doc_id, grams,
        |  [(CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 2147483648) * 4294967296
        |     + CAST('0x' || substr(md5(x), 9, 8) AS BIGINT) FOR x IN grams] AS hashes
        |  FROM g),
        |m AS (SELECT doc_id, grams,
        |  CASE WHEN len(hashes) >= 5 THEN
        |    [list_min(hashes[i:i+4]) FOR i IN generate_series(1, len(hashes)-4)]
        |  WHEN len(hashes) > 0 THEN [list_min(hashes)]
        |  ELSE [] END AS mins FROM h),
        |f AS (SELECT doc_id, len(grams) AS n_grams,
        |  list_sort(list_distinct(mins)) AS fp FROM m)
        |SELECT doc_id, CAST(n_grams AS INT) AS n_grams,
        |  CAST(len(fp) AS INT) AS n_fp,
        |  md5(array_to_string(fp, ',')) AS fp_md5
        |FROM f ORDER BY doc_id""".stripMargin,

    // Mirrors q85: identical rounded centroids (6 dp kills avg
    // sum-order drift), identical sequential-fold dot products.
    "q85_embedding_outliers" ->
      """WITH pos AS (
        |  SELECT label, unnest(generate_series(1, len(embedding))) AS pos, embedding
        |  FROM embeddings),
        |px AS (SELECT label, pos, CAST(embedding[pos] AS DOUBLE) AS x FROM pos),
        |cent AS (
        |  SELECT label, list(c ORDER BY pos) AS centroid FROM (
        |    SELECT label, pos, round(avg(x), 6) AS c FROM px GROUP BY 1, 2)
        |  GROUP BY label),
        |sc AS (
        |  SELECT vec_id, e.label,
        |    list_dot_product(e.embedding::DOUBLE[], centroid) /
        |      (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |       sqrt(list_dot_product(centroid, centroid))) AS cos
        |  FROM embeddings e JOIN cent USING (label))
        |SELECT vec_id, label, round(cos, 4) AS cos FROM sc
        |WHERE round(cos, 6) < -0.05 ORDER BY vec_id""".stripMargin,

    "q82_tfidf_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, tok, tf * ln(CAST(n_docs AS DOUBLE) / df) AS score
        |  FROM tf JOIN dfq USING (tok) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, tok, score, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY round(score, 6) DESC, tok) AS rnk
        |  FROM scored)
        |SELECT doc_id, rnk, tok, round(score, 4) AS score FROM ranked
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q49_sessionize" ->
      """WITH gaps AS (
        |  SELECT user_id, event_id, ts,
        |    (epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
        |       PARTITION BY user_id ORDER BY ts, event_id)) / 1000 AS gap_s
        |  FROM events),
        |marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN gap_s IS NULL OR gap_s > 3600 THEN 1 ELSE 0 END AS new_session
        |  FROM gaps),
        |sessions AS (
        |  SELECT user_id, event_id, ts, CAST(sum(new_session) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM marked)
        |SELECT user_id, session_idx, count(*) AS n_events,
        | min(epoch_ms(ts)) AS start_ms,
        | max(epoch_ms(ts)) - min(epoch_ms(ts)) AS duration_ms
        |FROM sessions GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin)
}
