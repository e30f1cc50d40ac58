package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interleaved A/B timing for plan-shape experiments: each registered
  * variant runs `reps` times in A,B,...,A,B order inside ONE session,
  * so machine-load drift between runs hits all variants equally —
  * the only trustworthy way to compare sub-second plan changes on a
  * shared box (single-shot runs swing ±30%, see CLAUDE.md). Reports
  * min and median per variant as one JSON line.
  *
  * Usage: runMain graft.tools.AbBench <sfDir> <nameRegex> [reps]
  * Variants are registered in [[variants]] — transient experiment
  * bodies live here while a rewrite is being decided, then the winner
  * moves into the query and the loser is deleted.
  */
object AbBench {
  /** (name, body) pairs; bodies must consume the frame (count). */
  def variants(spark: SparkSession, sfDir: String): Seq[(String, () => Long)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def docs = graft.Tables.t(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

    // q82 OLD: tf persist + separate df agg + join
    def tfidfJoin(): Long = {
      val d = docs
      val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(round(col("score"), 6).desc, col("tok"))
      val r = tf.join(dfq, Seq("tok")).crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3).count()
      tf.unpersist(false); r
    }
    // q82 NEW: df as window count over the tf table
    def tfidfWindow(): Long = {
      val d = docs
      val n = d.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(round(col("score"), 6).desc, col("tok"))
      d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("tok"))))
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3).count()
    }

    // q82 r9: repartition(doc_id) once; the (doc,tok) agg rides it
    // (subset rule) and the FINAL rank window rides it too — the df
    // side becomes a (tok) agg joined back (AQE-broadcast at this
    // scale), so the hash(tok) window exchange and the hash(doc) rank
    // exchange both disappear. tf feeds two consumers -> persist.
    def tfidfDocPart(): Long = {
      val d = docs
      val n = d.agg(count(lit(1)).as("n_docs"))
      val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(round(col("score"), 6).desc, col("tok"))
      val r = tf.join(broadcast(dfq), Seq("tok"))
        .crossJoin(broadcast(n))
        .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3).count()
      tf.unpersist(false); r
    }

    // q83 OLD: full-corpus tf persist, dl/df aggs, three joins
    def bm25Old(): Long = {
      val d = docs
      val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      val stats = dl.crossJoin(broadcast(
        dl.agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val qterms = tf.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("term")).distinct()
      val contrib = tf.join(broadcast(qterms), Seq("term"))
        .join(dfq, Seq("term")).join(stats, Seq("doc_id"))
        .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("c", col("idf") * col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("score"), 6).desc, col("doc_id"))
      val r = contrib.groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5).count()
      tf.unpersist(false); r
    }
    // q83 NEW: early query-term filter, fused tf+dl agg, window df
    def bm25New(): Long = {
      val d = docs
      val stats = d.select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
      val qterms = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val tfq = d.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"),
          explode(split(col("text"), " ")).as("term"))
        .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
        .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
      val contrib = tfq
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .join(broadcast(qterms), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("c", col("idf") * col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("score"), 6).desc, col("doc_id"))
      contrib.groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5).count()
    }

    // q83 NEW2: like NEW but the repartitioned raw docs are persisted
    // once and feed all three consumers (stats, qterms, main) — NEW
    // paid the repartition shuffle per consumer.
    def bm25New2(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = d.select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
      val qterms = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val tfq = d.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"),
          explode(split(col("text"), " ")).as("term"))
        .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
        .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
      val contrib = tfq
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .join(broadcast(qterms), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("c", col("idf") * col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("score"), 6).desc, col("doc_id"))
      val r = contrib.groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5).count()
      d.unpersist(false); r
    }

    // q83 NEW3: NEW2 minus the qtermSet distinct job — the early
    // filter is a LEFT SEMI against the same broadcast(qterms) the
    // query_id attach uses, so one broadcast build serves both joins
    // (ReusedExchange) and a whole job disappears.
    def bm25New3(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stats = d.select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(avg(col("dl")).as("avgdl"), count(lit(1)).as("n_docs"))
      val qterms = d.filter(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val tfq = d.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"),
          explode(split(col("text"), " ")).as("term"))
        .join(broadcast(qterms), Seq("term"), "left_semi")
        .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
      val contrib = tfq
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .join(broadcast(qterms), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("c", col("idf") * col("tf") * 2.2 /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("score"), 6).desc, col("doc_id"))
      val r = contrib.groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5).count()
      d.unpersist(false); r
    }

    // Full iterative BPE training loop (10 merges) — the per-merge
    // 1-row collect + localCheckpoint pattern the SCALING sweep
    // measures end-to-end (q84 only covers the inner counting step).
    def bpeTrain10(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      graft.ml.Bpe.train(d, numMerges = 10).size.toLong
    }

    // Connected components under adversarial graph shapes (ignores
    // sfDir — graphs are generated): one giant power-law component
    // (every node's parent hash-biased hard toward the hubs — the
    // "mirror of a mirror of the original" crawl shape, with extreme
    // degree skew at the root) and one giant CHAIN (worst-case
    // diameter — what the pointer-doubling step exists for). Each
    // prints rounds-to-converge; the wall time is the variant's value.
    def ccGraph(edgesDf: DataFrame, n: Long, tag: String): Long = {
      import spark.implicits._
      val docs = spark.range(n).select(col("id").cast("int").as("doc_id"))
      // smallGraphEdgeBound = 0: these variants exist to measure the
      // DISTRIBUTED pointer-doubling loop on adversarial graph shapes;
      // the driver union-find fast path would short-circuit both.
      val a = graft.ml.DedupClusters.assignWithStats(docs, edgesDf,
        maxRounds = 32, smallGraphEdgeBound = 0)
      val clusters = a.labels.agg(countDistinct(col("cluster_id"))).head().getLong(0)
      println(s"[cc:$tag] rounds=${a.rounds} converged=${a.converged} clusters=$clusters")
      clusters
    }
    def ccPowerlaw(): Long = {
      val n = 500000L
      // parent(i) = i * u^4 with u a per-row hash-uniform — heavily
      // hub-biased: ~84% of nodes land a parent in the first 50% by
      // u^4's mass at 0, the root's in-degree is ~n^(1/4)-ish hot.
      val edges = spark.range(1, n)
        .select(col("id").cast("int").as("doc_a"),
          floor(col("id") *
            pow(abs(hash(col("id"))).cast("double") / Int.MaxValue, 4.0))
            .cast("int").as("doc_b"))
        .filter(col("doc_b") < col("doc_a"))
      ccGraph(edges, n, "powerlaw")
    }
    def ccChain(): Long = {
      val n = 100000L
      val edges = spark.range(1, n)
        .select(col("id").cast("int").as("doc_a"),
          (col("id") - 1).cast("int").as("doc_b"))
      ccGraph(edges, n, "chain")
    }

    // q32 as shipped: signatures ride the band shuffle for the in-row
    // agreement estimate
    def q32Current(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
      val r = graft.ml.TextDedup.minhashLshPairs(d, n = 3, k = 12,
        bands = 4, threshold = 0.3, minAgree = 5).count()
      spark.catalog.clearCache(); r
    }
    // r12 sf1 isolates: digests 0.21 / sigs 0.24 but full 1.98+ — cut
    // the tail at the candidate distinct (expand = bucket agg +
    // triangular expansion + minAgree + distinct; full − expand =
    // the two-sided verify join).
    def q32Expand(): Long = {
      import graft.ml.TextDedup
      val d = graft.Tables.t(spark, sfDir, "documents")
      val withDig = TextDedup.shingleDigests(TextDedup.shingleSets(d, 3))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sig = TextDedup.minhashSignaturesFromDigests(withDig, 12)
      val bk = TextDedup.bandKeyTable(sig, 12, 4)
      val ds2 = col("ds2")
      val r = bk.groupBy(col("band"), col("key"))
        .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(array_sort(col("ds")).as("ds2"))
        .select(explode_outer(flatten(transform(ds2, (a, i) =>
          transform(slice(ds2, i + lit(2), size(ds2)), b =>
            struct(a.getField("doc_id").as("doc_a"),
              b.getField("doc_id").as("doc_b"),
              TextDedup.sigAgreement(a.getField("sig"),
                b.getField("sig")).as("agree")))))).as("p"))
        .filter(col("p.agree") >= lit(5))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct().count()
      spark.catalog.clearCache(); r
    }
    // variant: band shuffle carries ONLY (doc_id); agreement estimate
    // joins signatures back onto the candidate pairs after the distinct
    def q32JoinBack(): Long = {
      import graft.ml.TextDedup
      val d = graft.Tables.t(spark, sfDir, "documents")
      val withDig = TextDedup.shingleDigests(TextDedup.shingleSets(d, 3))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sig = TextDedup.minhashSignaturesFromDigests(withDig, 12)
        .select(col("doc_id"),
          array((0 until 12).map(j => col(s"mh$j")): _*).as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bk = TextDedup.lshBands(
        TextDedup.minhashSignaturesFromDigests(withDig, 12), 4, 3)
      val ds2 = col("ds2")
      val cand = bk.groupBy(col("band"), col("key"))
        .agg(collect_list(col("doc_id")).as("ds"))
        .filter(size(col("ds")) >= 2)
        .select(array_sort(col("ds")).as("ds2"))
        .select(explode_outer(flatten(transform(ds2, (a, i) =>
          transform(slice(ds2, i + lit(2), size(ds2)), b =>
            struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
        .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sa")), Seq("doc_a"))
        .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sb")), Seq("doc_b"))
        .filter(TextDedup.sigAgreement(col("sa"), col("sb")) >= 5)
        .select(col("doc_a"), col("doc_b"))
      val keySets = TextDedup.keySetsFromDigests(withDig)
      val a = keySets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = keySets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      val r = cand.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
        .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("jaccard", round(col("shared") /
          (size(col("sh_a")) + size(col("sh_b")) - col("shared")), 4))
        .filter(col("jaccard") >= 0.3)
        .count()
      spark.catalog.clearCache(); r
    }

    // q89 as shipped: sequence+slice gram builder (allocates an index
    // array + a slice array per gram) and countDistinct(doc_id) (a
    // two-phase expand aggregate)
    def q89Old(): Long = {
      val d0 = docs.withColumn("toks", split(col("text"), " "))
      val d = d0
        .select(col("doc_id"), col("source"),
          explode(when(size(col("toks")) >= 3,
            transform(sequence(lit(1), size(col("toks")) - 2),
              i => concat_ws(" ", slice(col("toks"), i, lit(3)))))
            .otherwise(array().cast("array<string>"))).as("gram"))
        .groupBy(col("gram"), col("source"))
        .agg(countDistinct(col("doc_id")).as("df_src"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("df_src").desc, col("gram"))
      d.withColumn("n_sources", count(lit(1)).over(Window.partitionBy(col("gram"))))
        .filter(col("df_src") >= 2 && col("n_sources") <= 3)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3).count()
    }
    // q89 NEW: TextDedup-style gram builder (transform over the
    // MATERIALIZED token array, O(1) get()s, no per-gram slice alloc)
    // + per-doc array_distinct so the (gram, source) aggregate is a
    // plain count — countDistinct's expand phase disappears.
    def q89New(): Long = {
      val toks = col("toks")
      val grams = transform(toks, (x, i) =>
        concat_ws(" ", x, get(toks, i + lit(1)), get(toks, i + lit(2))))
      val d = docs.withColumn("toks", split(col("text"), " "))
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
        .filter(col("rnk") <= 3).count()
    }

    // q96 as shipped: first-doc groupBy + tag join (skew-safe: a hot
    // gram is a skewed join key, not a giant collected array)
    def q96Join(): Long = {
      val sh = graft.ml.TextDedup
        .shingleKeyTable(graft.Tables.t(spark, sfDir, "documents"), 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val first = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
      val r = sh.join(first, Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_new"))
        .count()
      sh.unpersist(false); r
    }
    // variant: one groupBy collects each gram's postings, re-explodes
    // with the min tag — one less shuffle, but a corpus-hot gram
    // materializes its whole posting list as a single array row
    def q96Collect(): Long = {
      val sh = graft.ml.TextDedup
        .shingleKeyTable(graft.Tables.t(spark, sfDir, "documents"), 3)
      sh.groupBy(col("shingle"))
        .agg(min(col("doc_id")).as("first_doc"),
          collect_list(col("doc_id")).as("ds"))
        .select(col("first_doc"), explode(col("ds")).as("doc_id"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_new"))
        .count()
    }

    // Stored band index (ml/BandIndex): write-once + probe-per-batch
    // timings, q73's parameters, 90/10 corpus/batch split
    def biWrite(): Long = {
      graft.ml.BandIndex.write(
        graft.Tables.t(spark, sfDir, "documents").filter(col("doc_id") % 10 =!= 0),
        "g_ab_band_idx", n = 3, k = 12, bands = 4, buckets = 16)
      1L
    }
    def biProbe(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
      graft.ml.BandIndex.probe(spark, "g_ab_band_idx",
        d.filter(col("doc_id") % 10 === 0),
        n = 3, k = 12, bands = 4, threshold = 0.3).count()
    }

    // q81 r8 experiment: current two-agg form reshuffles the pairs
    // frame from hash(ok, sk) to hash(ok) for the orders join; the
    // one-shuffle form repartitions the FACT on l_orderkey first so
    // the pair agg (subset rule), the orders join, and the per-order
    // agg all reuse that single exchange.
    def q81Body(li0: DataFrame): Long = {
      val pairs = li0
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("max_ship"))
      pairs
        .join(graft.Tables.t(spark, sfDir, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          (col("max_ship") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
            .cast("int"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"),
          max(when(col("is_late") === 1, col("l_suppkey"))).as("sole_supp"))
        .filter(col("n_late") === 1 && col("n_supp") > 1)
        .join(broadcast(graft.Tables.t(spark, sfDir, "supplier")),
          col("sole_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .count()
    }
    def q81Cur(): Long = q81Body(graft.Tables.t(spark, sfDir, "lineitem"))
    def q81OneShuffle(): Long = q81Body(
      graft.Tables.t(spark, sfDir, "lineitem").repartition(col("l_orderkey")))
    // r9 (verdict #8): fold the lateness flag into the FIRST agg by
    // broadcast-joining the orders dates at row level before it — the
    // mid-plan pairs⋈orders join (and max_ship) disappear; the whole
    // body after the one repartition is a single fused stage.
    def q81Fold(): Long = {
      val od = graft.Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
        .join(broadcast(od), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max((col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .cast("int")).as("is_late"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"),
          max(when(col("is_late") === 1, col("l_suppkey"))).as("sole_supp"))
        .filter(col("n_late") === 1 && col("n_supp") > 1)
        .join(broadcast(graft.Tables.t(spark, sfDir, "supplier")),
          col("sole_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .count()
    }

    // r12: the fold shape WITHOUT the fact-side broadcast — orders
    // exchanges on its key like any fact⋈fact join, shuffle_hash
    // build per partition (no SMJ sorts of 6M+1.5M rows), aggs ride
    // the join's partitioning. The honest 100 TB form of q81_fold.
    def q81FoldSh(): Long = {
      val od = graft.Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderdate")).hint("shuffle_hash")
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
        .join(od, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max((col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .cast("int")).as("is_late"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"),
          max(when(col("is_late") === 1, col("l_suppkey"))).as("sole_supp"))
        .filter(col("n_late") === 1 && col("n_supp") > 1)
        .join(broadcast(graft.Tables.t(spark, sfDir, "supplier")),
          col("sole_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .count()
    }

    // q31 r9 decomposition: where does the 1.2-1.6 s go? Stage
    // isolates over the same parameters as the query (n=3, dfCap=50).
    def q31Cur(): Long = {
      val r = graft.ml.TextDedup.jaccardPairsPostings(
        graft.Tables.t(spark, sfDir, "documents"), n = 3, threshold = 0.3,
        dfCap = 50).count()
      spark.catalog.clearCache(); r
    }
    def q31Keys(): Long =
      graft.ml.TextDedup.shingleKeyTable(
        graft.Tables.t(spark, sfDir, "documents"), 3).count()
    def q31Postings(): Long = {
      val r = graft.ml.TextDedup.shingleKeyTable(
          graft.Tables.t(spark, sfDir, "documents"), 3)
        .groupBy(col("shingle"))
        .agg(collect_list(col("doc_id")).as("docs"))
        .filter(size(col("docs")) <= 50)
        .count()
      spark.catalog.clearCache(); r
    }

    // r14: shipped ad-hoc vs shipped stored-index paths — both sides
    // call SparkEntry.queries (the r13 *_cur mandate: only the shipped
    // path measures shipped input partitioning). The indexed entries'
    // ensure() builds on the FIRST rep; min-of-reps reads the warm
    // probe, which is the amortized cost the index exists to buy.
    def q31Entry(): Long = {
      val r = graft.SparkEntry
        .queries("q31_ngram_jaccard")(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }
    def q125Entry(): Long = {
      val r = graft.SparkEntry
        .queries("q125_ngram_jaccard_indexed")(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }
    def q101Entry(): Long = {
      val r = graft.SparkEntry
        .queries("q101_containment_incremental")(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }
    def q126Entry(): Long = {
      val r = graft.SparkEntry
        .queries("q126_containment_indexed")(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }
    // r14: q126's fixture split (>= 400) makes the "batch" 92-99% of
    // the corpus, structurally capping the indexed win at the batch-
    // tokenize term. This pair measures the REALISTIC daily-ingest
    // ratio instead — a ~4% batch against the stored ~96% corpus.
    def q126Small(): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id").cast("int"))
      val idx = graft.ml.NgramIndex.ensure(spark, sfDir,
        docs.filter(col("doc_id") < 4800).select(col("doc_id"), col("text")),
        n = 4, dfMax = 64, tag = "pre4800")
      val r = graft.ml.NgramIndex.probeContainment(spark, idx,
        docs.filter(col("doc_id") >= 4800).select(col("doc_id"), col("text")),
        threshold = 0.6, dfCap = 50).count()
      spark.catalog.clearCache(); r
    }
    def q126SmallAdhoc(): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id").cast("int"))
      val r = graft.ml.TextDedup.containmentPairsIncremental(docs,
        col("doc_id") >= 4800, n = 4, threshold = 0.6, dfCap = 50).count()
      spark.catalog.clearCache(); r
    }

    // q32 r9 decomposition (companion to q31's): same parameters as
    // the query (n=3, k=12, bands=4).
    def q32Digests(): Long = {
      val r = graft.ml.TextDedup.shingleDigests(
        graft.ml.TextDedup.shingleSets(
          graft.Tables.t(spark, sfDir, "documents"), 3)).count()
      spark.catalog.clearCache(); r
    }
    def q32Sigs(): Long = {
      val withDig = graft.ml.TextDedup.shingleDigests(
        graft.ml.TextDedup.shingleSets(
          graft.Tables.t(spark, sfDir, "documents"), 3))
      val r = graft.ml.TextDedup
        .minhashSignaturesFromDigests(withDig, 12).count()
      spark.catalog.clearCache(); r
    }

    // q101 r9 decomposition: flagged-postings build vs the full
    // incremental containment (expansion + sizes + finalize on top).
    def q101Postings(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
      val r = graft.ml.TextDedup.containmentPostings(
        d, isNew = col("doc_id") >= 4000, n = 4, dfCap = 50).count()
      spark.catalog.clearCache(); r
    }
    def q101Cur(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id").cast("int"))
      val r = graft.ml.TextDedup.containmentPairsIncremental(
        d, isNew = col("doc_id") >= 4000, n = 4, threshold = 0.6,
        dfCap = 50).count()
      spark.catalog.clearCache(); r
    }
    // struct-pair path (long ids) — the pre-r9 shape, kept for the A/B
    def q101Struct(): Long = {
      val d = graft.Tables.t(spark, sfDir, "documents")
      val r = graft.ml.TextDedup.containmentPairsIncremental(
        d, isNew = col("doc_id") >= 4000, n = 4, threshold = 0.6,
        dfCap = 50).count()
      spark.catalog.clearCache(); r
    }

    // q95 r9: shipped = lineitem⋈eu → window(pk) exchange → DISTINCT
    // over the wide output row (another exchange). Rewrite = semi
    // attach of eu keys (broadcast), repartition(pk) ONCE, pair-level
    // min agg (subset rule, no exchange), window(pk) (no exchange),
    // filter, THEN broadcast-attach supplier attrs — (pk,sk) is unique
    // after the pair agg so the DISTINCT disappears entirely.
    def q95Cur(): Long = {
      val eu = graft.Tables.t(spark, sfDir, "supplier")
        .join(broadcast(graft.Tables.t(spark, sfDir, "nation")
            .join(graft.Tables.t(spark, sfDir, "region").filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val w = Window.partitionBy(col("l_partkey"))
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit"))
        .join(eu, col("l_suppkey") === col("s_suppkey"))
        .withColumn("mu", min(col("unit")).over(w))
        .filter(col("unit") === col("mu"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("n_name"),
          round(col("s_acctbal"), 2).as("acctbal"),
          round(col("unit"), 4).as("unit_price"))
        .distinct()
        .orderBy(col("acctbal").desc, col("p_partkey"), col("s_suppkey"))
        .limit(100).count()
    }
    def q95PairAgg(): Long = {
      val eu = graft.Tables.t(spark, sfDir, "supplier")
        .join(broadcast(graft.Tables.t(spark, sfDir, "nation")
            .join(graft.Tables.t(spark, sfDir, "region").filter(col("r_name") === "EUROPE"),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val w = Window.partitionBy(col("l_partkey"))
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit"))
        .join(broadcast(eu.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("unit")).as("unit"))
        .withColumn("mu", min(col("unit")).over(w))
        .filter(col("unit") === col("mu"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
          col("s_name"), col("n_name"),
          round(col("s_acctbal"), 2).as("acctbal"),
          round(col("unit"), 4).as("unit_price"))
        .orderBy(col("acctbal").desc, col("p_partkey"), col("s_suppkey"))
        .limit(100).count()
    }

    // q100 r9: shipped = groupBy(pk,sk) exchange → window(pk) second
    // exchange → distinct(sk) third. Rewrite = repartition(pk) once;
    // agg + window reuse it; distinct stays (tiny: suppliers only).
    def q100Cur(): Long = {
      val boltParts = graft.Tables.t(spark, sfDir, "part")
        .filter(col("p_name").like("%bolt%")).select(col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"))
        .join(boltParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("sq"))
        .withColumn("tot", sum(col("sq")).over(w))
        .filter(col("sq") * lit(20L) > col("tot") * lit(3L))
        .select(col("l_suppkey")).distinct()
        .join(graft.Tables.t(spark, sfDir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(graft.Tables.t(spark, sfDir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name")).count()
    }
    def q100OneShuffle(): Long = {
      val boltParts = graft.Tables.t(spark, sfDir, "part")
        .filter(col("p_name").like("%bolt%")).select(col("p_partkey"))
      val w = Window.partitionBy(col("l_partkey"))
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("long").as("qty"))
        .join(boltParts, col("l_partkey") === col("p_partkey"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("qty")).as("sq"))
        .withColumn("tot", sum(col("sq")).over(w))
        .filter(col("sq") * lit(20L) > col("tot") * lit(3L))
        .select(col("l_suppkey")).distinct()
        .join(graft.Tables.t(spark, sfDir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(graft.Tables.t(spark, sfDir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name")).count()
    }

    // r12 sf1 sweep, remaining TPC-H hotspots. q92/q90 carry the q81
    // question: is the orders attach paying SMJ sorts, and does a
    // shuffle_hash (or agg-below-join fold) beat it? q80 asks whether
    // the agg-join-back's two fact passes collapse to one exchange
    // (cells-per-part are bounded by the 1..50 qty domain, so the
    // per-part fold is a <=50-element array op). q72 isolates the
    // bigOrders aggregation from the join tail.
    def q92Cur(): Long =
      graft.SparkEntry.queries("q92_product_profit")(spark, sfDir).count()
    def q92Body(ordHint: Boolean): Long = {
      val revE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val parts = graft.Tables.t(spark, sfDir, "part")
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100, 0).cast("long").as("retail_e2"))
      val supNation = graft.Tables.t(spark, sfDir, "supplier")
        .join(broadcast(graft.Tables.t(spark, sfDir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      val ord0 = graft.Tables.t(spark, sfDir, "orders").select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"))
      val ord = if (ordHint) ord0.hint("shuffle_hash") else ord0
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revE4.as("rev_e4"), col("l_quantity").cast("long").as("qty"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(supNation, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(col("rev_e4") - col("retail_e2") * col("qty") * lit(10L))
          .as("profit_e4"))
        .select(col("n_name"), col("o_year"),
          (col("profit_e4") / lit(10000.0)).as("profit"))
        .orderBy(col("n_name"), col("o_year")).count()
    }
    def q92Sh(): Long = q92Body(true)
    // q92 fold: profit is orders-independent, so pre-aggregate it to
    // (orderkey, nation) partials BELOW the orders join (q67/q81
    // pattern); repartition(orderkey) serves the pre-agg AND the join.
    def q92Fold(): Long = {
      val revE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      val parts = graft.Tables.t(spark, sfDir, "part")
        .filter(col("p_name").like("%gear%"))
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100, 0).cast("long").as("retail_e2"))
      val supNation = graft.Tables.t(spark, sfDir, "supplier")
        .join(broadcast(graft.Tables.t(spark, sfDir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revE4.as("rev_e4"), col("l_quantity").cast("long").as("qty"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(supNation, col("l_suppkey") === col("s_suppkey"))
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("n_name"))
        .agg(sum(col("rev_e4") - col("retail_e2") * col("qty") * lit(10L))
          .as("p_e4"))
        .join(graft.Tables.t(spark, sfDir, "orders").select(col("o_orderkey"),
            year(col("o_orderdate")).as("o_year")).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(col("p_e4")).as("profit_e4"))
        .select(col("n_name"), col("o_year"),
          (col("profit_e4") / lit(10000.0)).as("profit"))
        .orderBy(col("n_name"), col("o_year")).count()
    }
    def q90Cur(): Long =
      graft.SparkEntry.queries("q90_nation_trade")(spark, sfDir).count()
    def q90Scan(): Long =
      graft.Tables.t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("rev_e4"))
        .count()
    def q90Parts(stage: Int, custFirst: Boolean): Long = {
      val nations = graft.Tables.t(spark, sfDir, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = graft.Tables.t(spark, sfDir, "supplier")
        .join(broadcast(nations.withColumnRenamed("n_name", "supp_nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = graft.Tables.t(spark, sfDir, "customer")
        .join(broadcast(nations.withColumnRenamed("n_name", "cust_nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("cust_nation"))
      val ord = graft.Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = graft.Tables.t(spark, sfDir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          (round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("rev_e4"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      if (stage == 1) return li.count()
      val ordJ = if (stage == 4) ord.hint("shuffle_hash") else ord
      val joined =
        if (custFirst)
          li.join(ordJ.join(cust, col("o_custkey") === col("c_custkey"))
              .select(col("o_orderkey"), col("cust_nation")),
            col("l_orderkey") === col("o_orderkey"))
        else
          li.join(ordJ, col("l_orderkey") === col("o_orderkey"))
            .join(cust, col("o_custkey") === col("c_custkey"))
      if (stage == 2 && !custFirst)
        return li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      joined
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev_e4")).as("rev_e4"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          (col("rev_e4") / lit(10000.0)).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .count()
    }
    def q80Cur(): Long =
      graft.SparkEntry.queries("q80_small_qty_revenue")(spark, sfDir).count()
    def q80AggOnly(): Long =
      graft.Tables.t(spark, sfDir, "lineitem")
        .groupBy(col("l_partkey")).agg(avg(col("l_quantity")).as("aq")).count()
    // q80 one exchange: repartition(partkey); the (partkey, qty) cell
    // agg and the per-part fold both ride it. qty is integral 1..50 so
    // cells/part <= 50; aq = sq/n is the same IEEE division as avg().
    def q80OneScan(): Long = {
      val cells = graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("ep_cents"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"), sum(col("ep_cents")).as("cents"))
      cells.groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity") * col("cnt")).as("sq"),
          sum(col("cnt")).as("n"),
          collect_list(struct(col("l_quantity").as("q"), col("cnt"),
            col("cents"))).as("cells"))
        .select(explode(filter(col("cells"),
          c => c("q") < lit(0.5) * (col("sq") / col("n")))).as("c"))
        .agg(sum(col("c.cnt")).as("n_items"),
          (sum(col("c.cents")) / lit(100.0)).as("revenue"))
        .count()
    }
    // q80 old agg-join-back form (kept for cross-scale regression
    // checks of the shipped window form)
    def q80JoinBack(): Long = {
      val li = graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("ep_cents"))
      val avgq = li.groupBy(col("l_partkey"))
        .agg(avg(col("l_quantity")).as("aq"))
      li.join(avgq, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.5) * col("aq"))
        .agg(count(lit(1)).as("n_items"),
          (sum(col("ep_cents")) / lit(100.0)).as("revenue"))
        .count()
    }
    // q80 window form: same single exchange but sort-based (window avg
    // over partkey) instead of the two hash aggs.
    def q80Window(): Long = {
      val w = Window.partitionBy(col("l_partkey"))
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("ep_cents"))
        .withColumn("aq", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.5) * col("aq"))
        .agg(count(lit(1)).as("n_items"),
          (sum(col("ep_cents")) / lit(100.0)).as("revenue"))
        .count()
    }
    // q87: the partkey fact agg's map-side partials barely compress
    // (partkey is uniform-random over the fact, each mapper sees most
    // of the part domain: ~1.3:1) — do the 150k-entry mapper hash
    // maps pay for themselves vs shuffling raw narrow rows into a
    // clustered single-phase agg?
    def q87Cur(): Long =
      graft.SparkEntry.queries("q87_part_revenue_concentration")(spark, sfDir)
        .count()
    def q87AggOnly(): Long =
      graft.Tables.t(spark, sfDir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
          .as("rev_e4")).count()
    def q87RepartAgg(): Long =
      graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_partkey"),
          (round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
            .as("e4"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("e4")).as("rev_e4")).count()
    def q72Cur(): Long =
      graft.SparkEntry.queries("q72_large_volume_cust")(spark, sfDir).count()
    def q72AggOnly(): Long =
      graft.Tables.t(spark, sfDir, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(round(col("sq"), 4) > 300).count()

    // q85 r8 decomposition (the 31.9x finding): current =
    // repartition + centroid agg (2 exchanges) + broadcast join +
    // score; litmap = collect the (label, pos) centroid rows once
    // (bounded: labels x dims) and score against literal maps — one
    // scan job, zero joins. centroid_only / score_only isolate the
    // stages.
    def embs = graft.Tables.t(spark, sfDir, "embeddings")

    // q37 r9 decomposition (the bimodal 0.3-0.95 s finding, 3 rounds):
    // cur = lshTopK as shipped (prepared() feeds q-filtered + candidate
    // branches; q's filter pushes below the repartition so the two
    // branches are DIFFERENT exchange subtrees — no ReusedExchange, the
    // scan+transform+norm pipeline runs twice, and AQE picks the join
    // strategy from runtime stats, a coin-flip between broadcast-q and
    // SMJ near the threshold). Stage isolates: prep_only (one branch's
    // build), persist (materialize prepared+bucket once, both
    // consumers read the cache — one build, and the q side is then
    // stats-known-small so the broadcast pick is stable), nowin
    // (scored join without the rank window).
    def q37Cur(): Long =
      graft.ml.Similarity.lshTopK(embs, q => q < 10, k = 3, bits = 4).count()
    def q37PrepOnly(): Long =
      graft.ml.Similarity.prepared(embs)
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
        .count()
    def q37Persist(): Long = {
      val p = graft.ml.Similarity.prepared(embs)
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val q = p.filter(col("vec_id") < 10)
        .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = p.select(col("bucket"), col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cos"), 6).desc, col("cand_id"))
      val r = q.join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cos", graft.ml.Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
      p.unpersist(false); r
    }
    // explicit broadcast(q): the query side is contract-small (the
    // queryIds predicate), so pin BroadcastHashJoin instead of letting
    // AQE re-derive it from runtime stats each session — the suspected
    // bimodal flip (SMJ shuffles the whole candidate side + sorts).
    def q37Bcast(): Long = {
      val p = graft.ml.Similarity.prepared(embs)
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
      val q = p.filter(col("vec_id") < 10)
        .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = p.select(col("bucket"), col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cos"), 6).desc, col("cand_id"))
      broadcast(q).join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cos", graft.ml.Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
    }
    // single-build form: ONE prepared() subtree; query rows gathered
    // per bucket with a conditional collect_list window (tiny: bounded
    // by queries-per-bucket), then exploded against every candidate in
    // the bucket — no self-join, so the scan+transform+norm pipeline
    // runs once instead of twice.
    def q37OneBuild(): Long = {
      val p = graft.ml.Similarity.prepared(embs)
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
      val qs = collect_list(when(col("vec_id") < 10,
        struct(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))))
        .over(Window.partitionBy(col("bucket")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cos"), 6).desc, col("cand_id"))
      p.withColumn("qs", qs)
        .withColumn("q", explode(col("qs")))
        .filter(col("q.query_id") =!= col("vec_id"))
        .select(col("q.query_id").as("query_id"), col("vec_id").as("cand_id"),
          (graft.ml.Similarity.dot(col("q.qv"), col("v")) /
            (col("q.qn") * col("nrm"))).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3).count()
    }
    def q37NoWin(): Long = {
      val p = graft.ml.Similarity.prepared(embs)
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
      val q = p.filter(col("vec_id") < 10)
        .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      val c = p.select(col("bucket"), col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
      q.join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cos", graft.ml.Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .count()
    }

    def q85Cur(): Long =
      graft.ml.Similarity.centroidCosine(embs)
        .filter(round(col("cos"), 6) < -0.05).count()
    def q85CentroidOnly(): Long =
      embs.select(col("label"),
          posexplode(transform(col("embedding"), x => x.cast("double")))
            .as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("x")), 6).as("c")).count()
    def q85Litmap(): Long =
      graft.ml.Similarity.centroidCosineLitmap(embs)
        .filter(round(col("cos"), 6) < -0.05).count()

    // q102 r10 decomposition (the r9 verdict's 4.0×→5× creep): where
    // does the WARM indexed probe's time go — postings scan, broadcast
    // query attach, the one shuffle + window, or driver-side plan
    // construction? lazy so unrelated regex runs never pay the build.
    lazy val lexIdx = graft.ml.LexIndex.ensure(spark, sfDir,
      graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), col("text")))
    lazy val lexVocab: Seq[String] = {
      import spark.implicits._
      spark.read.parquet(s"$lexIdx/postings")
        .filter(col("doc_id") < 5).select(col("term").cast("string"))
        .distinct().as[String].collect().toSeq
    }
    def q102Cur(): Long =
      graft.ml.LexIndex.probeIndexed(spark, lexIdx, col("doc_id") < 5, 5).count()
    // q112 fixed-tax decomposition (r14, r13 verdict #7): shipped
    // probe vs its driver-side preparatory costs — the centroid
    // collect job and plan construction. Both isolates inherit the
    // shipped path's stored tables (ensureQ112Index via the first
    // q112_cur rep builds them).
    def q112Cur(): Long = {
      val r = graft.SparkEntry
        .queries("q112_ivf_indexed")(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }
    def q112CentsOnly(): Long = {
      val table = "g_q112_ivf_" + Integer.toHexString(sfDir.hashCode)
      graft.ml.Ivf.centroidArray(
        spark.table(graft.ml.IvfIndex.centroidsTable(table)))
      1L
    }
    def q112PlanOnly(): Long = {
      val table = "g_q112_ivf_" + Integer.toHexString(sfDir.hashCode)
      graft.ml.IvfIndex.probe(spark, table,
          graft.Tables.t(spark, sfDir, "embeddings").filter(col("vec_id") < 10),
          k = 3, nprobe = 2)
        .queryExecution.executedPlan
      1L
    }
    def q102PlanOnly(): Long = {
      graft.ml.LexIndex.probeIndexed(spark, lexIdx, col("doc_id") < 5, 5)
        .queryExecution.executedPlan
      1L
    }
    def q102ScanOnly(): Long =
      spark.read.parquet(s"$lexIdx/postings")
        .filter(col("term").isin(lexVocab: _*)).count()
    def q102ScanJoin(): Long = {
      import spark.implicits._
      val qdf = lexVocab.map(t => (0L, t)).toDF("query_id", "term")
      spark.read.parquet(s"$lexIdx/postings")
        .filter(col("term").isin(lexVocab: _*))
        .join(broadcast(qdf), Seq("term")).count()
    }

    // q04/q06 r10 decomposition (the r9 verdict's floor-band drift:
    // both read >=0.57 s at >6x in two clean judge sessions vs <0.3 s
    // in r8): split the fact scan, the li⋈o join, and the full query
    // so the drift pins to a stage — or to the session floor.
    def q04Cur(): Long =
      graft.SparkEntry.queries("q04_region_revenue")(spark, sfDir).count()
    def q04LiJoin(): Long = {
      val li = graft.Tables.t(spark, sfDir, "lineitem")
      val o = graft.Tables.t(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "F")
      li.join(o, li("l_orderkey") === o("o_orderkey")).count()
    }
    def q04Scans(): Long =
      graft.Tables.t(spark, sfDir, "lineitem").count() +
        graft.Tables.t(spark, sfDir, "orders").count()
    def q06Cur(): Long =
      graft.SparkEntry.queries("q06_orders_no_items")(spark, sfDir).count()
    def q06AntiOnly(): Long = {
      val o = graft.Tables.t(spark, sfDir, "orders")
      val li = graft.Tables.t(spark, sfDir, "lineitem")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti").count()
    }
    def q06ShuffleHash(): Long = {
      val o = graft.Tables.t(spark, sfDir, "orders")
      val li = graft.Tables.t(spark, sfDir, "lineitem").hint("shuffle_hash")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti").count()
    }
    def q06BuildDistinct(): Long = {
      // pre-distinct the build side: 600k l_orderkey -> 150k distinct
      // keys before the broadcast build
      val o = graft.Tables.t(spark, sfDir, "orders")
      val li = graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_orderkey")).distinct()
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti").count()
    }

    // q110 r10 decomposition: quality-scan vs percentile agg vs the
    // assignment pass
    def q110Cur(): Long =
      graft.SparkEntry.queries("q110_curriculum")(spark, sfDir).count()
    def q110ScanOnly(): Long = {
      val q4 = round(graft.ml.TextAnalysis.qualityScore(col("text")), 4)
      graft.Tables.t(spark, sfDir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), q4.as("q4"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        .count()
    }
    def q110ThrOnly(): Long = {
      val q4 = round(graft.ml.TextAnalysis.qualityScore(col("text")), 4)
      val scored = graft.Tables.t(spark, sfDir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), q4.as("q4"))
      val thrCols = (1 to 9).map(k =>
        expr(s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY q4)").as(s"t$k"))
      scored.agg(thrCols.head, thrCols.tail: _*).head()
      1L
    }

    // q84 r10 decomposition: tokenize scan vs pair explode vs the
    // grouped count
    def q84Toks() = graft.Tables.t(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), org.apache.spark.sql.functions.split(col("text"), " ").as("toks"))
    def q84Cur(): Long =
      graft.SparkEntry.queries("q84_bpe_pairs")(spark, sfDir).count()
    def q84ScanOnly(): Long = q84Toks().count()
    def q84ExplodeOnly(): Long = {
      val th = col("toks")
      val pairs = slice(
        zip_with(th, slice(concat(th, array(lit(null).cast("string"))), lit(2), size(th)),
          (a, b) => struct(a.as("a"), b.as("b"))),
        lit(1), size(th) - 1)
      q84Toks().filter(size(th) >= 2).select(explode(pairs).as("p")).count()
    }

    // q48 r11 decomposition: shipped form re-explodes the corpus for
    // the scoring join (two corpus-sized explode passes); the tf form
    // aggregates (doc_id, tok) once and derives BOTH the LM and the
    // per-doc score from that vocab×docs-sized frame (the q82 docpart
    // pattern). Floor = one explode pass.
    def q48Cur(): Long =
      graft.SparkEntry.queries("q48_unigram_surprisal")(spark, sfDir).count()
    def q48ScanOnly(): Long = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok")).count()
    def q48LmOnly(): Long = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n")).count()
    def q48Tf(): Long = {
      val d = docs
      val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vocab = tf.groupBy(col("tok")).agg(sum(col("tf")).as("n"))
      val totalRow = vocab.agg(sum(col("n")).as("total"))
      val lm = vocab.crossJoin(broadcast(totalRow))
        .select(col("tok"), log(col("n") / col("total").cast("double")).as("logp"))
      val r = tf.join(broadcast(lm), Seq("tok"))
        .groupBy(col("doc_id"))
        .agg(round(sum(-col("logp") * col("tf")) / sum(col("tf")), 4).as("surprisal"),
          sum(col("tf")).as("n_tokens"))
        .count()
      tf.unpersist(false); r
    }

    // q54/ivf probe shape (r11, the lex two-shuffle finding applied to
    // the vector probes): shipped Ivf.topK lets Catalyst pick the
    // build side — observed broadcasting the CORPUS side, which makes
    // the candidate dot products compute on the query side's ≤|Q|
    // non-empty partitions; past the broadcast threshold the join
    // falls back to hash(cell_id), capping parallelism at the cell
    // count. broadcast(queryCells) streams the corpus at its input
    // partitioning (full width) and the rank window's exchange is
    // WindowGroupLimit-bounded.
    def ivfParts(bq: Boolean): Long = {
      val p = graft.ml.Similarity.prepared(embs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cents = graft.ml.Ivf.centroidArray(graft.ml.Ivf.train(p, 8, 0))
      val qc = p.filter(col("vec_id") < 10)
        .withColumn("cell_id", explode(transform(
          slice(graft.ml.Ivf.rankedCells(cents, col("v")), 1, 2),
          s => s.getField("cell_id"))))
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"), col("cell_id"))
      val cands = p
        .withColumn("cell_id",
          element_at(graft.ml.Ivf.rankedCells(cents, col("v")), 1).getField("cell_id"))
        .select(col("cell_id"), col("vec_id").as("cand_id"),
          col("v").as("cv"), col("nrm").as("cn"))
      val wr = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cos"), 6).desc, col("cand_id"))
      val qside = if (bq) broadcast(qc) else qc
      val r = qside.join(cands, Seq("cell_id"))
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cos",
          graft.ml.Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 3).count()
      p.unpersist(false); r
    }
    def q54Cur(): Long =
      graft.SparkEntry.queries("q54_ivf_topk")(spark, sfDir).count()

    // q115 r11 decomposition: the bigram explode + per-instance md5 is
    // the suspected wall (oracle-portable bucketing — the q61 hash);
    // stage isolates below, plus a variant hashing per DISTINCT
    // (doc, gram) row after the tf groupBy (fewer md5 evals, same
    // buckets).
    def q115Grams() = {
      val toksE = split(col("text"), " ")
      slice(zip_with(toksE,
        slice(concat(toksE, array(lit(null).cast("string"))), lit(2), size(toksE)),
        (a, b) => concat_ws(" ", a, b)), lit(1), size(toksE) - 1)
    }
    def q115Cur(): Long =
      graft.SparkEntry.queries("q115_dsir_selection")(spark, sfDir).count()
    // r13: the shipped q115 feeds UNrepartitioned documents into the
    // two bigram-explode passes — on single-file testdata both passes
    // run on ONE core (the CLAUDE.md trap); the r11 decomposition's
    // isolates all used the repartitioned `docs` helper, so the pin
    // never measured the shipped partitioning
    def q115Repart(): Long =
      graft.ml.Dsir.hashedBigramWeights(
        graft.Tables.t(spark, sfDir, "documents")
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id")),
        isTarget = col("lang") === "en", buckets = 256).count()
    def q115ScanOnly(): Long = docs
      .select(col("doc_id"), explode(q115Grams()).as("gram")).count()
    def q115Md5Only(): Long = docs
      .select(col("doc_id"), explode(q115Grams()).as("gram"))
      .select((conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 256).as("f"))
      .count()
    def q115TfOnly(): Long = docs
      .select(col("doc_id"), (col("lang") === "en").as("is_t"),
        explode(q115Grams()).as("gram"))
      .select(col("doc_id"), col("is_t"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 256).as("f"))
      .groupBy(col("doc_id"), col("is_t"), col("f")).agg(count(lit(1)).as("tf"))
      .count()
    def q115GramTf(): Long = docs
      .select(col("doc_id"), (col("lang") === "en").as("is_t"),
        explode(q115Grams()).as("gram"))
      .groupBy(col("doc_id"), col("is_t"), col("gram")).agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("is_t"), col("tf"),
        (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 256).as("f"))
      .groupBy(col("doc_id"), col("is_t"), col("f")).agg(sum(col("tf")).as("tf"))
      .count()

    // warm-feats isolate: materialize the tf table first, then run the
    // LM aggs + scoring join off the cache — cur minus this ≈ nothing,
    // so any gap is in the job CHAIN, not the data work
    def q115Rest(): Long = {
      val feats = docs
        .select(col("doc_id"), (col("lang") === "en").as("is_t"),
          explode(q115Grams()).as("gram"))
        .select(col("doc_id"), col("is_t"),
          (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 256).as("f"))
        .groupBy(col("doc_id"), col("is_t"), col("f")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      feats.count()
      val sstat = feats.groupBy(col("f")).agg(sum(col("tf")).as("ns"))
      val tstat = feats.filter(col("is_t"))
        .groupBy(col("f")).agg(sum(col("tf")).as("nt"))
      val totals = sstat.agg(sum(col("ns")).cast("double").as("st"))
        .crossJoin(tstat.agg(sum(col("nt")).cast("double").as("tt")))
      val lm = sstat.join(tstat, Seq("f"), "left").crossJoin(broadcast(totals))
        .select(col("f"),
          (log((coalesce(col("nt"), lit(0L)) + 1) / (col("tt") + 256)) -
            log((col("ns") + 1) / (col("st") + 256))).as("lr"))
      val r = feats.join(broadcast(lm), Seq("f"))
        .groupBy(col("doc_id"))
        .agg(round(sum(col("tf") * col("lr")), 4).as("logw"))
        .count()
      feats.unpersist(false); r
    }

    // q117 decomposition: scan → tokenize → per-token md5 bucket →
    // literal-coef fold → TakeOrdered(100). Which term dominates?
    def q117Cur(): Long =
      graft.SparkEntry.queries("q117_classifier_score")(spark, sfDir).count()
    def q117ScanOnly(): Long =
      docs.select(col("doc_id"), length(col("text")).as("l")).count()
    def q117TokOnly(): Long = docs
      .select(col("doc_id"),
        size(graft.ml.QualityClassifier.toksCol(col("text"))).as("n"))
      .count()
    // NOTE: size(transform(...)) would be simplified to size(...) and
    // skip the md5 entirely — force per-element evaluation with a fold
    def q117Md5Only(): Long = docs
      .select(col("doc_id"),
        transform(graft.ml.QualityClassifier.toksCol(col("text")),
          tk => graft.ml.QualityClassifier.bucketOf(tk, 64).cast("int"))
          .as("bk"))
      .select(col("doc_id"),
        aggregate(col("bk"), lit(0L), (a, b) => a + b).as("s")).count()
    def q117FoldNoSort(): Long = {
      val B = 64
      val cArr = array((0 until B).map(i =>
        lit(((i * 37) % 13 - 6).toLong)): _*)
      docs
        .select(col("doc_id"),
          transform(graft.ml.QualityClassifier.toksCol(col("text")),
            tk => graft.ml.QualityClassifier.bucketOf(tk, B).cast("int"))
            .as("bk"))
        .select(col("doc_id"),
          aggregate(col("bk"), lit(0L),
            (acc, b) => acc + element_at(cArr, b + 1)).as("sum_coef"),
          size(col("bk")).cast("long").as("n_toks"))
        .filter(col("n_toks") > 0).count()
    }
    // same fold but the coef table is a single foldable Literal array
    // instead of CreateArray(64 lits) — the latter sits inside the
    // lambda and is re-materialized PER TOKEN (no CSE in HOF lambdas)
    def q117LitArr(): Long = {
      val B = 64
      val cArr = lit((0 until B).map(i => ((i * 37) % 13 - 6).toLong).toArray)
      docs
        .select(col("doc_id"),
          transform(graft.ml.QualityClassifier.toksCol(col("text")),
            tk => graft.ml.QualityClassifier.bucketOf(tk, B).cast("int"))
            .as("bk"))
        .select(col("doc_id"),
          aggregate(col("bk"), lit(0L),
            (acc, b) => acc + element_at(cArr, b + 1)).as("sum_coef"),
          size(col("bk")).cast("long").as("n_toks"))
        .filter(col("n_toks") > 0)
        .orderBy((col("sum_coef").cast("double") / col("n_toks")).desc,
          col("doc_id"))
        .limit(100).count()
    }

    // fold with the coef computed ARITHMETICALLY from b (valid only for
    // the synthetic q117 table) — isolates element_at lookup cost from
    // the two-reference fold shape
    def q117Arith(): Long = docs
      .select(col("doc_id"),
        transform(graft.ml.QualityClassifier.toksCol(col("text")),
          tk => graft.ml.QualityClassifier.bucketOf(tk, 64).cast("int"))
          .as("bk"))
      .select(col("doc_id"),
        aggregate(col("bk"), lit(0L),
          (acc, b) => acc + (b.cast("long") * 37 % 13 - 6)).as("sum_coef"),
        size(col("bk")).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .orderBy((col("sum_coef").cast("double") / col("n_toks")).desc,
        col("doc_id"))
      .limit(100).count()

    // single-reference fold: compute n_toks from a second cheap
    // tokenize instead of referencing bk twice
    def q117OneRef(): Long = {
      val B = 64
      val cArr = array((0 until B).map(i =>
        lit(((i * 37) % 13 - 6).toLong)): _*)
      docs
        .select(col("doc_id"),
          transform(graft.ml.QualityClassifier.toksCol(col("text")),
            tk => graft.ml.QualityClassifier.bucketOf(tk, B).cast("int"))
            .as("bk"),
          size(graft.ml.QualityClassifier.toksCol(col("text")))
            .cast("long").as("n_toks"))
        .select(col("doc_id"),
          aggregate(col("bk"), lit(0L),
            (acc, b) => acc + element_at(cArr, b + 1)).as("sum_coef"),
          col("n_toks"))
        .filter(col("n_toks") > 0)
        .orderBy((col("sum_coef").cast("double") / col("n_toks")).desc,
          col("doc_id"))
        .limit(100).count()
    }

    def q117NoRep(): Long = {
      val B = 64
      val cArr = array((0 until B).map(i =>
        lit(((i * 37) % 13 - 6).toLong)): _*)
      graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"),
          transform(graft.ml.QualityClassifier.toksCol(col("text")),
            tk => graft.ml.QualityClassifier.bucketOf(tk, B).cast("int"))
            .as("bk"))
        .select(col("doc_id"),
          aggregate(col("bk"), lit(0L),
            (acc, b) => acc + element_at(cArr, b + 1)).as("sum_coef"),
          size(col("bk")).cast("long").as("n_toks"))
        .filter(col("n_toks") > 0)
        .orderBy((col("sum_coef").cast("double") / col("n_toks")).desc,
          col("doc_id"))
        .limit(100).count()
    }

    def q53Cur(): Long =
      graft.ml.Similarity.cosineNearDupPairs(
        graft.Tables.t(spark, sfDir, "embeddings"), threshold = 0.45,
        bucketBits = 4).count()
    def q53Bcast(): Long = {
      val p0 = graft.ml.Similarity.prepared(
        graft.Tables.t(spark, sfDir, "embeddings"))
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
      val a = p0.select(col("bucket"), col("vec_id").as("vec_a"),
          col("v").as("va"), col("nrm").as("na"))
        .repartition(spark.sparkContext.defaultParallelism)
      val b = p0.select(col("bucket"), col("vec_id").as("vec_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(broadcast(b), Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("cos", graft.ml.Similarity.dot(col("va"), col("vb")) /
          (col("na") * col("nb")))
        .filter(round(col("cos"), 6) >= 0.45).count()
    }

    def q53Stats(): Long = {
      val pb = graft.ml.Similarity.prepared(
        graft.Tables.t(spark, sfDir, "embeddings"))
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
      System.err.println("Q53STATS=" +
        pb.queryExecution.optimizedPlan.stats.sizeInBytes +
        " thr=" + org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold)
      1L
    }
    def q53Salted(): Long = {
      val S = 8
      val p0 = graft.ml.Similarity.prepared(
        graft.Tables.t(spark, sfDir, "embeddings"))
        .withColumn("bucket", graft.ml.Similarity.signBucket(col("v"), 4))
      val a = p0.select(col("bucket"), col("vec_id").as("vec_a"),
          col("v").as("va"), col("nrm").as("na"))
        .withColumn("salt", pmod(hash(col("vec_a")), lit(S)))
      val b = p0.select(col("bucket"), col("vec_id").as("vec_b"),
          col("v").as("vb"), col("nrm").as("nb"))
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      a.join(b, Seq("bucket", "salt"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("cos", graft.ml.Similarity.dot(col("va"), col("vb")) /
          (col("na") * col("nb")))
        .filter(round(col("cos"), 6) >= 0.45).count()
    }

    // q67 OLD: customer ⋈ orders LEFT then double-agg (the literal
    // TPC-H Q13 plan — shuffles 1.5M order rows into the join).
    def q67Join(): Long = {
      graft.Tables.t(spark, sfDir, "customer")
        .join(graft.Tables.t(spark, sfDir, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders")).agg(count(lit(1)).as("n_cust"))
        .count()
    }
    // q67 NEW: pre-aggregate orders BELOW the join (map-side combine
    // shrinks the shuffle to (custkey,count) partials), then left-join
    // the 10×-smaller count table to customer keys.
    def q67PreAgg(): Long = {
      val cnt = graft.Tables.t(spark, sfDir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      graft.Tables.t(spark, sfDir, "customer").select(col("c_custkey"))
        .join(cnt, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .groupBy(col("n_orders")).agg(count(lit(1)).as("n_cust"))
        .count()
    }

    // q15 OLD: two events scans (JSON parsed twice) + EXCEPT
    // (distinct both sides + anti-join = three exchanges).
    def q15Except(): Long = {
      val ev = graft.Tables.t(spark, sfDir, "events")
      val a = ev.filter(col("event_type") === "error" && dayofmonth(col("ts")) <= 15)
        .select(col("user_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      val b = ev.filter(col("event_type") === "error" && dayofmonth(col("ts")) > 15)
        .select(col("user_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
      a.except(b).count()
    }
    // q15 NEW: one scan, JSON parsed once, one (user,k) shuffle with
    // half-membership flags; EXCEPT = a ∧ ¬b on the grouped row.
    def q15OneScan(): Long = {
      graft.Tables.t(spark, sfDir, "events")
        .filter(col("event_type") === "error")
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          (dayofmonth(col("ts")) <= 15).as("h1"))
        .groupBy(col("user_id"), col("k"))
        .agg(max(col("h1")).as("a"), max(!col("h1")).as("b"))
        .filter(col("a") && !col("b"))
        .count()
    }

    // q89 r12: replace the gram-scale SORT window (count over
    // partition by gram) with a gram hash-agg collecting the
    // (source, df_src) pairs — the array is bounded by the SOURCE
    // vocabulary (dozens), so no skew hazard, and the n_sources<=3
    // filter drops to a tiny frame before the per-source rank.
    def q89Collect(): Long = {
      val toks = col("toks")
      val grams = transform(toks, (x, i) =>
        concat_ws(" ", x, get(toks, i + lit(1)), get(toks, i + lit(2))))
      val d = docs.withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("source"),
          explode_outer(when(size(toks) >= 3,
            array_distinct(slice(grams, lit(1), size(toks) - 2)))
            .otherwise(array().cast("array<string>"))).as("gram"))
        .filter(col("gram").isNotNull)
        .groupBy(col("gram"), col("source"))
        .agg(count(lit(1)).as("df_src"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("df_src").desc, col("gram"))
      d.groupBy(col("gram"))
        .agg(collect_list(struct(col("source"), col("df_src"))).as("ss"))
        .filter(size(col("ss")) <= 3)
        .select(col("gram"), size(col("ss")).cast("long").as("n_sources"),
          explode(col("ss")).as("s"))
        .select(col("gram"), col("n_sources"),
          col("s.source").as("source"), col("s.df_src").as("df_src"))
        .filter(col("df_src") >= 2)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3).count()
    }

    // q89 stage isolates: explode+agg only (no windows), and an
    // all-LONG variant hashing grams (xxhash64 over token triples, no
    // string concat/allocation) to size the string-gram tax.
    def q89AggOnly(): Long = {
      val toks = col("toks")
      val grams = transform(toks, (x, i) =>
        concat_ws(" ", x, get(toks, i + lit(1)), get(toks, i + lit(2))))
      docs.withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("source"),
          explode_outer(when(size(toks) >= 3,
            array_distinct(slice(grams, lit(1), size(toks) - 2)))
            .otherwise(array().cast("array<string>"))).as("gram"))
        .filter(col("gram").isNotNull)
        .groupBy(col("gram"), col("source"))
        .agg(count(lit(1)).as("df_src")).count()
    }
    // q89 window→agg swap (r19 opt): n_sources via groupBy(gram) +
    // collect_list instead of count().over(Window.partitionBy(gram))
    // — same exchange count, but the gram-cardinality pass becomes a
    // hash aggregate (no sort). per_src lists are bounded by the
    // source count (20), so the collect_list state is tiny.
    def q89GramAgg(): Long = {
      val toks = col("toks")
      val grams = transform(toks, (x, i) =>
        concat_ws(" ", x, get(toks, i + lit(1)), get(toks, i + lit(2))))
      val d = graft.Tables.t(spark, sfDir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("source"),
          explode_outer(when(size(toks) >= 3,
            array_distinct(slice(grams, lit(1), size(toks) - 2)))
            .otherwise(array().cast("array<string>"))).as("gram"))
        .filter(col("gram").isNotNull)
        .groupBy(col("gram"), col("source"))
        .agg(count(lit(1)).as("df_src"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("df_src").desc, col("gram"))
      val r = d.groupBy(col("gram"))
        .agg(count(lit(1)).as("n_sources"),
          collect_list(struct(col("source"), col("df_src"))).as("per_src"))
        .filter(col("n_sources") <= 3)
        .select(col("gram"), col("n_sources"), explode(col("per_src")).as("ps"))
        .select(col("ps.source").as("source"), col("gram"),
          col("ps.df_src").as("df_src"), col("n_sources"))
        .filter(col("df_src") >= 2)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .count()
      spark.catalog.clearCache(); r
    }

    def q89HashAgg(): Long = {
      val th = col("th")
      val grams = transform(th, (x, i) =>
        xxhash64(x, get(th, i + lit(1)), get(th, i + lit(2))))
      docs.withColumn("th",
          transform(split(col("text"), " "), t => xxhash64(t)))
        .select(col("doc_id"), col("source"),
          explode_outer(when(size(th) >= 3,
            array_distinct(slice(grams, lit(1), size(th) - 2)))
            .otherwise(array().cast("array<bigint>"))).as("gram"))
        .filter(col("gram").isNotNull)
        .groupBy(col("gram"), col("source"))
        .agg(count(lit(1)).as("df_src")).count()
    }

    // q96 NEW: n_new(doc) = |{grams: min(doc_id)=doc}| — read off the
    // gram agg alone (second groupBy is DOC-scale), joined to a
    // per-doc gram count at doc cardinality. No gram-scale join.
    def q96NoJoin(): Long = {
      val sh = graft.ml.TextDedup
        .shingleKeyTable(graft.Tables.t(spark, sfDir, "documents"), 3)
        .filter(col("shingle").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perDoc = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      val nNew = sh.groupBy(col("shingle")).agg(min(col("doc_id")).as("fd"))
        .groupBy(col("fd")).agg(count(lit(1)).as("nn"))
      val r = perDoc.join(nNew, col("doc_id") === col("fd"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("nn"), lit(0L)).as("n_new"))
        .count()
      sh.unpersist(false); r
    }

    // q133 (r15): prefix-filtered vs postings Jaccard, SAME inputs as
    // the shipped q31/q133 queries (raw single-file table, int ids —
    // the *_cur partitioning rule). The claim under test: the prefix
    // filter's candidate cut pays off at HIGH thresholds and not at
    // the t=0.3 gate point.
    def q31Docs = graft.Tables.t(spark, sfDir, "documents")
      .withColumn("doc_id", col("doc_id").cast("int"))
    def q133Cur(): Long =
      graft.SparkEntry.queries("q133_ngram_jaccard_prefix")(spark, sfDir).count()
    def q129Cur(): Long =
      graft.SparkEntry.queries("q129_hybrid_rrf")(spark, sfDir).count()
    def q133Prefix08(): Long =
      graft.ml.TextDedup.jaccardPairsPrefixFilter(q31Docs, n = 3,
        threshold = 0.8, dfCap = 50).count()
    def q133Postings08(): Long =
      graft.ml.TextDedup.jaccardPairsPostings(q31Docs, n = 3,
        threshold = 0.8, dfCap = 50).count()
    // hash-order variant: ANY global total order is a correct prefix
    // order — plain array_sort over shingle hashes skips the struct
    // build/sort entirely, trading selectivity (random-order prefix,
    // not rarest-first) for a much cheaper set materialization
    def q133HashOrder08(): Long = {
      val t0 = 0.8
      val sh = graft.ml.TextDedup.shingleKeyTable(q31Docs, 3)
      val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val sets = sh
        .join(dfs.filter(col("df") <= 50).select(col("shingle")),
          Seq("shingle"), "left_semi")
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(col("shingle"))).as("set"),
          count(lit(1)).as("n_sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prefLen = (size(col("set")) -
        ceil(lit(t0) * size(col("set"))).cast("int") + 1)
      val pre = sets.select(col("doc_id"),
        explode(slice(col("set"), lit(1), prefLen)).as("shingle"))
      val cands = pre.as("a")
        .join(pre.as("b"), col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val r = cands
        .join(sets.select(col("doc_id").as("doc_a"), col("set").as("sa"),
          col("n_sh").as("n_a")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("set").as("sb"),
          col("n_sh").as("n_b")), Seq("doc_b"))
        .withColumn("shared", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard",
          round(col("shared") / (col("n_a") + col("n_b") - col("shared")), 4))
        .filter(col("jaccard") >= t0).count()
      sets.unpersist(false); r
    }
    // stage isolates for the sf1 inversion: where does prefix's time go?
    def q133SetsOnly(): Long = {
      val sh = graft.ml.TextDedup.shingleKeyTable(q31Docs, 3)
      val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      sh.join(dfs.filter(col("df") <= 50), Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(transform(
            array_sort(collect_list(struct(col("df"), col("shingle")))),
            s => s.getField("shingle")).as("set"),
          count(lit(1)).as("n_sh"))
        .count()
    }
    def q133CandsOnly(): Long = {
      val sh = graft.ml.TextDedup.shingleKeyTable(q31Docs, 3)
      val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      val sets = sh.join(dfs.filter(col("df") <= 50), Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(transform(
            array_sort(collect_list(struct(col("df"), col("shingle")))),
            s => s.getField("shingle")).as("set"),
          count(lit(1)).as("n_sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val prefLen = (size(col("set")) -
        ceil(lit(0.8) * size(col("set"))).cast("int") + 1)
      val pre = sets.select(col("doc_id"),
        explode(slice(col("set"), lit(1), prefLen)).as("shingle"))
      val r = pre.as("a")
        .join(pre.as("b"), col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct().count()
      sets.unpersist(false); r
    }

    // q131 decomposition (r16 — the VERDICT r15 #1 mandate): the
    // fuzzy-clusters entry costs 5.4× its own q130 subpipeline; these
    // isolates attribute prep / census / block join / verify / collect
    // and A/B the repartition+persist rewrite of blockedCandidates.
    def fuzzyDocs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 14)).as("title"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"))
    def fuzzyBase = fuzzyDocs
      .select(col("blk").cast("string").as("blk"),
        col("doc_id").cast("long").as("id"), col("title").cast("string").as("s"))
      .filter(col("blk").isNotNull && col("id").isNotNull && col("s").isNotNull)
    def q130Cur(): Long = {
      val r = graft.SparkEntry.queries("q130_fuzzy_join")(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }
    def q131Cur(): Long = {
      val r = graft.SparkEntry
        .queries("q131_fuzzy_clusters")(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }
    def q131PrepOnly(): Long = fuzzyBase.count()
    def q131CensusOnly(): Long = fuzzyBase
      .groupBy(col("blk")).agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= 64).count()
    // candidates up to the length prefilter, WITHOUT the levenshtein
    def q131CandsOnly(): Long = {
      val base = fuzzyBase
      val keep = base.join(
        base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= 64).select(col("blk")),
        Seq("blk"), "left_semi")
      val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
      val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        .filter(abs(length(col("s_a")) - length(col("s_b"))) <= 8).count()
    }
    // full verified edge list (matches), consumed by count
    def q131EdgesOnly(): Long = graft.ml.FuzzyJoin.matches(fuzzyDocs,
      "doc_id", "title", col("blk"), maxDist = 8, blockCap = 64).count()
    // the DedupClusters.assign probe path: limit(bound+1).collect()
    def q131EdgesCollect(): Long = graft.ml.FuzzyJoin.matches(fuzzyDocs,
        "doc_id", "title", col("blk"), maxDist = 8, blockCap = 64)
      .select(col("id_a"), col("id_b"))
      .limit((1 << 20) + 1).collect().length.toLong
    // fixed edge pipeline only (repartition, no persist): exchange
    // reuse should cover the census + both join sides in one action
    def q131EdgesFixNoPersist(): Long = {
      val base = fuzzyBase
        .repartition(spark.sparkContext.defaultParallelism, col("blk"))
      val keep = base.join(
        base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= 64).select(col("blk")),
        Seq("blk"), "left_semi")
      val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
      val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
      a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .filter(abs(length(col("s_a")) - length(col("s_b"))) <= 8)
        .select(col("id_a"), col("id_b"),
          levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
        .filter(col("dist") <= 8).count()
    }
    // fixed edge pipeline with the persist (2+-consumers rule)
    def q131EdgesFixPersist(): Long = {
      val base = fuzzyBase
        .repartition(spark.sparkContext.defaultParallelism, col("blk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keep = base.join(
        base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= 64).select(col("blk")),
        Seq("blk"), "left_semi")
      val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
      val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
      val r = a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .filter(abs(length(col("s_a")) - length(col("s_b"))) <= 8)
        .select(col("id_a"), col("id_b"),
          levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
        .filter(col("dist") <= 8).count()
      base.unpersist(false); r
    }
    // candidate rewrite: repartition the single-file prep across
    // cores, persist the multi-consumer base — then run the identical
    // census/semi/self-join/verify chain and the same cluster tail
    def q131FixA(): Long = {
      val base = fuzzyBase
        .repartition(spark.sparkContext.defaultParallelism, col("blk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val keep = base.join(
        base.select(col("blk"), col("id")).distinct()
          .groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= 64).select(col("blk")),
        Seq("blk"), "left_semi")
      val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
      val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
      val edges = a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .filter(abs(length(col("s_a")) - length(col("s_b"))) <= 8)
        .select(col("id_a"), col("id_b"),
          levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
        .filter(col("dist") <= 8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      val r = graft.ml.DedupClusters.assign(
          fuzzyDocs.select(col("doc_id")), edges)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("size"),
          concat_ws(",", array_sort(collect_list(col("doc_id")))).as("members"))
        .filter(col("size") > 1).count()
      base.unpersist(false)
      spark.catalog.clearCache(); r
    }

    // count-filter A/B (r16): q131 via matches WITHOUT the
    // Jokinen-Ukkonen prefilter (the pre-filter-era form) vs the
    // shipped filtered path (q131_cur)
    def q131NoCf(): Long = {
      val edges = graft.ml.FuzzyJoin.blockedCandidates(fuzzyDocs,
          "doc_id", "title", col("blk"), maxDist = 8, blockCap = 64)
        .filter(col("is_match"))
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        .localCheckpoint()
      val r = graft.ml.DedupClusters.assign(
          fuzzyDocs.select(col("doc_id")), edges)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("size"),
          concat_ws(",", array_sort(collect_list(col("doc_id")))).as("members"))
        .filter(col("size") > 1).count()
      spark.catalog.clearCache(); r
    }

    // fixA + localCheckpoint(edges) before assign: one parallel
    // materialization instead of executeTake re-running the verify
    // stage on 1/4/16/32 partitions during the cluster-probe collect
    def q131FixC(): Long = {
      val base = fuzzyBase
        .repartition(spark.sparkContext.defaultParallelism, col("blk"))
      val keep = base.join(
        base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
          .filter(col("bn") <= 64).select(col("blk")),
        Seq("blk"), "left_semi")
      val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
      val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
      val edges = a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .filter(abs(length(col("s_a")) - length(col("s_b"))) <= 8)
        .select(col("id_a"), col("id_b"),
          levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
        .filter(col("dist") <= 8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
        .localCheckpoint()
      val r = graft.ml.DedupClusters.assign(
          fuzzyDocs.select(col("doc_id")), edges)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("size"),
          concat_ws(",", array_sort(collect_list(col("doc_id")))).as("members"))
        .filter(col("size") > 1).count()
      spark.catalog.clearCache(); r
    }

    // shipped-path runner for round-over-round drift attribution
    // (r16 — VERDICT r15 #4): one interleaved session over the
    // suspect queries beats any cross-round single-shot comparison
    def entry(name: String): Long = {
      val r = graft.SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache(); r
    }

    // q51 composition probe (r16): same executeTake scale-up shape as
    // q131 — does localCheckpointing the LSH edge list before
    // DedupClusters.assign win there too?
    def q51Ckpt(): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents")
      val pairs = graft.ml.TextDedup.minhashLshPairs(docs, n = 3, k = 12,
          bands = 4, threshold = 0.3, minAgree = 5)
        .localCheckpoint()
      val r = graft.ml.DedupClusters.assign(docs.select(col("doc_id")), pairs)
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("size"),
          concat_ws(",", array_sort(collect_list(col("doc_id")))).as("members"))
        .filter(col("size") > 1).count()
      spark.catalog.clearCache(); r
    }

    // q137 leg-overlap probe (r19 opt): the shipped
    // blockingRecallProbe now materializes its exact/found legs as
    // concurrent driver futures; this is the serial form (the
    // pre-r19 shape) for interleaved adjudication against q137_cur.
    def q137Serial(): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents").select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 14)).as("title"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"))
      val r = graft.ml.FuzzyJoin.blockingRecallProbe(docs, "doc_id", "title",
          col("blk"), maxDist = 8, isSample = col("doc_id") < 100,
          blockCaps = Seq(3, 64), concurrentLegs = false)
        .orderBy(col("block_cap")).count()
      spark.catalog.clearCache(); r
    }

    // q73 flag-attach probe (r19 opt): the shipped incremental LSH
    // now evaluates a doc_id-only isNew predicate INLINE on the band
    // table; this is the pre-r19 join-attached form for interleaved
    // adjudication against q73_cur.
    def q73JoinFlag(): Long = {
      val r = graft.ml.TextDedup.minhashLshPairsIncrementalImpl(
          graft.Tables.t(spark, sfDir, "documents"),
          isNew = col("doc_id") >= 400, n = 3, k = 12, bands = 4,
          threshold = 0.3, minAgree = 5, forceJoinFlag = true)
        .orderBy(col("doc_a"), col("doc_b")).count()
      spark.catalog.clearCache(); r
    }

    // q77 composition probe (r19 opt): q51/q131/q139 all
    // localCheckpoint the edge list before DedupClusters.assign (the
    // executeTake scale-up re-runs the LSH verify stage per attempt
    // on an un-materialized frame); q77 ships WITHOUT the checkpoint.
    // Same-session A/B against the shipped form.
    def q77Ckpt(): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents")
      val pairs = graft.ml.TextDedup.minhashLshPairs(docs, n = 3, k = 12,
          bands = 4, threshold = 0.3, minAgree = 5)
        .localCheckpoint()
      val scored = docs.select(col("doc_id"),
        round(graft.ml.TextAnalysis.qualityScore(col("text")), 4).as("quality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      val r = graft.ml.DedupClusters.assign(docs.select(col("doc_id")), pairs)
        .join(scored, Seq("doc_id"))
        .withColumn("sz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
        .filter(col("sz") > 1)
        .withColumn("keep", when(row_number().over(w) === 1, 1L).otherwise(0L))
        .select(col("cluster_id"), col("doc_id"), col("quality"), col("keep"))
        .count()
      spark.catalog.clearCache(); r
    }

    // q126 stage isolates (r16 — VERDICT r15 #7): attribute the
    // 1.26 s probe across batch tokenize / merged re-cap census /
    // pair expansion. The fixture split (batch = docs >= 400 = 92% of
    // the corpus at sf0.1) makes the batch tokenize the structural
    // floor — q126_small measures the realistic 4% split.
    def q126Stage(stage: Int): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents")
        .withColumn("doc_id", col("doc_id").cast("int"))
      val idx = graft.ml.NgramIndex.ensure(spark, sfDir,
        docs.filter(col("doc_id") < 400).select(col("doc_id"), col("text")),
        n = 4, dfMax = 64, tag = "pre400")
      val batch = docs.filter(col("doc_id") >= 400)
        .select(col("doc_id"), col("text"))
      val batchLists = graft.ml.TextDedup.shingleKeyTable(batch, 4)
        .groupBy(col("shingle"))
        .agg(array_sort(collect_list(col("doc_id").cast("int"))).as("bdocs"))
      val r = if (stage == 1) batchLists.count()
      else {
        val stored = spark.read.parquet(s"$idx/postings")
        val emptyIds = array().cast(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.IntegerType))
        val merged = stored
          .join(batchLists, Seq("shingle"), "full")
          .withColumn("df_m",
            coalesce(col("df"), lit(0L)) +
              coalesce(size(array_except(col("bdocs"),
                coalesce(col("docs"), emptyIds))).cast("long"), lit(0L)))
          .filter(col("df_m") <= 50)
        if (stage == 2) merged.count()
        else {
          val proj = merged.select(concat(
            transform(coalesce(col("docs"), emptyIds),
              d => struct(d.as("doc_id"), lit(false).as("is_new"))),
            transform(
              array_except(coalesce(col("bdocs"), emptyIds),
                coalesce(col("docs"), emptyIds)),
              d => struct(d.as("doc_id"), lit(true).as("is_new"))))
            .as("docs"))
          if (stage == 3) proj.agg(sum(size(col("docs")))).count()
          else graft.ml.TextDedup
            .containmentPairsIncrementalFromPostings(proj, 0.6).count()
        }
      }
      spark.catalog.clearCache(); r
    }

    // q136 decomposition (r16): the sampled recall monitor runs TWO
    // tokenize passes — the exact side re-keys the corpus via
    // shingleKeyTable (xxhash64) while the LSH side already md5-
    // digested every shingle. q136_fromdig builds the flagged
    // postings from the SHARED digest frame's 63-bit keys instead.
    // q137 side isolates (r16): where does the 30× cost live —
    // the sample×corpus exact side or the loosest-cap found side?
    def q137Side(exact: Boolean): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 14)).as("title"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 2)).as("blk"))
      val base = docs.select(col("blk").cast("string").as("blk"),
          col("doc_id").cast("long").as("id"), col("title").cast("string").as("s"),
          (col("doc_id") < 100).as("is_smp"))
        .filter(col("blk").isNotNull && col("id").isNotNull && col("s").isNotNull)
        .withColumn("cv", graft.ml.FuzzyJoin.letterCounts(col("s")))
        .repartition(spark.sparkContext.defaultParallelism, col("blk"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r = if (exact) {
        val q = base.filter(col("is_smp"))
          .select(col("id").as("qid"), col("s").as("qs"), col("cv").as("qcv"))
        broadcast(q)
          .join(base.select(col("id"), col("s"), col("cv")),
            col("qid") =!= col("id") &&
              abs(length(col("qs")) - length(col("s"))) <= 8)
          .filter(graft.ml.FuzzyJoin.countFilterPasses(col("qcv"), col("cv"), 8))
          .filter(levenshtein(col("qs"), col("s")) <= 8).count()
      } else {
        val census = base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
        val keep = base.join(census.filter(col("bn") <= 64), Seq("blk"))
        val a = keep.select(col("blk"), col("bn"), col("id").as("id_a"),
          col("s").as("s_a"), col("cv").as("cv_a"), col("is_smp").as("smp_a"))
        val b = keep.select(col("blk"), col("id").as("id_b"),
          col("s").as("s_b"), col("cv").as("cv_b"), col("is_smp").as("smp_b"))
        a.join(b, Seq("blk"))
          .filter(col("id_a") < col("id_b"))
          .filter(col("smp_a") || col("smp_b"))
          .filter(abs(length(col("s_a")) - length(col("s_b"))) <= 8)
          .filter(graft.ml.FuzzyJoin.countFilterPasses(col("cv_a"), col("cv_b"), 8))
          .filter(levenshtein(col("s_a"), col("s_b")) <= 8).count()
      }
      base.unpersist(); spark.catalog.clearCache(); r
    }

    def q136Cur(): Long = entry("q136_lsh_recall_sampled")
    def q136ExactOnly(): Long = {
      val docs = graft.Tables.t(spark, sfDir, "documents")
      val r = graft.ml.TextDedup.jaccardPairsIncrementalFromPostings(
        graft.ml.TextDedup.containmentPostings(docs,
          col("doc_id") % 3 === 0, 3, 1000000), 0.3).count()
      spark.catalog.clearCache(); r
    }
    // q136_fromdig (r16, DELETED variant — the loser's record): building
    // the exact side's flagged postings from the SHARED md5 digest
    // frame (one tokenize pass instead of two) measured 2.43 vs 2.57 s
    // min interleaved — within noise, med WORSE. The exact side's cost
    // is the uncapped postings expansion + struct collect_list
    // shuffles, not tokenize; the shared-machinery shipped form stays.

    val (q116Full, q116ProbeOnly, q116ExactOnly) = q116Variants(spark, sfDir)
    val (q74Cur, q74NoRepart, q74MapScan, q74Md5Only, q74QualOnly,
      q74TtrOnly, q74RegexOnly, q74RegexNoRepart, q74StopOnly,
      q74PunctOnly, q74PunctOldForm, q74Split1m, q74Split256k,
      q74PartsProbe, q74PunctNoFilter, q74PunctFilterSplit,
      q74PunctFilterAgg, q74PunctCheapFilterAgg, q74PunctFilterNoCodegen,
      q74BareFilter, q74BareFilterStop, q74AggStop) =
      q74Variants(spark, sfDir)

    Seq(
      "q117_cur" -> (() => q117Cur()),
      "q117_scan_only" -> (() => q117ScanOnly()),
      "q117_tok_only" -> (() => q117TokOnly()),
      "q117_md5_only" -> (() => q117Md5Only()),
      "q117_fold_nosort" -> (() => q117FoldNoSort()),
      "q117_litarr" -> (() => q117LitArr()),
      "q117_arith" -> (() => q117Arith()),
      "q117_oneref" -> (() => q117OneRef()),
      "q117_norep" -> (() => q117NoRep()),
      "q115_cur" -> (() => q115Cur()),
      "q115_repart" -> (() => q115Repart()),
      "q115_rest" -> (() => q115Rest()),
      "q115_scan_only" -> (() => q115ScanOnly()),
      "q115_md5_only" -> (() => q115Md5Only()),
      "q115_tf_only" -> (() => q115TfOnly()),
      "q115_gram_tf" -> (() => q115GramTf()),
      "q54_cur" -> (() => q54Cur()),
      "q54_copy" -> (() => ivfParts(false)),
      "q54_bq" -> (() => ivfParts(true)),
      "q48_cur" -> (() => q48Cur()),
      "q48_scan_only" -> (() => q48ScanOnly()),
      "q48_lm_only" -> (() => q48LmOnly()),
      "q48_tf" -> (() => q48Tf()),
      "q84_cur" -> (() => q84Cur()),
      "q84_scan_only" -> (() => q84ScanOnly()),
      "q84_explode_only" -> (() => q84ExplodeOnly()),
      "q110_cur" -> (() => q110Cur()),
      "q110_scan_only" -> (() => q110ScanOnly()),
      "q110_thr_only" -> (() => q110ThrOnly()),
      "q04_cur" -> (() => q04Cur()),
      "q04_lijoin" -> (() => q04LiJoin()),
      "q04_scans" -> (() => q04Scans()),
      "q06_cur" -> (() => q06Cur()),
      "q06_anti_only" -> (() => q06AntiOnly()),
      "q06_shuffle_hash" -> (() => q06ShuffleHash()),
      "q06_build_distinct" -> (() => q06BuildDistinct()),
      "q102_cur" -> (() => q102Cur()),
      "q102_plan_only" -> (() => q102PlanOnly()),
      "q112_cur" -> (() => q112Cur()),
      "q112_cents_only" -> (() => q112CentsOnly()),
      "q112_plan_only" -> (() => q112PlanOnly()),
      "q102_scan_only" -> (() => q102ScanOnly()),
      "q102_scan_join" -> (() => q102ScanJoin()),
      "q81_cur" -> (() => q81Cur()),
      "q81_oneshuffle" -> (() => q81OneShuffle()),
      "q81_fold" -> (() => q81Fold()),
      "q81_fold_sh" -> (() => q81FoldSh()),
      "q101_cur" -> (() => q101Cur()),
      "q101_struct" -> (() => q101Struct()),
      "q101_postings" -> (() => q101Postings()),
      "q31_cur" -> (() => q31Cur()),
      "q31_keys" -> (() => q31Keys()),
      "q31_postings" -> (() => q31Postings()),
      "q31_entry" -> (() => q31Entry()),
      "q125_entry" -> (() => q125Entry()),
      "q101_entry" -> (() => q101Entry()),
      "q126_entry" -> (() => q126Entry()),
      "q126_small" -> (() => q126Small()),
      "q126_small_adhoc" -> (() => q126SmallAdhoc()),
      "q95_cur" -> (() => q95Cur()),
      "q95_pairagg" -> (() => q95PairAgg()),
      "q100_cur" -> (() => q100Cur()),
      "q100_oneshuffle" -> (() => q100OneShuffle()),
      "q92_cur" -> (() => q92Cur()),
      "q92_nohint" -> (() => q92Body(false)),
      "q92_sh" -> (() => q92Sh()),
      "q80_joinback" -> (() => q80JoinBack()),
      "q92_fold" -> (() => q92Fold()),
      "q90_cur" -> (() => q90Cur()),
      "q90_scan" -> (() => q90Scan()),
      "q90_supjoin" -> (() => q90Parts(1, false)),
      "q90_ordjoin" -> (() => q90Parts(2, false)),
      "q90_full" -> (() => q90Parts(3, false)),
      "q90_custfirst" -> (() => q90Parts(3, true)),
      "q90_sh" -> (() => q90Parts(4, false)),
      "q90_custfirst_sh" -> (() => q90Parts(4, true)),
      "q80_cur" -> (() => q80Cur()),
      "q80_aggonly" -> (() => q80AggOnly()),
      "q80_onescan" -> (() => q80OneScan()),
      "q80_window" -> (() => q80Window()),
      "q72_cur" -> (() => q72Cur()),
      "q72_aggonly" -> (() => q72AggOnly()),
      "q87_cur" -> (() => q87Cur()),
      "q87_aggonly" -> (() => q87AggOnly()),
      "q87_repartagg" -> (() => q87RepartAgg()),
      "q37_cur" -> (() => q37Cur()),
      "q37_prep_only" -> (() => q37PrepOnly()),
      "q37_persist" -> (() => q37Persist()),
      "q37_bcast" -> (() => q37Bcast()),
      "q37_onebuild" -> (() => q37OneBuild()),
      "q37_nowin" -> (() => q37NoWin()),
      "q85_cur" -> (() => q85Cur()),
      "q85_centroid_only" -> (() => q85CentroidOnly()),
      "q85_litmap" -> (() => q85Litmap()),
      "bi_write" -> (() => biWrite()),
      "bi_probe" -> (() => biProbe()),
      "q96_join" -> (() => q96Join()),
      "q96_collect" -> (() => q96Collect()),
      "q89_old" -> (() => q89Old()),
      "q89_new" -> (() => q89New()),
      "q89_collect" -> (() => q89Collect()),
      "q89_aggonly" -> (() => q89AggOnly()),
      "q89_hashagg" -> (() => q89HashAgg()),
      "q89_cur" -> (() => entry("q89_source_boilerplate")),
      "q89_gramagg" -> (() => q89GramAgg()),
      "q32_current" -> (() => q32Current()),
      "q32_expand" -> (() => q32Expand()),
      "q32_digests" -> (() => q32Digests()),
      "q32_sigs" -> (() => q32Sigs()),
      "q32_joinback" -> (() => q32JoinBack()),
      "q82_join" -> (() => tfidfJoin()),
      "q82_window" -> (() => tfidfWindow()),
      "q82_docpart" -> (() => tfidfDocPart()),
      "q83_old" -> (() => bm25Old()),
      "q83_new" -> (() => bm25New()),
      "q83_new2" -> (() => bm25New2()),
      "q83_new3" -> (() => bm25New3()),
      "bpe_train10" -> (() => bpeTrain10()),
      "cc_powerlaw" -> (() => ccPowerlaw()),
      "cc_chain" -> (() => ccChain()),
      "q96_nojoin" -> (() => q96NoJoin()),
      "q67_join" -> (() => q67Join()),
      "q67_preagg" -> (() => q67PreAgg()),
      "q15_except" -> (() => q15Except()),
      "q15_onescan" -> (() => q15OneScan()),
      "q53_cur" -> (() => q53Cur()),
      "q53_bcast" -> (() => q53Bcast()),
      "q53_salted" -> (() => q53Salted()),
      "q53_stats" -> (() => q53Stats()),
      "q74_cur" -> (() => q74Cur()),
      "q74_norepart" -> (() => q74NoRepart()),
      "q74_mapscan" -> (() => q74MapScan()),
      "q74_md5only" -> (() => q74Md5Only()),
      "q74_qualonly" -> (() => q74QualOnly()),
      "q74_ttronly" -> (() => q74TtrOnly()),
      "q74_regexonly" -> (() => q74RegexOnly()),
      "q74_regexnorepart" -> (() => q74RegexNoRepart()),
      "q74_stoponly" -> (() => q74StopOnly()),
      "q74_punctonly" -> (() => q74PunctOnly()),
      "q74_punctoldform" -> (() => q74PunctOldForm()),
      "q74_split1m" -> (() => q74Split1m()),
      "q74_split256k" -> (() => q74Split256k()),
      "q74_partsprobe" -> (() => q74PartsProbe()),
      "q74_punctnofilter" -> (() => q74PunctNoFilter()),
      "q74_punctfiltersplit" -> (() => q74PunctFilterSplit()),
      "q74_punctfilteragg" -> (() => q74PunctFilterAgg()),
      "q74_punctcheapfilteragg" -> (() => q74PunctCheapFilterAgg()),
      "q74_punctfilternocodegen" -> (() => q74PunctFilterNoCodegen()),
      "q74_barefilter" -> (() => q74BareFilter()),
      "q74_barefilterstop" -> (() => q74BareFilterStop()),
      "q74_aggstop" -> (() => q74AggStop()),
      "q116_full" -> (() => q116Full()),
      "q116_probe_only" -> (() => q116ProbeOnly()),
      "q116_exact_only" -> (() => q116ExactOnly()),
      "q133_cur" -> (() => q133Cur()),
      "q129_cur" -> (() => q129Cur()),
      "q133_prefix08" -> (() => q133Prefix08()),
      "q133_postings08" -> (() => q133Postings08()),
      "q133_sets_only" -> (() => q133SetsOnly()),
      "q133_cands_only" -> (() => q133CandsOnly()),
      "q133_hashorder08" -> (() => q133HashOrder08()),
      "q130_cur" -> (() => q130Cur()),
      "q131_cur" -> (() => q131Cur()),
      "q131_prep_only" -> (() => q131PrepOnly()),
      "q131_census_only" -> (() => q131CensusOnly()),
      "q131_cands_only" -> (() => q131CandsOnly()),
      "q131_edges_only" -> (() => q131EdgesOnly()),
      "q131_edges_collect" -> (() => q131EdgesCollect()),
      "q131_edges_fixnp" -> (() => q131EdgesFixNoPersist()),
      "q131_edges_fixp" -> (() => q131EdgesFixPersist()),
      "q131_fixa" -> (() => q131FixA()),
      "q131_fixc" -> (() => q131FixC()),
      "q131_nocf" -> (() => q131NoCf()),
      "q51_cur" -> (() => entry("q51_dedup_clusters")),
      "q51_ckpt" -> (() => q51Ckpt()),
      "q77_cur" -> (() => entry("q77_canonical_selection")),
      "q77_ckpt" -> (() => q77Ckpt()),
      "q73_joinflag" -> (() => q73JoinFlag()),
      "q65_cur" -> (() => entry("q65_shipping_priority")),
      "q66_cur" -> (() => entry("q66_promo_share")),
      "q67_cur" -> (() => entry("q67_cust_order_distribution")),
      "q70_cur" -> (() => entry("q70_local_supplier_volume")),
      "q136_cur" -> (() => q136Cur()),
      "q137_exact_side" -> (() => q137Side(true)),
      "q137_found_side" -> (() => q137Side(false)),
      "q136_exact_only" -> (() => q136ExactOnly()),
      "q137_cur" -> (() => entry("q137_fuzzy_block_recall")),
      "q137_serial" -> (() => q137Serial()),
      "q138_cur" -> (() => entry("q138_bigram_backoff")),
      "q139_cur" -> (() => entry("q139_cluster_split")),
      "q146_cur" -> (() => entry("q146_containment_indexed_full")),
      "q97_cur" -> (() => entry("q97_containment_pairs")),
      "q141_cur" -> (() => entry("q141_dist_drift")),
      "q142_cur" -> (() => entry("q142_snapshot_churn")),
      "q143_cur" -> (() => entry("q143_heavy_hitters")),
      "q144_cur" -> (() => entry("q144_source_calibration")),
      // r17: the remaining r16 monitor-family shipped paths (VERDICT
      // r16 #8 — envelope pins) + the two movers' adjudication reps
      // (#1: q72_cur above, q73_cur here) + the new composed forget
      "q73_cur" -> (() => entry("q73_incremental_dedup")),
      "q140_cur" -> (() => entry("q140_batch_novelty")),
      "q145_cur" -> (() => entry("q145_embedding_drift")),
      "q150_cur" -> (() => entry("q150_forget_everywhere")),
      // q99 r17 rewrite adjudication: indexed pairsAll (shipped, _cur)
      // vs the from-scratch chain it replaced
      "q99_cur" -> (() => entry("q99_source_dup_rate")),
      "q99_chain" -> (() => {
        val docs = graft.Tables.t(spark, sfDir, "documents")
        val src = docs.select(col("doc_id"), col("source"))
        graft.ml.TextDedup.minhashLshPairs(docs, n = 3, k = 12,
            bands = 4, threshold = 0.3, minAgree = 5)
          .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
            Seq("doc_a"))
          .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
            Seq("doc_b"))
          .groupBy(least(col("sa"), col("sb")).as("src_a"),
            greatest(col("sa"), col("sb")).as("src_b"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("src_a"), col("src_b")).count()
      }),
      // q150 stage isolates (all read the SAME dirs/tables the
      // shipped query leaves behind — run q150_cur first to seed)
      "q150_forget_only" -> (() => {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        val table = "g_q150_band_" + Integer.toHexString(sfDir.hashCode)
        graft.ml.CorpusPipeline.forgetWithStore(spark,
          graft.ml.CorpusPipeline.IndexMaintenance(table, n = 3, k = 12,
            bands = 4, threshold = 0.3),
          graft.ml.CorpusPipeline.CorpusStore(
            s"${System.getProperty("java.io.tmpdir")}/graft_q150/$h/store",
            "source"),
          graft.Tables.t(spark, sfDir, "documents")
            .filter(col("doc_id") % 13 === 0).select(col("doc_id"))).size.toLong
      }),
      "q150_store_agg" -> (() => {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
        spark.read.parquet(
            s"${System.getProperty("java.io.tmpdir")}/graft_q150/$h/store")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("a"), sum(col("doc_id")).as("b")).count()
      }),
      "q150_probe_only" -> (() => {
        val table = "g_q150_band_" + Integer.toHexString(sfDir.hashCode)
        graft.ml.BandIndex.probe(spark, table,
          graft.Tables.t(spark, sfDir, "documents")
            .filter(col("doc_id") % 11 === 7 && col("doc_id") % 13 =!= 0)
            .select(col("doc_id"), col("text")),
          n = 3, k = 12, bands = 4, threshold = 0.3).count()
      }),
      "q144_win" -> (() => graft.ml.Calibrate.keepByPercentile(
        graft.Tables.t(spark, sfDir, "documents"), "source", "n_chars",
        "doc_id", 2, 5, ascending = false, plan = "window")
        .orderBy(col("doc_id")).count()),
      "q144_dist" -> (() => graft.ml.Calibrate.keepByPercentile(
        graft.Tables.t(spark, sfDir, "documents"), "source", "n_chars",
        "doc_id", 2, 5, ascending = false, plan = "distributed")
        .orderBy(col("doc_id")).count()),
      "q126_batchlists" -> (() => q126Stage(1)),
      "q126_merge" -> (() => q126Stage(2)),
      "q126_proj" -> (() => q126Stage(3)),
      "q126_expand" -> (() => q126Stage(4)))
  }

  /** q74 decomposition (r12): isolate repartition / qualityScore /
    * md5-bucket / filter contributions at a chosen SF. */
  private def q74Variants(spark: SparkSession, sfDir: String) = {
    import org.apache.spark.sql.functions._
    def docs = graft.Tables.t(spark, sfDir, "documents")
    def q4 = round(graft.ml.TextAnalysis.qualityScore(col("text")), 4)
    def bucket = (conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("long") % 10000)
    def cur(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), q4.as("quality"), bucket.as("bucket"))
      .filter(col("bucket") < col("quality") * 10000)
      .orderBy(col("doc_id")).count()
    def noRepart(): Long = docs
      .select(col("doc_id"), q4.as("quality"), bucket.as("bucket"))
      .filter(col("bucket") < col("quality") * 10000)
      .orderBy(col("doc_id")).count()
    def mapScan(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), q4.as("quality"), bucket.as("bucket"))
      .filter(col("bucket") < col("quality") * 10000).count()
    def md5Only(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), bucket.as("bucket"))
      .filter(col("bucket") < 5000).count()
    def qualOnly(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), q4.as("quality"))
      .filter(col("quality") > 0.5).count()
    def ttrOnly(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        (size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " "))).as("ttr"))
      .filter(col("ttr") > 0.5).count()
    def regexOnly(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        (graft.ml.TextAnalysis.phraseHits(col("text"),
          Seq("the", "a", "of", "is", "and")) +
          regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))).as("h"))
      .filter(col("h") >= 0).count()
    def regexNoRepart(): Long = docs
      .select(col("doc_id"),
        (graft.ml.TextAnalysis.phraseHits(col("text"),
          Seq("the", "a", "of", "is", "and")) +
          regexp_count(col("text"), lit("[^a-zA-Z0-9 ]"))).as("h"))
      .filter(col("h") >= 0).count()
    def stopOnly(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), graft.ml.TextAnalysis.phraseHits(col("text"),
        Seq("the", "a", "of", "is", "and")).as("h"))
      .filter(col("h") >= 0).count()
    def punctOnly(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("h"))
      .filter(col("h") >= 0).count()
    def punctOldForm(): Long = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0))).as("h"))
      .filter(col("h") >= 0).count()
    def withSplit(bytes: Long)(f: () => Long): Long = {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", bytes.toString)
      try f() finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
    def curSplit1m(): Long = withSplit(1L << 20)(cur _)
    def partsProbe(): Long = withSplit(1L << 20)(() =>
      docs.select(col("doc_id"),
          regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("h"))
        .filter(col("h") >= 0).rdd.getNumPartitions.toLong)
    def punctNoFilter(): Long = withSplit(1L << 20)(() =>
      docs.select(regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("h"))
        .agg(sum(col("h"))).count())
    def punctFilterSplit(): Long = withSplit(1L << 20) { () =>
      docs.select(col("doc_id"),
          regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("h"))
        .filter(col("h") >= 0).count()
    }
    def punctFilterAgg(): Long = withSplit(1L << 20) { () =>
      docs.select(col("doc_id"),
          regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("h"))
        .filter(col("h") >= 0).agg(sum(col("h"))).count()
    }
    def punctCheapFilterAgg(): Long = withSplit(1L << 20) { () =>
      docs.select(col("doc_id"),
          regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("h"))
        .filter(col("doc_id") >= 0).agg(sum(col("h"))).count()
    }
    def punctBareFilter(): Long = withSplit(1L << 20)(() =>
      docs.filter(
        regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")) >= 0).count())
    def punctBareFilterStop(): Long = withSplit(1L << 20)(() =>
      docs.filter(
        regexp_count(col("text"), lit("\\b(the|a|of|is|and)\\b")) >= 0).count())
    def punctAggStop(): Long = withSplit(1L << 20)(() =>
      docs.select(regexp_count(col("text"),
          lit("\\b(the|a|of|is|and)\\b")).as("h"))
        .agg(sum(col("h"))).count())
    def punctFilterNoCodegen(): Long = withSplit(1L << 20) { () =>
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try docs.select(col("doc_id"),
          regexp_count(col("text"), lit("[^a-zA-Z0-9 ]")).as("h"))
        .filter(col("h") >= 0).count()
      finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
    def curSplit256k(): Long = withSplit(256L << 10)(cur _)
    (cur _, noRepart _, mapScan _, md5Only _, qualOnly _, ttrOnly _,
      regexOnly _, regexNoRepart _, stopOnly _, punctOnly _, punctOldForm _,
      curSplit1m _, curSplit256k _, partsProbe _, punctNoFilter _,
      punctFilterSplit _, punctFilterAgg _, punctCheapFilterAgg _,
      punctFilterNoCodegen _, punctBareFilter _, punctBareFilterStop _,
      punctAggStop _)
  }

  /** q116 decomposition (r12 pin): recallProbe = stored-index probe
    * (approx side) + by-contract exact brute-force pass + the
    * hits-join/agg. The exact pass is expected to dominate — it is
    * sample×corpus BY CONTRACT (monitoring cadence, never serving) —
    * but the pin discipline wants that measured, not asserted. Index
    * built once per session (the q112 config) and probed warm, like
    * the shipping query's build-once memo. */
  private def q116Variants(spark: SparkSession, sfDir: String) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val table = "g_ab_q116_ivf"
    def index(): String = {
      if (!spark.catalog.tableExists(table)) {
        for (t0 <- Seq(table, graft.ml.IvfIndex.centroidsTable(table),
            graft.ml.IvfIndex.statsTable(table)))
          graft.store.Bucketing.dropWithDir(spark, t0)
        graft.ml.IvfIndex.write(graft.Tables.t(spark, sfDir, "embeddings"),
          table, cells = 8, iters = 0, buckets = 4)
      }
      table
    }
    def queries = graft.Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 10)
    def full(): Long =
      graft.ml.IvfIndex.recallProbe(spark, index(), queries, k = 3, nprobe = 2)
        .count()
    def probeOnly(): Long =
      graft.ml.IvfIndex.probe(spark, index(), queries, k = 3, nprobe = 2)
        .count()
    // the exact side of recallProbe, verbatim (float payload mode)
    def exactOnly(): Long = {
      val cands = spark.table(index())
        .select(col("vec_id").as("cand_id"), col("v").as("cv"),
          col("nrm").as("cn"))
      val q = graft.ml.Similarity.prepared(queries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val wr = Window.partitionBy(col("query_id"))
        .orderBy(round(col("cos"), 6).desc, col("cand_id"))
      broadcast(q).crossJoin(cands)
        .filter(col("query_id") =!= col("cand_id"))
        .withColumn("cos",
          graft.ml.Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .withColumn("rank", row_number().over(wr))
        .filter(col("rank") <= 3)
        .count()
    }
    (full _, probeOnly _, exactOnly _)
  }

  def time(f: () => Long): Double = {
    val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val re = if (args.length > 1) args(1) else ".*"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vs = variants(spark, sfDir).filter(_._1.matches(re))
    // one untimed warmup each (codegen, scan cache)
    vs.foreach { case (_, f) => f(); spark.catalog.clearCache() }
    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, f) <- vs) {
      times(name) = times(name) :+ time(f)
      spark.catalog.clearCache()
    }
    val parts = vs.map { case (name, _) =>
      val ts = times(name).sorted
      f""""$name":{"min":${ts.head}%.4f,"med":${ts(ts.size / 2)}%.4f}"""
    }
    println(s"""{"sf":"$sfDir","reps":$reps,${parts.mkString(",")}}""")
    spark.stop()
  }
}
