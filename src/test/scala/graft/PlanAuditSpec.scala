package graft

/** Plan-shape regression gate: every SparkEntry query's physical plan
  * is audited for scale-hostile constructs. Catches a class of bug the
  * row-level oracle cannot: a query that returns right answers through
  * a plan that would melt at 100 TB (accidental cartesian product, an
  * unintended global window, a lost broadcast).
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // q10 is the deliberate parity copy of the reference's global
  // ROW_NUMBER view (SURVEY §7.4 risk 1) — the only sanctioned
  // global-window query.
  private val globalWindowAllowed = Set("q10_run_serial")

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.sparkPlan.toString()
    }

  test("no unconditioned cartesian product anywhere") {
    val offenders = plans.filter(_._2.contains("CartesianProduct")).keys
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("global (unpartitioned) windows only where sanctioned") {
    // An unpartitioned Window sorts the world into one partition; its
    // plan signature is a Window node whose partition spec is empty —
    // Exchange SinglePartition feeding a Window/WindowGroupLimit.
    val offenders = plans.filter { case (name, p) =>
      !globalWindowAllowed.contains(name) &&
        p.linesIterator.exists(l =>
          l.contains("Exchange SinglePartition") &&
            plans(name).contains("Window"))
    }.keys.filterNot(globalWindowAllowed)
    assert(offenders.isEmpty,
      s"unsanctioned global windows in: ${offenders.mkString(", ")}")
  }

  test("dimension joins broadcast in the flagship join chain") {
    val p = plans("q04_region_revenue")
    // all three dims (customer, nation, region) must be broadcast
    // (sparkPlan is pre-EnsureRequirements, so count join nodes, not
    // the exchange nodes inserted later)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2000))
  }

  test("filter pushdown reaches the parquet scan where expected") {
    assert(plans("q01_pricing_summary").contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(plans("q25_json_extract").contains("PushedFilters"))
  }

  test("non-equi joins are broadcast nested-loop, not shuffled BNL") {
    val p = plans("q41_range_join")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("TPC-H q65: selective dim broadcasts; both date filters pushed") {
    val p = plans("q65_shipping_priority")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // both scans carry their RANGE predicate — IsNotNull alone is not
    // enough (it would still be pushed if the range pushdown broke)
    assert(p.contains("LessThan(o_orderdate"), p.take(3000))
    assert(p.contains("GreaterThan(l_shipdate"), p.take(3000))
  }

  test("TPC-H q70 snowflake: every dim side broadcast, date range pushed to orders scan") {
    val p = plans("q70_local_supplier_volume")
    // region→nation (inside the supplier build), supplier, customer:
    // the fact table must meet only broadcast joins before its rollup
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), p.take(3000))
    assert(p.contains("LessThan(o_orderdate"), p.take(3000))
  }

  test("TPC-H q72 single-pass: big-order aggregate reused as total_qty, customer broadcast") {
    val p = plans("q72_large_volume_cust")
    assert(p.contains("BroadcastHashJoin"), p.take(3000)) // customer dim
    // r6 rewrite: the >300-qty aggregate IS the final sum — lineitem
    // is scanned exactly once (the old classic-Q18 plan rejoined it)
    assert(p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("lineitem")) === 1, p.take(3000))
  }

  test("q83 BM25: query terms filter the corpus via broadcast joins, never a shuffle join") {
    val p = plans("q83_bm25_search")
    // both qterms joins (left-semi early filter + query_id attach)
    // must be broadcast — the corpus side streams, the bounded query
    // vocabulary builds; no join in this plan may shuffle-sort
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("q85 outliers: litmap scoring plan has NO join and no agg exchange") {
    // r8 litmap form: the centroids collected once (labels × dims,
    // bounded) become map literals, so the per-call scoring plan is a
    // scan + project — the centroid aggregation's exchanges and the
    // broadcast attach are gone entirely (the old pin asserted the
    // BroadcastHashJoin form; AbBench min 0.61→0.36 for the switch)
    val p = plans("q85_embedding_outliers")
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("HashAggregate"), p.take(3000))
  }

  test("q86 churn: NOT EXISTS compiles to anti join; order-date filter pushed to the scan") {
    val p = plans("q86_churned_rich_customers")
    assert(p.contains("LeftAnti"), p.take(3000))
    assert(p.linesIterator.exists(l =>
      l.contains("orders.parquet") && l.contains("o_orderdate")
        && l.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")),
      p.take(4000))
  }

  test("q87 concentration: the per-part aggregate's shuffle is computed once and reused") {
    val df = SparkEntry.queries("q87_part_revenue_concentration")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    // the scalar total re-aggregates the SAME partial-agg exchange,
    // not the fact — AQE must stitch a ReusedExchange
    assert(p.contains("ReusedExchange"), p.take(4000))
  }

  // Customer is the second-largest TPC-H relation: a forced broadcast()
  // hint on it would override AQE's size check and OOM an executor at
  // the 100 TB target, so q65/q70/q71/q72 carry NO hint on any
  // customer-sized side. This test proves the perf story is unchanged
  // where broadcasting IS safe: at sf0.1 the executed (AQE-final) plan
  // must still join customer via BroadcastHashJoin, chosen by measured
  // size rather than by decree.
  test("unhinted customer dims still broadcast at sf0.1 (AQE size check)") {
    val sf01 = "/root/testdata/sf0.1"
    for (q <- Seq("q65_shipping_priority", "q70_local_supplier_volume",
        "q71_returned_items", "q72_large_volume_cust")) {
      val df = SparkEntry.queries(q)(spark, sf01)
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("c_custkey")),
        s"$q: customer join not broadcast in AQE-final plan:\n${p.take(4000)}")
    }
  }

  test("TPC-H q79/q81: EXISTS compiles to semi join; sole-late is pure aggregation — no pair expansion") {
    val p79 = plans("q79_late_order_priority")
    assert(p79.contains("LeftSemi"), p79.take(3000))
    // the lateness residual must ride the semi join, not a post-join filter
    assert(!p79.contains("CartesianProduct"))
    // r7 rewrite: the EXISTS/NOT-EXISTS pair is decorrelated into
    // per-order counts — the plan must carry NO semi/anti probe of the
    // fact, no persist, and only the supplier name lookup as a
    // broadcast join
    val p81 = plans("q81_sole_late_supplier")
    assert(!p81.contains("LeftSemi") && !p81.contains("LeftAnti"), p81.take(3000))
    assert(!p81.contains("CartesianProduct"))
    assert(p81.contains("HashAggregate"), p81.take(3000))
    assert(p81.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("s_suppkey")), p81.take(3000))
    // r12 fold: the order-date attach is a fact⋈fact SHUFFLE-HASH
    // join (no SMJ sorts, no fact-side broadcast) feeding both aggs
    assert(p81.linesIterator.exists(l =>
      l.contains("ShuffledHashJoin") && l.contains("o_orderkey")), p81.take(3000))
    assert(!p81.contains("SortMergeJoin"), p81.take(3000))
  }

  test("q76 span dedup: consumers read the persisted token table, no doc-pair join") {
    val p = plans("q76_span_dedup")
    // every branch (gram count, probe, reassembly) reads the cached
    // token table, not a fresh parquet scan (each InMemoryTableScan
    // PRINTS its build subtree, so FileScan occurrences can't be
    // counted textually — cache-read occurrences can)
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3, p.take(3000))
    assert(!p.contains("CartesianProduct"))
    // gram df count is a partial-aggregated groupBy, not a window sort
    assert(p.contains("HashAggregate"), p.take(3000))
  }

  test("q90/q91: two-sided nation correlation keeps every bounded dim broadcast") {
    val p90 = plans("q90_nation_trade")
    assert("BroadcastHashJoin".r.findAllIn(p90).size >= 2, p90.take(3000))
    // ship-date range reaches the lineitem scan
    assert(p90.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")), p90.take(3000))
    val p91 = plans("q91_market_share")
    // numerator+denominator in ONE aggregate: a single pair of
    // HashAggregates (partial+final), not two scans of the join tree
    assert("HashAggregate".r.findAllIn(p91).size <= 2, p91.take(3000))
  }

  test("q90/q92 orders attach: stats-driven shape pick (Tables.attachSide)") {
    // dim regime (sf0.001, default threshold): the attach side is
    // under the broadcast threshold — plain broadcast, no fact sort
    for (q <- Seq("q90_nation_trade", "q92_product_profit")) {
      val p = plans(q)
      assert(!p.contains("SortMergeJoin"), s"$q: ${p.take(3000)}")
      assert(p.linesIterator.exists(l =>
        l.contains("BroadcastHashJoin") && l.contains("o_orderkey")),
        s"$q: ${p.take(3000)}")
    }
    // fact regime (threshold forced off): attachSide must pin
    // shuffle_hash — both sides exchanged, no SMJ sorts, and never an
    // AQE broadcast of the fact-derived probe side
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (q <- Seq("q90_nation_trade", "q92_product_profit")) {
        val p = SparkEntry.queries(q)(spark, sf)
          .queryExecution.sparkPlan.toString()
        // (other, unhinted dim joins may degrade to SMJ under the
        // forced-off threshold — only the orders attach is pinned)
        assert(p.linesIterator.exists(l =>
          l.contains("ShuffledHashJoin") && l.contains("o_orderkey")),
          s"$q: ${p.take(3000)}")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("q80 small-qty revenue: one fact scan, window avg, no join-back") {
    val p = plans("q80_small_qty_revenue")
    // the agg-join-back form scanned lineitem twice and joined; the
    // window form scans once and has no join at all
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
  }

  test("q93 disjunctive parts: brand/size residual pushed to the part scan") {
    val p = plans("q93_disjunctive_parts")
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(p_brand")), p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q95 cheapest supplier: decorrelated to a partkey window, no self-join") {
    val p = plans("q95_cheapest_supplier")
    // one Window partitioned by l_partkey; the correlated-subquery
    // form would show a second lineitem join instead
    assert(p.contains("Window"), p.take(3000))
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("s_suppkey")), p.take(3000))
    // the FACT is scanned once (the self-join form would read it
    // twice); the r9 pair-agg rewrite deliberately reads the tiny
    // supplier/nation/region dims twice — once as the semi key probe,
    // once as the post-filter attribute attach — which is free at any
    // scale, so only the lineitem scan count is pinned
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("lineitem")) == 1, p.take(3000))
    // the fact-side probe is a semi join (no row-width growth before
    // the pair agg)
    assert(p.contains("LeftSemi"), p.take(3000))
  }

  test("q98 epoch shuffle: pure per-row batch assignment — no join, no window") {
    val p = plans("q98_epoch_shuffle")
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("HashAggregate"), p.take(3000))
  }

  test("q100 excess suppliers: partkey window, part filter pushed, no cross product") {
    val p = plans("q100_excess_part_suppliers")
    assert(p.contains("Window"), p.take(3000))
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("p_name")), p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q108 temperature mix: acceptance is map-only over the corpus scan") {
    val p = plans("q108_temperature_mix")
    // the corpus attaches group rates via BROADCAST joins only — a
    // hash-shuffle join here would mean the whole corpus moves for a
    // group-cardinality lookup
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty, p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
    // the main scan carries (doc_id, lang); the group-count agg and
    // the 1-row stats branch each read a lang-only column-pruned scan
    // — three scans total, only one of them row-wide
    assert(p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents")) <= 3, p.take(3000))
    assert(p.contains("ReadSchema: struct<lang:string>"), p.take(3000))
  }

  test("q96 novelty: gram table persisted once, read by both consumers") {
    val p = plans("q96_ngram_novelty")
    assert("InMemoryTableScan".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q110 curriculum: assignment is JOIN-FREE (literal thresholds, not a crossJoin)") {
    // the r10 design point: decile thresholds are driver-side literals
    // from a bounded histogram — if a join ever reappears in the
    // assignment pass, the bounded-collect contract regressed
    val p = plans("q110_curriculum")
    assert(!p.contains("Join"), p.take(3000))
  }

  test("q111 quantization: pure per-row map — no join, no aggregation") {
    val p = plans("q111_embedding_quantize")
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate") &&
      !p.contains("ObjectHashAggregate"), p.take(3000))
  }

  test("q115 dsir: scoring plan is JOIN-FREE (LM inlined as literals)") {
    // the bounded stats collect happens at frame-construction time;
    // the plan the engine serves per call is scan → explode →
    // literal-array lookup → per-doc agg — no join anywhere, so there
    // is nothing to mis-broadcast or shuffle-build at any corpus size
    val p = plans("q115_dsir_selection")
    assert(!p.contains("Join"), p.take(3000))
  }

  test("q117 classifier score: map-only fold + TakeOrdered — no join, no shuffle agg, no full sort") {
    // the scoring expression is a per-row fold over literal
    // coefficients; the only ordering is the top-100, which must plan
    // as TakeOrderedAndProject (a per-partition heap + tiny final
    // merge), never a global Sort
    val p = plans("q117_classifier_score")
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate") &&
      !p.contains("ObjectHashAggregate"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // the md5 bucket transform must be evaluated exactly once: a
    // pushed-down filter(n_toks > 0) re-materializes the whole
    // transform inside the Filter below the repartition (measured 2x
    // wall, with the duplicate pass on the single-partition scan) —
    // the empty-doc filter must ride the md5-FREE tokenizer instead
    assert(p.sliding(4).count(_ == "md5(") == 1,
      "md5 transform evaluated more than once:\n" + p.take(3000))
  }

  test("q114 semantic dedup: candidate joins keyed on cell_id, assignment join-free") {
    // the centroid set is a literal array (no join to assign);
    // the only joins are the within-cell self-join and the dropped-id
    // attach — every join in the plan must be an equi-join mentioning
    // one of those keys
    val p = plans("q114_semantic_dedup")
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.nonEmpty)
    assert(joinLines.forall(l => l.contains("cell_id") || l.contains("vec_id")),
      joinLines.mkString("\n"))
  }

  test("q141 drift: ONE scan of documents feeds every dimension") {
    // the multi-dim JS divergence is a single explode pass — a second
    // FileScan would mean someone split the dims into separate scans
    val p = plans("q141_dist_drift")
    assert(p.sliding(8).count(_ == "FileScan") == 1, p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q142 snapshot churn: digest compare rides a FULL OUTER equi-join") {
    val p = plans("q142_snapshot_churn")
    assert(p.contains("FullOuter"), p.take(3000))
  }

  test("q144 calibration: the stats cutover picks the window shape at test scale") {
    // the distributed shape ends in a localCheckpoint (ExistingRDD
    // scan); at sf0.001 the auto pick must be the window plan — a
    // regression here means the cutover stopped reading stats
    val p = plans("q144_source_calibration")
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("ExistingRDD"), p.take(3000))
  }

  test("q146 indexed containment: zero text processing — stored lists only") {
    // the whole point of serving q97's semantics from the index: no
    // tokenizer in the plan (a split() here means a re-tokenize crept
    // back in), and the only scans are the postings store
    val p = plans("q146_containment_indexed_full")
    assert(!p.contains("split("), p.take(3000))
    assert(!p.contains("documents.parquet"), p.take(3000))
  }

  test("q78 mixture: corpus never shuffles — rates broadcast back onto docs") {
    val df = SparkEntry.queries("q78_lang_mixture")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    // the docs→rates join must be broadcast (rates is lang-cardinality)
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("lang")),
      p.take(4000))
    assert(!p.contains("SortMergeJoin"), p.take(4000))
  }
}
