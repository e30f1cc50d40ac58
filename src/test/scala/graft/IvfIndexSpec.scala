package graft

import org.apache.spark.sql.functions._
import graft.ml.{Ivf, IvfIndex, Similarity}

/** Stored IVF index: float-mode probe must EQUAL the in-memory
  * Ivf.topK (same training inputs ⇒ same centroids ⇒ same ranking);
  * the probe plan must stream the corpus from its buckets with no
  * corpus-side exchange; append folds new vectors under the stored
  * centroids; the int8 payload mode holds recall against float. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def seededEmbs(n: Int, dim: Int, planted: Seq[(Long, Long)] = Seq.empty) = {
    val rng = new scala.util.Random(29)
    val base = (0 until n).map { i =>
      (i.toLong, s"l${i % 3}", Array.fill(dim)(rng.nextFloat() * 2f - 1f))
    }
    val byId = base.map(r => r._1 -> r._3).toMap
    val extra = planted.map { case (id, of) =>
      (id, "p", byId(of).map(x => x + 0.01f))
    }
    (base ++ extra).toDF("vec_id", "label", "embedding")
  }

  test("float-mode probe equals the in-memory Ivf.topK; bucketed no-exchange plan") {
    val embs = seededEmbs(200, 16)
    val (k, cells, nprobe, iters) = (5, 8, 3, 2)
    try {
      IvfIndex.write(embs, "g_ivf_idx", cells, iters, buckets = 4)
      val queries = embs.filter(col("vec_id") < 5)
      val got = IvfIndex.probe(spark, "g_ivf_idx", queries, k, nprobe)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
      val want = Ivf.topK(embs, q => q < 5, k, cells, nprobe, iters)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(got === want, "stored probe diverged from in-memory Ivf.topK")

      // plan: with broadcast+AQE off, the cell join reads the corpus
      // straight from its buckets — only the query side exchanges
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = IvfIndex.probe(spark, "g_ivf_idx", queries, k, nprobe)
          .queryExecution.executedPlan.toString()
        assert(plan.contains("Bucketed: true"), plan.take(3000))
        assert("Exchange hashpartitioning\\(cell_id".r.findAllIn(plan).size === 1,
          s"expected only the query-side cell_id exchange:\n${plan.take(3000)}")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally {
      Seq("g_ivf_idx", "g_ivf_idx_centroids", "g_ivf_idx_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("append assigns under stored centroids; planted neighbor found at rank 1") {
    val corpus = seededEmbs(150, 16)
    // 500 is a near-copy of corpus vec 7; it arrives in the APPEND batch
    val batch = seededEmbs(160, 16, planted = Seq((500L, 7L)))
      .filter(col("vec_id") >= 150)
    try {
      IvfIndex.write(corpus, "g_ivf_app", cells = 8, iters = 2, buckets = 4)
      val before = spark.table("g_ivf_app").count()
      IvfIndex.append(spark, "g_ivf_app", batch)
      assert(spark.table("g_ivf_app").count() ===
        before + batch.count())
      // a query at vec 7's position must now find the appended 500 first
      val res = IvfIndex.probe(spark, "g_ivf_app",
          corpus.filter(col("vec_id") === 7L), k = 3, nprobe = 3)
        .orderBy("rank").as[(Long, Long, Double, Int)].collect()
      assert(res.head._2 === 500L, res.mkString(", "))
      // appending to a non-bucketed table is refused loudly
      spark.range(1).toDF("x").write.saveAsTable("g_ivf_plain")
      val ex = intercept[IllegalStateException] {
        IvfIndex.append(spark, "g_ivf_plain", batch)
      }
      assert(ex.getMessage.contains("not a bucketed IVF index"))
      // append auto-detects an int8 index and keeps the byte payload
      IvfIndex.write(corpus, "g_ivf_app_q", cells = 8, iters = 2,
        buckets = 4, quantized = true)
      IvfIndex.append(spark, "g_ivf_app_q", batch)
      val qs = spark.table("g_ivf_app_q")
      assert(qs.schema.fieldNames.contains("q") &&
        !qs.schema.fieldNames.contains("v"))
      assert(qs.count() === before + batch.count())
      val resQ = IvfIndex.probe(spark, "g_ivf_app_q",
          corpus.filter(col("vec_id") === 7L), k = 3, nprobe = 3)
        .orderBy("rank").as[(Long, Long, Double, Int)].collect()
      assert(resQ.head._2 === 500L, resQ.mkString(", "))
    } finally {
      Seq("g_ivf_app", "g_ivf_app_centroids", "g_ivf_app_stats",
        "g_ivf_app_q", "g_ivf_app_q_centroids", "g_ivf_app_q_stats",
        "g_ivf_plain")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("probeNearDup: finds planted cross-batch and in-batch dups, never corpus x corpus") {
    // corpus holds its own near-dup family (7, 8≈7) that must NOT be
    // emitted; the batch holds a near-copy of corpus 7 (cross) and a
    // near-identical pair 600/601 (within)
    val corpus = seededEmbs(150, 16, planted = Seq((8L, 7L)))
      .filter(col("vec_id") < 150 || col("vec_id") === 8L)
    val batch = seededEmbs(150, 16, planted = Seq((500L, 7L), (600L, 11L), (601L, 11L)))
      .filter(col("vec_id") >= 500)
    try {
      IvfIndex.write(corpus, "g_ivf_nd", cells = 8, iters = 2, buckets = 4)
      val got = IvfIndex.probeNearDup(spark, "g_ivf_nd", batch,
          threshold = 0.95, nprobe = 2)
        .orderBy("vec_a", "vec_b")
        .as[(Long, Long, Double)].collect().toSeq
      val pairs = got.map(p => (p._1, p._2)).toSet
      assert(pairs.contains((7L, 500L)), got.toString)   // cross
      assert(pairs.contains((600L, 601L)), got.toString) // within batch
      assert(!pairs.contains((7L, 8L)), "corpus x corpus pair leaked")
      // every emitted pair touches the batch, and cos >= threshold
      assert(got.forall(p => p._2 >= 500L))
      assert(got.forall(_._3 >= 0.95))
      // deterministic
      val again = IvfIndex.probeNearDup(spark, "g_ivf_nd", batch,
          threshold = 0.95, nprobe = 2)
        .orderBy("vec_a", "vec_b").as[(Long, Long, Double)].collect().toSeq
      assert(got === again)
    } finally {
      Seq("g_ivf_nd", "g_ivf_nd_centroids", "g_ivf_nd_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("driftStats: in-distribution append holds ratio ~1, shifted append inflates it") {
    val corpus = seededEmbs(200, 16)
    try {
      IvfIndex.write(corpus, "g_ivf_dr", cells = 8, iters = 2, buckets = 4)
      val d0 = IvfIndex.driftStats(spark, "g_ivf_dr")
      assert(d0.nIndexed === 200L)
      assert(math.abs(d0.ratio - 1.0) < 1e-9, s"fresh index ratio ${d0.ratio}")
      // in-distribution batch (same generator, new ids): ratio stays ~1
      val inDist = seededEmbs(300, 16).filter(col("vec_id") >= 200)
      IvfIndex.append(spark, "g_ivf_dr", inDist)
      val d1 = IvfIndex.driftStats(spark, "g_ivf_dr")
      assert(d1.nIndexed === 300L)
      assert(d1.ratio < 1.3, s"in-distribution append drifted: ${d1.ratio}")
      // distribution shift: every dim offset by +5 — far from every
      // trained centroid, the rebuild cue must fire
      val shifted = seededEmbs(100, 16)
        .select((col("vec_id") + 1000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x + lit(5.0f)).as("embedding"))
      IvfIndex.append(spark, "g_ivf_dr", shifted)
      val d2 = IvfIndex.driftStats(spark, "g_ivf_dr")
      assert(d2.nIndexed === 400L)
      assert(d2.ratio > 1.5, s"shifted append should inflate drift: ${d2.ratio}")
      assert(d2.baselineMeanD2 === d0.baselineMeanD2, "baseline must not move")
    } finally {
      Seq("g_ivf_dr", "g_ivf_dr_centroids", "g_ivf_dr_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("crash-safe rebuild: interrupted swap leaves the old index serving; drift cue restores ratio ~1") {
    val corpus = seededEmbs(200, 16)
    try {
      IvfIndex.write(corpus, "g_ivf_cr", cells = 8, iters = 2, buckets = 4)
      def probeIds() = IvfIndex.probe(spark, "g_ivf_cr",
          corpus.filter(col("vec_id") < 3), k = 5, nprobe = 3)
        .orderBy("query_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      val before = probeIds()

      // crash DURING the side build (only some __new tables written):
      // recover must roll BACK — old index intact, side junk gone
      spark.range(3).selectExpr("cast(id as int) as cell_id",
          "array(0.0d) as centroid")
        .write.saveAsTable("g_ivf_cr_centroids__new")
      IvfIndex.recover(spark, "g_ivf_cr")
      assert(!spark.catalog.tableExists("g_ivf_cr_centroids__new"))
      assert(probeIds() === before, "roll-back changed the serving index")

      // crash AFTER the side build committed but before/mid swap (all
      // three __new exist): recover must roll FORWARD to the new build
      val corpus2 = seededEmbs(200, 16)
      IvfIndex.write(corpus2, "g_ivf_cr2", cells = 8, iters = 2, buckets = 4)
      Seq("", "_centroids", "_stats").foreach { sfx =>
        spark.sql(s"DROP TABLE IF EXISTS g_ivf_cr${sfx}__new")
        spark.sql(s"ALTER TABLE g_ivf_cr2$sfx RENAME TO g_ivf_cr${sfx}__new")
      }
      IvfIndex.recover(spark, "g_ivf_cr")
      assert(spark.catalog.tableExists("g_ivf_cr") &&
        !spark.catalog.tableExists("g_ivf_cr__new") &&
        !spark.catalog.tableExists("g_ivf_cr__old"))
      assert(probeIds() === before, "same-corpus roll-forward must serve identically")

      // drift cue: shifted append inflates ratio past 1.5; the gated
      // rebuild retrains FROM THE STORED PAYLOAD and restores ratio ~1
      val shifted = seededEmbs(100, 16)
        .select((col("vec_id") + 1000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x + lit(5.0f)).as("embedding"))
      IvfIndex.append(spark, "g_ivf_cr", shifted)
      assert(IvfIndex.rebuildIfDrifted(spark, "g_ivf_cr", 1.5).isDefined,
        "drift cue should fire after the shifted append")
      val after = IvfIndex.driftStats(spark, "g_ivf_cr")
      assert(after.nIndexed === 300L, s"rebuild must keep all rows: $after")
      assert(math.abs(after.ratio - 1.0) < 1e-9,
        s"fresh-rebuilt ratio should be 1: $after")
      // bucket spec survives the rebuild (append still works)
      IvfIndex.append(spark, "g_ivf_cr",
        seededEmbs(400, 16).filter(col("vec_id") >= 300))
      assert(spark.table("g_ivf_cr").count() === 400L)
      // a second cue on the rebuilt index must NOT fire
      assert(IvfIndex.rebuildIfDrifted(spark, "g_ivf_cr", 1.5).isEmpty)
    } finally {
      Seq("g_ivf_cr", "g_ivf_cr_centroids", "g_ivf_cr_stats",
        "g_ivf_cr2", "g_ivf_cr2_centroids", "g_ivf_cr2_stats")
        .flatMap(t => Seq(t, t + "__new", t + "__old", t + "__new_tmp"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("int8 payload: byte codes stored, recall@5 >= 0.9 vs the float index") {
    val embs = seededEmbs(200, 16)
    try {
      IvfIndex.write(embs, "g_ivf_f", cells = 8, iters = 2, buckets = 4)
      IvfIndex.write(embs, "g_ivf_q", cells = 8, iters = 2, buckets = 4,
        quantized = true)
      val qs = spark.table("g_ivf_q").schema
      assert(qs.fieldNames.contains("q") && !qs.fieldNames.contains("v"))
      assert(qs("q").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType === org.apache.spark.sql.types.ByteType)
      val queries = embs.filter(col("vec_id") < 10)
      def sets(table: String) =
        IvfIndex.probe(spark, table, queries, k = 5, nprobe = 3)
          .select(col("query_id"), col("cand_id"))
          .as[(Long, Long)].collect().groupBy(_._1).view
          .mapValues(_.map(_._2).toSet).toMap
      val f = sets("g_ivf_f"); val q = sets("g_ivf_q")
      val recalls = f.keys.toSeq.map(id =>
        (f(id) intersect q.getOrElse(id, Set.empty)).size.toDouble / 5)
      val mean = recalls.sum / recalls.size
      assert(mean >= 0.9, s"mean recall@5 $mean")
    } finally {
      Seq("g_ivf_f", "g_ivf_f_centroids", "g_ivf_f_stats",
        "g_ivf_q", "g_ivf_q_centroids", "g_ivf_q_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("recover: crash inside the final old-drop loop finishes FORWARD, never mixes builds") {
    // State (c) of the swap: every live table is the NEW build, no
    // __new remains, and SOME __old stragglers survive (the crash hit
    // swapIn's last loop after dropping only one of them). Rolling
    // back here would pair old payload/stats with new centroids —
    // recover must instead drop the stragglers and keep the live
    // build serving unchanged (r11 review finding).
    val corpus = seededEmbs(150, 16)
    try {
      IvfIndex.write(corpus, "g_ivf_fd", cells = 8, iters = 2, buckets = 4)
      def probeIds() = IvfIndex.probe(spark, "g_ivf_fd",
          corpus.filter(col("vec_id") < 3), k = 5, nprobe = 3)
        .orderBy("query_id", "rank").as[(Long, Long, Double, Int)].collect().toSeq
      val before = probeIds()
      // plant stragglers for payload + stats only (centroids__old
      // already dropped, as the crash point implies)
      spark.sql("CREATE TABLE g_ivf_fd__old AS SELECT * FROM g_ivf_fd LIMIT 1")
      spark.sql(
        "CREATE TABLE g_ivf_fd_stats__old AS SELECT * FROM g_ivf_fd_stats")
      IvfIndex.recover(spark, "g_ivf_fd")
      assert(!spark.catalog.tableExists("g_ivf_fd__old") &&
        !spark.catalog.tableExists("g_ivf_fd_stats__old"))
      assert(probeIds() === before, "forward-finish changed the serving index")
    } finally {
      Seq("g_ivf_fd", "g_ivf_fd_centroids", "g_ivf_fd_stats")
        .flatMap(t => Seq(t, t + "__new", t + "__old"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("append is idempotent on vec_id: replaying a batch is a no-op") {
    val corpus = seededEmbs(100, 16)
    try {
      IvfIndex.write(corpus.filter(col("vec_id") < 80), "g_ivf_idem",
        cells = 4, iters = 1, buckets = 4)
      val batch = corpus.filter(col("vec_id") >= 80)
      IvfIndex.append(spark, "g_ivf_idem", batch)
      val once = spark.table("g_ivf_idem").count()
      // at-least-once replay: same batch again, and a mixed batch
      // (half present, half genuinely new)
      IvfIndex.append(spark, "g_ivf_idem", batch)
      assert(spark.table("g_ivf_idem").count() === once)
      val mixed = seededEmbs(120, 16).filter(col("vec_id") >= 90)
      IvfIndex.append(spark, "g_ivf_idem", mixed)
      assert(spark.table("g_ivf_idem").count() === 120L)
      assert(spark.table("g_ivf_idem").select("vec_id").distinct().count() === 120L)
    } finally {
      Seq("g_ivf_idem", "g_ivf_idem_centroids", "g_ivf_idem_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("recallProbe: exhaustive probe scores 1.0; partial probe bounded and honest") {
    val embs = seededEmbs(200, 16)
    try {
      IvfIndex.write(embs, "g_ivf_rc", cells = 8, iters = 2, buckets = 4)
      val queries = embs.filter(col("vec_id") < 8)
      // nprobe = cells: the probe IS exhaustive, so recall must be
      // exactly 1.0 for every query (the approx and exact rankings
      // share scoring and tie-break)
      val full = IvfIndex.recallProbe(spark, "g_ivf_rc", queries,
        k = 5, nprobe = 8).as[(Long, Long, Double)].collect()
      assert(full.length === 8)
      assert(full.forall(r => r._2 === 5L && r._3 === 1.0), full.toSeq.toString)
      // nprobe = 1: recall in [0, 1], and equals a hand intersection
      // of probe output vs exhaustive output
      val part = IvfIndex.recallProbe(spark, "g_ivf_rc", queries,
        k = 5, nprobe = 1).as[(Long, Long, Double)].collect()
        .map(r => r._1 -> r._2).toMap
      def sets(np: Int) = IvfIndex.probe(spark, "g_ivf_rc", queries, 5, np)
        .select(col("query_id"), col("cand_id")).as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val exact = sets(8); val approx = sets(1)
      queries.select(col("vec_id")).as[Long].collect().foreach { id =>
        val want = (exact(id) intersect approx.getOrElse(id, Set.empty)).size.toLong
        assert(part(id) === want, s"query $id recall hits")
      }
    } finally {
      Seq("g_ivf_rc", "g_ivf_rc_centroids", "g_ivf_rc_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("maintainIndex: healthy index is untouched; recall cue fires when drift is quiet; drift cue fires alone") {
    val embs = seededEmbs(200, 16)
    try {
      IvfIndex.write(embs, "g_ivf_mn", cells = 8, iters = 2, buckets = 4)
      val queries = embs.filter(col("vec_id") < 8)
      // healthy: drift ≈ 1, exhaustive-probe recall = 1.0 — both cues
      // quiet, no rebuild, and the report carries BOTH measurements
      val ok = IvfIndex.maintainIndex(spark, "g_ivf_mn",
        driftThreshold = 1.5, recallQueries = Some(queries),
        recallFloor = 0.8, k = 5, nprobe = 8)
      assert(!ok.rebuilt && ok.reason.isEmpty, ok.toString)
      assert(ok.meanRecall === Some(1.0), ok.toString)
      assert(ok.drift.ratio < 1.5, ok.toString)
      // quality cue: drift stays quiet (threshold pushed out of
      // reach), but nprobe=1 under-recalls on an 8-cell index — the
      // recall floor alone must justify the rebuild
      val lowRecall = IvfIndex.recallProbe(spark, "g_ivf_mn", queries,
        k = 5, nprobe = 1).agg(avg(col("recall"))).head().getDouble(0)
      assert(lowRecall < 0.99, f"precondition: nprobe=1 recall $lowRecall%.4f")
      val byRecall = IvfIndex.maintainIndex(spark, "g_ivf_mn",
        driftThreshold = 100.0, recallQueries = Some(queries),
        recallFloor = 0.99, k = 5, nprobe = 1)
      assert(byRecall.rebuilt, byRecall.toString)
      assert(byRecall.reason.exists(_.contains("recall")), byRecall.toString)
      assert(byRecall.meanRecall.exists(_ < 0.99), byRecall.toString)
      assert(byRecall.drift.ratio <= 100.0, byRecall.toString)
      // geometry cue: shifted append inflates drift past the
      // threshold; decision order takes it FIRST (no recall pass —
      // meanRecall empty even though a query sample was supplied)
      val shifted = embs.filter(col("vec_id") < 60)
        .select((col("vec_id") + 1000L).as("vec_id"), col("label"),
          transform(col("embedding"), x => x + lit(10.0f)).as("embedding"))
      IvfIndex.append(spark, "g_ivf_mn", shifted)
      val byDrift = IvfIndex.maintainIndex(spark, "g_ivf_mn",
        driftThreshold = 1.5, recallQueries = Some(queries),
        recallFloor = 0.8, k = 5, nprobe = 8)
      assert(byDrift.rebuilt, byDrift.toString)
      assert(byDrift.reason.exists(_.contains("drift")), byDrift.toString)
      assert(byDrift.drift.ratio > 1.5, byDrift.toString)
      assert(byDrift.meanRecall.isEmpty, byDrift.toString)
      // the fired rebuild actually repaired the geometry
      assert(IvfIndex.driftStats(spark, "g_ivf_mn").ratio < 1.5)
      assert(spark.table("g_ivf_mn").count() === 260L)
    } finally {
      Seq("g_ivf_mn", "g_ivf_mn_centroids", "g_ivf_mn_stats")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("tombstones: deleted vectors vanish from probe/neardup/recall immediately; compact is value-identical; rebuild clears; resurrection refused") {
    val embs = seededEmbs(200, 16)
    val tbl = "g_ivf_tbs"
    try {
      IvfIndex.write(embs, tbl, cells = 8, iters = 1, buckets = 4)
      val queries = embs.filter(col("vec_id") < 5)
      val before = IvfIndex.probe(spark, tbl, queries, k = 50, nprobe = 3)
        .as[(Long, Long, Double, Int)].collect().toSeq
      val victims = before.map(_._2).distinct.take(3)
      IvfIndex.addTombstones(spark, tbl, victims.toDF("vec_id"))
      val after = IvfIndex.probe(spark, tbl, queries, k = 50, nprobe = 3)
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(!after.exists(r => victims.contains(r._2)), "neighbors forgotten")
      // survivors keep identical cosines (deletion pulls NEW tail
      // candidates into the top-k, so before-live ⊆ after, not =)
      val beforeLive = before.filterNot(r => victims.contains(r._2))
        .map(r => (r._1, r._2, r._3)).toSet
      assert(beforeLive.subsetOf(after.map(r => (r._1, r._2, r._3)).toSet))
      after.groupBy(_._1).foreach { case (_, rs) =>
        assert(rs.map(_._4).sorted === (1 to rs.size).toSeq) }
      // near-dup screen: a batch near-dup of a deleted vector is silent
      val batch = Seq((900L, "p",
        embs.filter(col("vec_id") === victims.head)
          .select(col("embedding")).as[Array[Float]].head()
          .map(x => x + 0.001f)))
        .toDF("vec_id", "label", "embedding")
      val nd = IvfIndex.probeNearDup(spark, tbl, batch, threshold = 0.9,
        nprobe = 3).as[(Long, Long, Double)].collect()
      assert(!nd.exists(p => victims.contains(p._1) || victims.contains(p._2)))
      // recall monitor: both sides live — an exhaustive probe is 1.0
      val rec = IvfIndex.recallProbe(spark, tbl, queries, k = 250, nprobe = 8)
        .select(col("recall")).as[Double].collect()
      assert(rec.forall(_ === 1.0), rec.mkString(","))
      // resurrection refused pre-compact
      intercept[IllegalArgumentException] {
        IvfIndex.append(spark, tbl, batch
          .withColumn("vec_id", lit(victims.head)))
      }
      // compact: payload-only rewrite, value-identical to the
      // pre-compact filtered view; tombstone table gone
      IvfIndex.compactTombstones(spark, tbl)
      assert(!spark.catalog.tableExists(tbl + "_tombstones"))
      val compacted = IvfIndex.probe(spark, tbl, queries, k = 50, nprobe = 3)
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(compacted.toSet === after.toSet)
      // post-compact the id re-appends cleanly
      IvfIndex.append(spark, tbl,
        batch.withColumn("vec_id", lit(victims.head)))
      assert(IvfIndex.probe(spark, tbl, queries, k = 250, nprobe = 8)
        .filter(col("cand_id") === victims.head).count() > 0L)
      // rebuild retrains on the LIVE payload and clears tombstones
      IvfIndex.addTombstones(spark, tbl, Seq(victims(1)).toDF("vec_id"))
      IvfIndex.rebuild(spark, tbl, iters = 1)
      assert(!spark.catalog.tableExists(tbl + "_tombstones"))
      assert(IvfIndex.probe(spark, tbl, queries, k = 250, nprobe = 8)
        .filter(col("cand_id") === victims(1)).count() === 0L,
        "rebuild trains and serves without the deleted vector")
    } finally {
      Seq(tbl, tbl + "_centroids", tbl + "_stats", tbl + "_tombstones")
        .flatMap(t => Seq(t, t + "__new", t + "__old"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
