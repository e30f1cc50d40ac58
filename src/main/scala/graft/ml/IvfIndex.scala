package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The STORED form of the IVF vector index — the third leg of the
  * persistent-index trilogy ([[LexIndex]] for lexical retrieval,
  * [[BandIndex]] for dedup candidates, this for vector similarity).
  * [[Ivf.topK]] trains cells and assigns the corpus PER CALL; at
  * 100 TB the assignment table is the thing you build once and probe
  * forever — exactly the q37 pin's closing argument ("at 100 TB the
  * prep is a stored table and the double-build term disappears").
  *
  * Layout, two catalog tables:
  *  - `<table>_centroids`: (cell_id, centroid) — k rows, the bounded
  *    driver-side literal every probe inlines (no broadcast join).
  *  - `<table>`: the assignment table, bucketed+sorted by cell_id —
  *    a probe's cell equi-join streams the corpus STRAIGHT from its
  *    buckets with no exchange (the BandIndex plan-pin precedent);
  *    only the (tiny) query side shuffles.
  *
  * Vector payload: float (`v` + `nrm`, exact) or int8 (`quantized =
  * true`: `scale` + `q` codes via [[Quantize]], plus `nrm` of the
  * DECODED vector stored at write time) — 4× smaller cell scans on
  * the scan-bound probe path; candidates decode per row inside the
  * probed cells only, never the whole corpus. IvfIndexSpec pins the
  * float-mode probe EQUAL to [[Ivf.topK]] (same training, same
  * ranking) and the quantized mode's recall against it.
  *
  * [[append]] folds new vectors in by assigning them to the STORED
  * centroids (no retrain, no corpus rewrite) — one batch-sized
  * shuffle into the bucket layout, the same additive maintenance
  * contract as [[BandIndex.append]]. Centroid drift under sustained
  * append is the operational trigger for a rebuild, the same cadence
  * call as LexIndex's fingerprint. */
object IvfIndex {

  def centroidsTable(table: String): String = table + "_centroids"

  /** Baseline stats table: 1 row (mean_d2, n) captured at [[write]]
    * time — the yardstick [[driftStats]] compares against. */
  def statsTable(table: String): String = table + "_stats"

  /** Rebuild-trigger measurement: how far the indexed population has
    * drifted from the centroids it was trained on. `baselineMeanD2`
    * is the mean squared distance of each vector to its assigned
    * centroid AT WRITE TIME; `currentMeanD2` recomputes it over the
    * stored payload as it stands after appends ([[append]] assigns
    * under the stored centroids but never retrains — in-distribution
    * batches keep the ratio ≈ 1, distribution shift inflates it).
    * `ratio` > ~1.5 is the operational rebuild cue, the quantitative
    * form of LexIndex's fingerprint cadence. One aggregation over the
    * assignment table — no corpus text, no retrain, cost ∝ index. */
  final case class Drift(baselineMeanD2: Double, currentMeanD2: Double,
      ratio: Double, nIndexed: Long)

  /** The three catalog tables an index owns, in swap order. */
  private def indexTables(table: String): Seq[String] =
    Seq(centroidsTable(table), table, statsTable(table))

  private def newName(n: String): String = n + "__new"
  private def oldName(n: String): String = n + "__old"

  /** Collected centroid-literal cache per index table (r14 — the
    * LexIndex postingsFrame/queryCache precedent applied to the IVF
    * probe's fixed tax: AbBench `q112_cents_only` measured the
    * centroid collect job at 0.08-0.10 s of every probe of an
    * immutable index). Centroids change ONLY through the write/
    * rebuild/recover swap (appends assign under the STORED
    * centroids), and the collected form is pure literals — bound to
    * no session — so every probe after the first skips the collect
    * job entirely. Invalidated by [[swapIn]] and [[recover]]. */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.Column]()

  private def cachedCentroidArray(spark: SparkSession,
      table: String): org.apache.spark.sql.Column =
    centroidCache.computeIfAbsent(table, { _ =>
      Ivf.centroidArray(spark.table(centroidsTable(table)))
    })

  private def invalidateCentroids(table: String): Unit = {
    centroidCache.remove(table)
    ()
  }

  /** Train cells on `embs` (vec_id, label, embedding) and store the
    * assignment + centroid + stats tables. Crash-safe (r11): all three
    * tables are built under `__new` side names first — a failure
    * anywhere in the long train/assign/write phase leaves an existing
    * index fully serving under its live names — then swapped in via
    * rename-aside ([[recover]] completes or undoes an interrupted
    * swap). */
  def write(embs: DataFrame, table: String, cells: Int, iters: Int,
      buckets: Int, quantized: Boolean = false): Unit = {
    val spark = embs.sparkSession
    recover(spark, table)
    // a fresh build starts clean: stale tombstones describe the
    // previous corpus's ids
    graft.store.Bucketing.dropWithDir(spark, tombstoneTable(table))
    val p = Similarity.prepared(embs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try buildAndSwap(spark, p, table, cells, iters, buckets, quantized)
    finally { p.unpersist(); () }
  }

  /** Build the three index tables under side names from an already-
    * prepared (vec_id, v, nrm) frame, then swap them live. */
  private def buildAndSwap(spark: SparkSession, p: DataFrame, table: String,
      cells: Int, iters: Int, buckets: Int, quantized: Boolean): Unit = {
    val names = indexTables(table)
    names.foreach(n => graft.store.Bucketing.dropWithDir(spark, newName(n)))
    val centroids = Ivf.train(p, cells, iters)
    centroids.select(col("cell_id").cast("int").as("cell_id"), col("centroid"))
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(newName(centroidsTable(table)))
    val assigned = Ivf.assign(p, spark.table(newName(centroidsTable(table))))
    payload(assigned, quantized)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("compression", "zstd")
      .bucketBy(buckets, "cell_id")
      .sortBy("cell_id")
      .saveAsTable(newName(table))
    // drift baseline: mean squared distance to the assigned centroid
    // over the population the centroids were trained on
    meanAssignedD2(spark, newName(table), newName(centroidsTable(table)))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(newName(statsTable(table)))
    swapIn(spark, names)
  }

  /** Rename-aside swap: per table, live → `__old`, `__new` → live;
    * olds dropped only after every rename landed. The old index DATA
    * survives until the last step — a crash at any point is repaired
    * by [[recover]] (roll forward once all `__new` tables committed,
    * roll back otherwise). */
  private def swapIn(spark: SparkSession, names: Seq[String]): Unit = {
    invalidateCentroids(names(1)) // names = (centroids, TABLE, stats)
    names.foreach { n =>
      graft.store.Bucketing.dropWithDir(spark, oldName(n))
      if (spark.catalog.tableExists(n))
        spark.sql(s"ALTER TABLE $n RENAME TO ${oldName(n)}")
      spark.sql(s"ALTER TABLE ${newName(n)} RENAME TO $n")
    }
    names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS ${oldName(n)}"))
  }

  /** Repair an interrupted [[write]]/[[rebuild]]: if all three `__new`
    * side tables exist the build committed — roll the swap FORWARD;
    * otherwise the build (or swap) died midway — roll BACK to the old
    * index (restore any `__old`, drop side leftovers). Either way the
    * index is coherent afterwards: all three tables from the SAME
    * build. Called defensively at the start of every write/rebuild;
    * safe no-op on a clean index. */
  def recover(spark: SparkSession, table: String): Unit = {
    invalidateCentroids(table) // any branch may change the live build
    val names = indexTables(table)
    def ex(n: String) = spark.catalog.tableExists(n)
    val haveNew = names.count(n => ex(newName(n)))
    if (haveNew == names.size) swapIn(spark, names)
    else if (haveNew == 0 && names.forall(ex)) {
      // No __new anywhere and every live table present: either the
      // swap fully committed and crashed inside swapIn's final
      // old-drop loop (live tables ARE the new build, __old holds
      // stragglers of the old one), or no swap was in flight at all.
      // Rolling back HERE would mix builds — the r11 review's
      // mixed-index finding: restoring __old for only the tables
      // that still have one pairs old payload/stats with new
      // centroids. Finish forward: drop the stragglers.
      names.foreach(n => spark.sql(s"DROP TABLE IF EXISTS ${oldName(n)}"))
    } else {
      // A swap was genuinely mid-flight (some but not all __new
      // remain, or a live name is missing mid-rename): restore the
      // old build and clear side tables.
      names.foreach { n =>
        if (ex(oldName(n))) {
          if (ex(n)) spark.sql(s"DROP TABLE $n")
          spark.sql(s"ALTER TABLE ${oldName(n)} RENAME TO $n")
        }
        graft.store.Bucketing.dropWithDir(spark, newName(n))
      }
    }
  }

  /** Retrain the index FROM ITS OWN STORED PAYLOAD — the action a
    * [[driftStats]] cue triggers (append assigns under stale centroids
    * but never retrains; once the population has drifted, rebuild).
    * No source corpus needed: the payload carries the vectors (decoded
    * when quantized — one extra quantization round trip of error,
    * bounded by QuantizeSpec's scale/2 per element). Same side-name +
    * swap protocol as [[write]]: the old index serves until the new
    * one is complete. `cells` defaults to the current centroid count;
    * bucket count and payload mode carry over from the live table. */
  // ---------------------------------------------------------------
  // Deletion (right-to-be-forgotten) — the NgramIndex/LexIndex
  // tombstone protocol on the VECTOR index: a deleted document's
  // embedding must stop appearing as anyone's neighbor the moment
  // the tombstone commits. Probes anti-join the stored payload
  // against the tombstone table BEFORE ranking (deleted vectors
  // neither appear nor consume top-k slots; the recall monitor's
  // exact side excludes them identically, so recall stays a fair
  // comparison); centroids and drift stats stay as-trained until a
  // rewrite. [[compactTombstones]] rewrites the payload only
  // (assignments don't depend on other vectors, so cell geometry is
  // untouched); [[rebuild]] retrains from the LIVE payload and
  // clears the tombstones — rebuild-as-compaction. q149 gates the
  // immediate-forget probe against the from-scratch oracle with
  // full-corpus centroids and live-only candidates.
  // ---------------------------------------------------------------

  private def tombstoneTable(table: String): String = table + "_tombstones"

  /** Record vector ids as deleted. Idempotent set semantics. */
  def addTombstones(spark: SparkSession, table: String,
      ids: DataFrame): Unit = {
    val cast = ids.select(col(ids.columns.head).cast("long").as("vec_id"))
      .filter(col("vec_id").isNotNull).distinct()
    val tt = tombstoneTable(table)
    val novel =
      if (spark.catalog.tableExists(tt))
        cast.join(spark.table(tt), Seq("vec_id"), "left_anti")
      else cast
    if (!novel.isEmpty) {
      novel.coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Append).saveAsTable(tt)
      ()
    }
  }

  /** The payload visible to probes: stored rows minus tombstoned
    * vectors (broadcast anti-join; zero-cost when nothing was ever
    * deleted). */
  private def liveStored(spark: SparkSession, table: String): DataFrame = {
    val stored = spark.table(table)
    val tt = tombstoneTable(table)
    if (!spark.catalog.tableExists(tt)) stored
    else stored.join(
      broadcast(spark.table(tt).select(col("vec_id").as("__tbs_id"))),
      col("vec_id") === col("__tbs_id"), "left_anti")
  }

  /** Physically drop tombstoned payload rows. Cell assignments are a
    * pure function of the vector and the (unchanged) centroids, so
    * only the payload table rewrites; a crash mid-swap is repaired by
    * [[recover]]'s rollback (a lone `__new` side table is dropped).
    * Clearing the tombstones after the swap is replay-idempotent. */
  def compactTombstones(spark: SparkSession, table: String): Unit = {
    val tt = tombstoneTable(table)
    if (!spark.catalog.tableExists(tt)) return
    recover(spark, table)
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val buckets = meta.bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed IVF index table"))
    graft.store.Bucketing.dropWithDir(spark, newName(table))
    liveStored(spark, table).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("compression", "zstd")
      .bucketBy(buckets, "cell_id").sortBy("cell_id")
      .saveAsTable(newName(table))
    graft.store.Bucketing.dropWithDir(spark, oldName(table))
    spark.sql(s"ALTER TABLE $table RENAME TO ${oldName(table)}")
    spark.sql(s"ALTER TABLE ${newName(table)} RENAME TO $table")
    spark.sql(s"DROP TABLE IF EXISTS ${oldName(table)}")
    graft.store.Bucketing.dropWithDir(spark, tt)
    invalidateCentroids(table)
  }

  def rebuild(spark: SparkSession, table: String, cells: Int = -1,
      iters: Int = 2): Unit = {
    recover(spark, table)
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val buckets = meta.bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed IVF index table"))
    val stored = spark.table(table)
    val quantized = stored.schema.fieldNames.contains("q")
    val k = if (cells > 0) cells
      else spark.table(centroidsTable(table)).count().toInt
    // rebuild-as-compaction: retrain from the LIVE payload and clear
    // the tombstones once the new build is live
    val storedLive = liveStored(spark, table)
    val v =
      if (quantized) Quantize.decodeCol(col("q"), col("scale"))
      else col("v")
    // already-prepared shape (vec_id, v, nrm): nrm recomputed for the
    // decoded payload, exact for float (stored nrm IS dot(v,v)^0.5)
    val p = storedLive.select(col("vec_id"), v.as("v"))
      .withColumn("nrm", sqrt(graft.plans.VectorOps.dotCol(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      buildAndSwap(spark, p, table, k, iters, buckets, quantized)
      graft.store.Bucketing.dropWithDir(spark, tombstoneTable(table))
    } finally { p.unpersist(); () }
  }

  /** The operational rebuild entry point: measure drift, rebuild only
    * past `threshold` (the scaladoc's ~1.5 cue). Returns the drift
    * measured BEFORE the rebuild when one fired, None otherwise —
    * callers log it as the rebuild's justification. */
  def rebuildIfDrifted(spark: SparkSession, table: String,
      threshold: Double = 1.5, iters: Int = 2): Option[Drift] = {
    val d = driftStats(spark, table)
    if (d.ratio > threshold) { rebuild(spark, table, iters = iters); Some(d) }
    else None
  }

  /** One maintenance check's full evidence + outcome: the measured
    * geometry cue ([[Drift]]), the measured quality cue (mean
    * recall@k over the caller's query sample, when one was supplied),
    * whether a rebuild fired, and which cue justified it. */
  final case class MaintainReport(drift: Drift, meanRecall: Option[Double],
      rebuilt: Boolean, reason: Option[String])

  /** The composed rebuild decision (r12) — geometry OR quality: an
    * index can degrade two ways, and each cue sees only one of them.
    * [[driftStats]] catches distribution shift (appended vectors far
    * from the centroids they were assigned under — mean-d2 ratio
    * inflates) but reads ≈1 when appends are in-distribution yet
    * unluckily split across cell boundaries; [[recallProbe]] measures
    * the probe's actual answer quality against the exact answer over
    * the served payload and catches exactly that, but costs a
    * sample×corpus pass, so it rides the same monitoring cadence.
    * Decision order: drift first (cheaper — one aggregation over the
    * index, no exact pass), recall only when drift is quiet and a
    * query sample was supplied. Either cue past its threshold fires
    * ONE [[rebuild]] (retrain from the stored payload, crash-safe
    * swap); the report carries both measurements and the firing cue
    * so operators can log the justification — the
    * [[rebuildIfDrifted]] contract, widened to both halves. */
  def maintainIndex(spark: SparkSession, table: String,
      driftThreshold: Double = 1.5,
      recallQueries: Option[DataFrame] = None,
      recallFloor: Double = 0.8, k: Int = 10, nprobe: Int = 2,
      iters: Int = 2): MaintainReport = {
    val d = driftStats(spark, table)
    if (d.ratio > driftThreshold) {
      rebuild(spark, table, iters = iters)
      MaintainReport(d, None, rebuilt = true,
        Some(f"drift ratio ${d.ratio}%.3f > $driftThreshold%.2f"))
    } else {
      val rec = recallQueries.map(q =>
        recallProbe(spark, table, q, k, nprobe)
          .agg(avg(col("recall"))).head().getDouble(0))
      rec match {
        case Some(r) if r < recallFloor =>
          rebuild(spark, table, iters = iters)
          MaintainReport(d, rec, rebuilt = true,
            Some(f"mean recall@$k $r%.4f < $recallFloor%.2f"))
        case _ => MaintainReport(d, rec, rebuilt = false, None)
      }
    }
  }

  /** 1-row (mean_d2, n) of the stored payload's squared distance to
    * its assigned cell centroid (decoded when quantized). Table names
    * are explicit so [[buildAndSwap]] can measure the `__new` side
    * tables before they go live. */
  private def meanAssignedD2(spark: SparkSession, table: String,
      centsTable: String): DataFrame = {
    val cents = Ivf.centroidArray(spark.table(centsTable))
    val stored = spark.table(table)
    val v =
      if (stored.schema.fieldNames.contains("q"))
        Quantize.decodeCol(col("q"), col("scale"))
      else col("v")
    // the assigned centroid's vector, looked up by its cell_id FIELD —
    // not positionally: Ivf.train with iters > 0 rebuilds centroids
    // from groupBy(cell_id), which drops any cell a Lloyd iteration
    // left empty, so stored cell_ids may be non-contiguous and a
    // positional element_at would read the wrong centroid (or, under
    // ANSI, throw past the array end). O(k) per row, and this runs
    // once per write/driftStats, never on the probe path.
    stored
      .select(col("cell_id"), v.as("vv"))
      .select(graft.plans.VectorOps.l2sqCol(col("vv"),
        element_at(filter(cents,
          c => c.getField("cell_id") === col("cell_id")), 1)
          .getField("c")).as("d2"))
      .agg(avg(col("d2")).as("mean_d2"), count(lit(1)).as("n"))
  }

  /** Measure drift of the current index population vs the write-time
    * baseline — see [[Drift]]. */
  def driftStats(spark: SparkSession, table: String): Drift = {
    val base = spark.table(statsTable(table)).head()
    val cur = meanAssignedD2(spark, table, centroidsTable(table)).head()
    val (b, c) = (base.getDouble(0), cur.getDouble(0))
    Drift(b, c, if (b == 0.0) Double.PositiveInfinity else c / b,
      cur.getLong(1))
  }

  /** Assignment rows → the stored payload shape. */
  private def payload(assigned: DataFrame, quantized: Boolean): DataFrame =
    if (!quantized)
      assigned.select(col("cell_id"), col("vec_id"), col("v"), col("nrm"))
    else {
      // nrm stored for the DECODED vector so probe-time cosine is
      // consistent with the bytes actually served
      val dec = Quantize.decodeCol(col("q"), col("scale"))
      assigned
        .select(col("cell_id"), col("vec_id"),
          Quantize.scaleCol(col("v")).as("scale"), col("v"))
        .select(col("cell_id"), col("vec_id"), col("scale"),
          Quantize.codesCol(col("v"), col("scale")).as("q"))
        .withColumn("nrm", sqrt(graft.plans.VectorOps.dotCol(dec, dec)))
        .select(col("cell_id"), col("vec_id"), col("scale"), col("q"), col("nrm"))
    }

  /** Fold NEW vectors in under the STORED centroids — additive,
    * batch-sized, no retrain. IDEMPOTENT on vec_id (r11): batch
    * vectors already present in the index are dropped before the
    * write, so an at-least-once replay of the same batch (the
    * ingestAndMaintain crash-recovery path) is a no-op instead of a
    * duplicate-row append. */
  def append(spark: SparkSession, table: String, newEmbs: DataFrame): Unit = {
    if (newEmbs.isEmpty) return // no-op, no empty bucket files
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val buckets = meta.bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed IVF index table"))
    val quantized = spark.table(table).schema.fieldNames.contains("q")
    locally {
      val tt = tombstoneTable(table)
      if (spark.catalog.tableExists(tt)) {
        val clash = newEmbs.select(col("vec_id").cast("long").as("vec_id"))
          .join(spark.table(tt), Seq("vec_id"), "left_semi").limit(1).collect()
        require(clash.isEmpty,
          s"batch contains tombstoned vec_id ${clash.headOption.map(_.get(0))}" +
            s" — run compactTombstones($table) first if the re-add is intended")
      }
    }
    val fresh = newEmbs.join(
      spark.table(table).select(col("vec_id")), Seq("vec_id"), "left_anti")
    if (fresh.isEmpty) return
    val assigned = Ivf.assign(Similarity.prepared(fresh),
      spark.table(centroidsTable(table)))
    payload(assigned, quantized)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .option("compression", "zstd")
      .bucketBy(buckets, "cell_id")
      .sortBy("cell_id")
      .saveAsTable(table)
  }

  /** Incremental embedding near-dup screen over the stored index —
    * the vector-side analog of [[BandIndex.probe]]: for a batch of
    * NEW vectors (vec_ids disjoint from the index), emit verified
    * (vec_a, vec_b, cos) pairs with cosine ≥ threshold, where
    * candidates are batch×corpus pairs sharing one of the batch
    * vector's `nprobe` nearest cells, plus batch×batch pairs sharing
    * an assignment cell. Corpus×corpus pairs never exist (the stored
    * side only joins against the batch), so steady-state cost tracks
    * the batch and the touched cells, never corpus². a < b
    * orientation on vec_id, distinct (nprobe > 1 can propose a pair
    * twice). The 6-dp threshold guard + 4-dp output follow the q53
    * float-portability pattern. A near-dup pair can straddle a cell
    * boundary — raise `nprobe` to trade candidates for recall, the
    * standard IVF dial; IvfIndexSpec pins planted cross and in-batch
    * dups found and corpus×corpus absent.
    *
    * Persist hazard (the [[TextDedup.containmentPairsIncremental]]
    * pattern): the batch's cell-expanded frame feeds both the cross
    * and within legs, so it persists per CALL, reclaimed only when
    * the result frame becomes unreachable — batch-sized state, but a
    * long-lived probe-per-batch session should release results
    * promptly. */
  def probeNearDup(spark: SparkSession, table: String, batch: DataFrame,
      threshold: Double, nprobe: Int = 2): DataFrame = {
    val cents = cachedCentroidArray(spark, table)
    val b = Similarity.prepared(batch)
      .withColumn("cell_id", explode(transform(
        slice(Ivf.rankedCells(cents, col("v")), 1, nprobe),
        s => s.getField("cell_id"))))
      .select(col("cell_id"), col("vec_id").as("new_id"),
        col("v").as("bv"), col("nrm").as("bn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stored = liveStored(spark, table)
    val cands =
      if (stored.schema.fieldNames.contains("q"))
        stored.select(col("cell_id"), col("vec_id").as("cand_id"),
          Quantize.decodeCol(col("q"), col("scale")).as("cv"), col("nrm").as("cn"))
      else
        stored.select(col("cell_id"), col("vec_id").as("cand_id"),
          col("v").as("cv"), col("nrm").as("cn"))
    val cross = b.join(cands, Seq("cell_id"))
      .withColumn("cos", Similarity.dot(col("bv"), col("cv")) / (col("bn") * col("cn")))
      .select(least(col("cand_id"), col("new_id")).as("vec_a"),
        greatest(col("cand_id"), col("new_id")).as("vec_b"), col("cos"))
    val b2 = b.select(col("cell_id"), col("new_id").as("other_id"),
      col("bv").as("ov"), col("bn").as("on"))
    val within = b.join(b2, Seq("cell_id"))
      .filter(col("new_id") < col("other_id"))
      .withColumn("cos", Similarity.dot(col("bv"), col("ov")) / (col("bn") * col("on")))
      .select(col("new_id").as("vec_a"), col("other_id").as("vec_b"), col("cos"))
    cross.unionByName(within)
      .filter(round(col("cos"), 6) >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
      .distinct()
  }

  /** Top-k cosine neighbors for `queries` (vec_id, label, embedding)
    * probing the `nprobe` nearest stored cells. Self-matches (same
    * vec_id) are excluded, mirroring [[Ivf.topK]]. */
  def probe(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val cents = cachedCentroidArray(spark, table)
    val q = Similarity.prepared(queries)
      .withColumn("cell_id", explode(transform(
        slice(Ivf.rankedCells(cents, col("v")), 1, nprobe),
        s => s.getField("cell_id"))))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell_id"))
    val stored = liveStored(spark, table)
    val quantized = stored.schema.fieldNames.contains("q")
    val cands =
      if (quantized)
        stored.select(col("cell_id"), col("vec_id").as("cand_id"),
          Quantize.decodeCol(col("q"), col("scale")).as("cv"), col("nrm").as("cn"))
      else
        stored.select(col("cell_id"), col("vec_id").as("cand_id"),
          col("v").as("cv"), col("nrm").as("cn"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("cand_id"))
    // build-side pick per Ivf.probeShaped: small corpus → Catalyst's
    // choice; past the broadcast threshold → broadcast the contract-
    // small query side so the BUCKETED cell scan streams shuffle-free
    // at full width and the rank window is WindowGroupLimit-bounded.
    // Quantized payloads decode int8 → double in the join: size the
    // decision on the DECODED width (8× the stored bytes), or the
    // collapsing plan survives 4× longer than the float path's.
    val storedBytes = stored.queryExecution.optimizedPlan.stats.sizeInBytes
    Ivf.probeShaped(q, cands,
      corpusBytesHint = Some(if (quantized) storedBytes * 8 else storedBytes))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 4).as("cos"),
        col("rank"))
  }

  /** Measured recall@k of the stored index against the EXACT answer —
    * the quality half of the rebuild decision ([[driftStats]] is the
    * geometry half: drift says the centroids moved, recallProbe says
    * whether the probe still finds what it should). Scores the index
    * probe and a brute-force pass over the SAME stored payload
    * (decoded when quantized — measuring the index as served, not the
    * original floats) on a caller-bounded query sample. The exact
    * pass is queries×corpus, so the sample bound is the contract —
    * same class as the labeled q35/q36 baselines, run on a monitoring
    * cadence, never per-query. Returns (query_id, hits, recall). */
  def recallProbe(spark: SparkSession, table: String, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val approx = probe(spark, table, queries, k, nprobe)
      .select(col("query_id"), col("cand_id"))
    // the exact side excludes deleted vectors too — recall compares
    // the probe against the truth over the LIVE payload
    val stored = liveStored(spark, table)
    val cands =
      if (stored.schema.fieldNames.contains("q"))
        stored.select(col("vec_id").as("cand_id"),
          Quantize.decodeCol(col("q"), col("scale")).as("cv"), col("nrm").as("cn"))
      else
        stored.select(col("vec_id").as("cand_id"),
          col("v").as("cv"), col("nrm").as("cn"))
    val q = Similarity.prepared(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("cand_id"))
    val exact = broadcast(q).crossJoin(cands)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"))
    // Denominator = the per-query EXACT result count, not a flat k
    // (r11 review): when the served corpus has fewer than k
    // competitors the exact pass emits min(k, corpus-1) rows, and
    // dividing by k would under-read recall — a perfect probe could
    // never reach 1.0 and might trip a rebuild threshold spuriously.
    // Edge out of scope: a query whose exact set is EMPTY (the stored
    // corpus holds at most the query itself) has no recall to measure
    // and is absent from the output — monitoring a ≤1-vector index is
    // meaningless by construction.
    exact.join(approx.withColumn("hit", lit(1L)),
        Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("n_exact"))
      .select(col("query_id"), col("hits"),
        round(col("hits") / col("n_exact"), 4).as("recall"))
  }
}
