package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-source quality calibration: percentile-rank a per-document
  * metric WITHIN each source so that selection thresholds mean the
  * same thing for every source — the FineWeb/DCLM-style "keep the top
  * q% of each source" rule that a raw global threshold gets wrong
  * when sources have different metric scales.
  *
  * Reference behavior frame: blq-cli's per-group ranking surface
  * (top-N-by-group over stored events, /root/reference/src/blq/
  * query.py) — generalized from top-N to an exact percentile with a
  * fractional keep rule.
  *
  * Scale shape — the W1 lesson applied to per-group ranks: a
  * `Window.partitionBy(source)` collapses its exchange to |sources|
  * partitions (CLAUDE.md), so a corpus-scale calibration pass would
  * rank each source on ONE core. This operator instead runs the
  * [[WeightedSample]] distributed-prefix discipline: range-repartition
  * on the full order key (source, metric, id), collect per-(partition,
  * source) COUNTS (bounded: partitions × sources rows), compute each
  * (partition, source)'s rank offset driver-side, and finish with a
  * window partitioned by (range-partition id, source) — every
  * partition ranks its own slice in parallel, offsets stitch the
  * global per-source order back together. The repartitioned frame
  * feeds two consumers (counts + final scan) and is persisted for the
  * pass; the result is localCheckpoint()ed BEFORE the unpersist so a
  * later recompute cannot re-draw range boundaries that no longer
  * match the collected offsets (the WeightedSample.systematic rule).
  *
  * Exactness contract: pct = (rank−1)/(n_src−1) — SQL percent_rank
  * over a TOTAL order (metric, then id as tiebreak), so rank =
  * row_number deterministically; the division is one IEEE op on exact
  * integers (identical in both engines) and the keep rule is pure
  * integer arithmetic: keep ⟺ (rank−1)·fracDen ≤ (n_src−1)·fracNum —
  * never a float compare (the q95 half-point lesson). Single-row
  * sources define pct = 0 (the SQL percent_rank convention) and are
  * always kept. */
object Calibrate {

  /** Stats cutover for the plan pick (the Tables.attachSide
    * precedent): below this estimated input size the plain per-group
    * window wins — the |groups|-partition collapse is harmless on
    * data this small and the distributed form's extra jobs
    * (range-partitioner sample, counts collect, checkpoint) are pure
    * floor. Measured at sf0.1 (q144 interleaved min-of-5): window
    * 0.30 s vs distributed 0.80 s — 2.6×; the distributed form is the
    * only viable shape at corpus scale, where the window's per-source
    * single-core sort is the thing being avoided.
    *
    * Estimate-direction audit (r17 — VERDICT r16 #7): the caller may
    * pass a PROJECTED frame, whose estimate is compressed-disk-bytes
    * scaled by schema-default column widths. For a text corpus that
    * is CONSERVATIVE — measured sf0.1 documents: projected estimate
    * 311 KB vs ~180 KB actual narrow data (the 20-byte string default
    * understates the dropped text column, overstating the kept
    * share), and the margin GROWS with real document length. The
    * residual trap is a heavily-RLE'd all-numeric store (disk bytes
    * collapse, so the scaled estimate can undershoot in-memory size
    * by orders). Hence 64 MB rather than the 256 MB first measured:
    * inputs whose estimate lands in 64-256 MB pay only the ~0.5 s
    * distributed floor on data that dwarfs it anyway, and the 4×
    * derate bounds the worst RLE undershoot's wrong-pick cost. */
  val WindowPlanMaxBytes: Long = 64L << 20

  /** Per-`grpCol` percentile of integral `metricCol` (ties broken by
    * integral `idCol`), keeping rows in the bottom fracNum/fracDen of
    * each group when `ascending` (low metric = kept) — pass the
    * top-fraction by flipping `ascending=false`. Output: (idCol,
    * grpCol, metric, pct) for KEPT rows, pct integer-scaled to 4 dp.
    *
    * Both metric and id must be integral (the WeightedSample
    * exactness contract): the rank math and keep rule stay in exact
    * long arithmetic end-to-end.
    *
    * `plan`: "auto" picks window vs distributed from the input's
    * optimizer size estimate ([[WindowPlanMaxBytes]]); "window" and
    * "distributed" force a shape (AbBench isolates / tests). Both
    * shapes emit identical values — CalibrateSpec differentials and
    * the q144 oracle gate both. */
  def keepByPercentile(df: DataFrame, grpCol: String, metricCol: String,
      idCol: String, fracNum: Long, fracDen: Long,
      ascending: Boolean = true, plan: String = "auto"): DataFrame = {
    require(fracDen >= 1 && fracNum >= 0 && fracNum <= fracDen,
      s"keep fraction must be 0 <= $fracNum/$fracDen <= 1")
    require(Seq("auto", "window", "distributed").contains(plan),
      s"unknown plan '$plan'")
    locally {
      import org.apache.spark.sql.types._
      val integral: Set[DataType] =
        Set(ByteType, ShortType, IntegerType, LongType)
      Seq(metricCol, idCol).foreach { c =>
        require(integral.contains(df.schema(c).dataType),
          s"'$c' must be an integral type for exact rank arithmetic, " +
            s"got ${df.schema(c).dataType}")
      }
    }
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val mCol = if (ascending) col(metricCol).cast("long")
      else -col(metricCol).cast("long")
    val base = df.select(col(grpCol).cast("string").as("g"),
        mCol.as("m"), col(idCol).cast("long").as("id"),
        col(metricCol).cast("long").as("metric"))
      .filter(col("id").isNotNull && col("m").isNotNull)
    val useWindow = plan == "window" || (plan == "auto" &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(WindowPlanMaxBytes))
    if (useWindow) {
      // small-input shape: one shuffle on g, everything else local.
      // The duplicate-id contract stays loud — one tiny agg job on
      // data already under the cutover.
      val dup = base.agg(count(lit(1)).as("c"),
        countDistinct(col("id")).as("cd")).head()
      require(dup.getLong(0) == dup.getLong(1),
        s"idCol '$idCol' contains duplicate values — percentile ranking " +
          "needs unique ids for a total order")
      val w = Window.partitionBy(col("g")).orderBy(col("m"), col("id"))
      return finishKeep(base
          .withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("n_src",
            count(lit(1)).over(Window.partitionBy(col("g")))),
        idCol, grpCol, fracNum, fracDen)
    }
    val ranged = base.repartitionByRange(p, col("g"), col("m"), col("id"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // GLOBAL duplicate-id check (r16 advice): the old per-(pid, g)
      // countDistinct sum only caught duplicates sharing the full
      // (g, m, id) range key — a duplicate id under a different metric
      // or group passed silently while the window plan rejected it.
      // One tiny agg on the persisted frame keeps both forced shapes
      // enforcing the same unique-id contract.
      val dup = ranged.agg(count(lit(1)).as("c"),
        countDistinct(col("id")).as("cd")).head()
      require(dup.getLong(0) == dup.getLong(1),
        s"idCol '$idCol' contains duplicate values — percentile ranking " +
          "needs unique ids for a total order")
      // bounded collect: ≤ partitions × |groups| rows
      val counts = ranged.groupBy(col("__pid"), col("g"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val nBySrc = counts.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      // rank offset for (pid, g) = rows of g in any EARLIER partition;
      // range partitioning on (g, m, id) keeps each g's rows in
      // partition-id order, so the prefix is well-defined
      val offsets = counts.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
        val ordered = rows.sortBy(_._1)
        ordered.zip(ordered.scanLeft(0L)(_ + _._3).dropRight(1))
          .map { case ((pid, _, _), off) => (pid, g, off) }
      }
      val offMap = map(offsets.flatMap { case (pid, g, off) =>
        Seq(concat_ws("\u0001", lit(pid), lit(g)), lit(off))
      }: _*)
      val nMap = map(nBySrc.toSeq.flatMap { case (g, n) =>
        Seq(lit(g), lit(n))
      }: _*)
      val w = Window.partitionBy(col("__pid"), col("g"))
        .orderBy(col("m"), col("id"))
      val ranked = ranged
        .withColumn("rnk",
          coalesce(element_at(offMap,
            concat_ws("\u0001", col("__pid"), col("g"))), lit(0L)) +
            row_number().over(w))
        .withColumn("n_src", element_at(nMap, col("g")))
      finishKeep(ranked, idCol, grpCol, fracNum, fracDen)
        .localCheckpoint()
    } finally { ranged.unpersist(); () }
  }

  /** Shared keep rule + emission — factored so the window and
    * distributed shapes cannot diverge. Expects (g, id, metric, rnk,
    * n_src). */
  private def finishKeep(ranked: DataFrame, idCol: String, grpCol: String,
      fracNum: Long, fracDen: Long): DataFrame =
    ranked
      .filter((col("rnk") - 1) * fracDen <= (col("n_src") - 1) * fracNum)
      .select(col("id").as(idCol), col("g").as(grpCol), col("metric"),
        (round(when(col("n_src") > 1,
            (col("rnk") - 1).cast("double") / (col("n_src") - 1))
          .otherwise(lit(0.0)) * 10000, 0).cast("long") / lit(10000.0))
          .as("pct"))
}
