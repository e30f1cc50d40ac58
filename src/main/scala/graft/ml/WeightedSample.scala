package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted systematic resampling — the selection step an importance-
  * resampling pipeline (DSIR-style data mixing, [[Dsir]]) runs after
  * scoring: draw m slots from the corpus with probability ∝ weight,
  * WITH replication for weights heavier than one slot (a document
  * worth 2 slots appears twice in the training mix). Systematic
  * (low-variance) resampling rather than multinomial: slot j lands at
  * position j·W/m along the cumulative-weight axis, so the outcome is
  * a pure function of the weights — no RNG, and crucially NO
  * transcendentals: the exponential-keys scheme (Efraimidis-Spirakis
  * u^(1/w)) needs pow/ln whose last-ulp behavior differs between
  * engines' libm (the q95 half-point lesson, one layer down), while
  * slot counts here are INTEGER-ONLY — n_copies(i) =
  * ⌊cum_i·m/W⌋ − ⌊(cum_i−w_i)·m/W⌋ in exact long arithmetic (integer
  * division, never a double: at 100 TB cum·m overflows 2^53 and a
  * double floor silently mis-buckets; longs hold to 9.2e18).
  *
  * Reference behavior frame: blq-cli's deterministic sampling surface
  * (md5-bucket sampling in query.py, the q61/q74 contract) —
  * extended from Bernoulli to weight-proportional WITH replication.
  *
  * Scale shape — the distributed prefix sum: cum over a global id
  * order is the textbook single-partition-window trap, so it runs as
  * (1) range-repartition by id, (2) per-partition totals collected to
  * the driver (≤ #partitions rows — bounded like IVF centroids),
  * (3) per-partition running sum offset by the scanned prefix of
  * totals — every window partitions by the range-partition id, never
  * globally. The repartitioned frame feeds two consumers (totals +
  * final scan) and is PERSISTED for the pass: the 2+-consumers rule,
  * and here also a CORRECTNESS requirement — spark_partition_id must
  * agree across both jobs, and an unpersisted range partitioner may
  * resample boundaries per action. */
object WeightedSample {

  /** (idCol, weightCol → wt, n_copies) for every row systematic
    * resampling assigns at least one of `m` slots. Σ n_copies = m
    * exactly (every slot lands in exactly one row's cum interval).
    * Weights must be non-negative integers (cast to long); zero-weight
    * and NULL rows never draw a slot. Requires m ≥ 1 and a non-empty
    * positive-weight input. */
  def systematic(df: DataFrame, idCol: String, weightCol: String,
      m: Long): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    // integral weights are the exactness contract — a double weight
    // would silently truncate in the long cast and the slot math
    // would stop matching any oracle (the NgramIndex id-guard rule)
    locally {
      import org.apache.spark.sql.types._
      val wt = df.schema(weightCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(wt),
        s"weightCol '$weightCol' must be an integral type for exact slot " +
          s"arithmetic, got $wt — pre-scale fractional weights to integer " +
          "units (the q71 cents contract) before resampling")
    }
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val base = df
      .select(col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("wt"))
      .filter(col("id").isNotNull && col("wt").isNotNull && col("wt") >= 0)
    val ranged = base.repartitionByRange(p, col("id"))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded collect: one row per partition. count vs countDistinct
      // rides the same pass: equal ids range-partition together, so
      // per-partition distinct counts sum to the global distinct count
      // — a duplicate id anywhere makes the sums disagree. Duplicate
      // ids would give tied rows the same cum (RANGE frame), their
      // slot intervals would overlap and Σ n_copies would silently
      // drift from m, so the operator refuses them loudly.
      val totals0 = ranged.groupBy(col("__pid"))
        .agg(sum(col("wt")).as("t"), count(lit(1)).as("c"),
          countDistinct(col("id")).as("cd"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      require(totals0.map(_._3).sum == totals0.map(_._4).sum,
        s"idCol '$idCol' contains duplicate values — systematic " +
          "resampling needs unique ids (tied rows would share a cum and " +
          "their slot intervals would overlap)")
      val totals = totals0.map(t => (t._1, t._2)).sortBy(_._1)
      val total = totals.map(_._2).sum
      require(total > 0, "systematic resampling needs a positive total weight")
      val offsets = totals.map(_._1)
        .zip(totals.scanLeft(0L)(_ + _._2).dropRight(1)).toMap
      val offCol = coalesce(
        element_at(
          map(offsets.toSeq.sortBy(_._1)
            .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
          col("__pid")),
        lit(0L))
      val w = Window.partitionBy(col("__pid")).orderBy(col("id"))
      // slot rule ⌊cum·m/W⌋ − ⌊(cum−w)·m/W⌋. cum·m can reach total·m:
      // when that fits a long, plain long DIV (codegen'd); when it
      // would WRAP (non-ANSI long overflow is silent garbage — the
      // r15-advised hazard at total ~1e14 chars × m > ~9e4), the
      // product runs in DECIMAL(38,0) — total·m < 8.5e37 always fits
      // 38 digits, scale 0 so the value is exact, and IntegralDivide
      // on decimals returns the same exact long the long path would.
      val slotRule =
        if (m <= Long.MaxValue / total)
          expr(s"(cum * ${m}L) DIV ${total}L" +
            s" - ((cum - wt) * ${m}L) DIV ${total}L")
        else
          expr(s"(CAST(cum AS DECIMAL(38,0)) * ${m}L) DIV ${total}L" +
            s" - (CAST(cum - wt AS DECIMAL(38,0)) * ${m}L) DIV ${total}L")
      // eagerly materialized (localCheckpoint) BEFORE the unpersist:
      // the result is lazily derived from `ranged`, and letting it
      // recompute after unpersist could re-draw range boundaries that
      // no longer match the collected offsets. The checkpoint holds
      // only the picked rows (≤ m), not the corpus.
      ranged
        .withColumn("cum", offCol + sum(col("wt")).over(w))
        .withColumn("n_copies", slotRule)
        .filter(col("n_copies") > 0)
        .select(col("id").as(idCol), col("wt"), col("n_copies"))
        .localCheckpoint()
    } finally { ranged.unpersist(); () }
  }
}
