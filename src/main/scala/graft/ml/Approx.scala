package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch/approximation operators — the 100 TB swap-ins for exact
  * aggregates flagged in the per-query scale notes (SURVEY.md §2.4 A2;
  * q02's countDistinct):
  *
  *  - HLL++ distinct counts (`approx_count_distinct`): bounded-memory
  *    mergeable sketches vs the expand+two-phase exact distinct.
  *  - Quantile summaries (`percentile_approx` / Greenwald-Khanna):
  *    latency percentiles without a global sort.
  *  - Frequent items (`count_min_sketch`-style via Spark's
  *    `freqItems`): hot-key discovery feeding [[Skew.saltedJoin]].
  *
  * These are deliberately NOT in the oracle-checked query set: sketch
  * outputs are implementation-defined, so cross-engine hash equality
  * is the wrong test. Correctness here = bounded relative error vs the
  * exact answer, asserted in ApproxSpec.
  */
object Approx {

  /** Per-group distinct counts: exact and HLL++ side by side (rsd =
    * target relative standard deviation). */
  def distinctCounts(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol)).agg(
      countDistinct(col(valueCol)).as("exact"),
      approx_count_distinct(col(valueCol), rsd).as("approx"))

  /** Approximate quantiles of a numeric column without a global sort.
    * accuracy = 1/eps (10000 ≈ 0.01% rank error). */
  def quantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      accuracy: Int = 10000): Column =
    percentile_approx(col(valueCol),
      array(qs.map(lit): _*), lit(accuracy))

  /** Hot keys by sampled frequency — the cheap pre-pass that decides
    * whether [[Skew.saltedJoin]] is needed. support = minimum frequency
    * share to report. */
  def frequentItems(df: DataFrame, cols: Seq[String],
      support: Double = 0.01): DataFrame =
    df.stat.freqItems(cols.toArray, support)
}
