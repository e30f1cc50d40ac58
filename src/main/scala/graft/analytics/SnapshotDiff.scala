package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-snapshot diff: row-level added/removed/changed/unchanged
  * classification between two versions of a keyed table, plus the
  * churn rollup a data-curation dashboard actually reads.
  *
  * Reference behavior frame: blq-cli's run-diff surface
  * (/root/reference/src/blq/query.py run_diff — FULL OUTER of two
  * run slices on fingerprint with presence flags), generalized from
  * run-scoped event fingerprints to whole-corpus content versioning:
  * the "what changed between yesterday's crawl snapshot and today's"
  * question every continuously-refreshed training corpus asks before
  * retraining.
  *
  * Why a content HASH and not column equality: the diff is one join
  * whose compare key is a fixed-width digest computed map-side, so
  * wide payloads (document text) never ride the shuffle twice — each
  * side ships (key, digest) plus whatever the caller projects, and
  * the digest is md5 so a DuckDB oracle computes the identical bytes
  * (the repo-wide md5 contract, README).
  *
  * Scale shape: one shuffle on the key per side (co-located and
  * exchange-free when both snapshots live bucketed by key — the
  * store/Bucketing.compactBucketed layout), FULL OUTER join,
  * map-side digesting. No window, no skew hazard beyond the join
  * key's own distribution (document ids — unique by contract). The
  * churn rollup is a bounded agg over (group, status).
  */
object SnapshotDiff {

  /** md5 digest over the content columns, null-safe and
    * injection-free: values are length-prefixed before concatenation
    * so ("ab","c") can never collide with ("a","bc"), and NULL is
    * distinct from the empty string. */
  private def contentDigest(cols: Seq[String]) =
    md5(concat_ws("", cols.map { c =>
      concat(coalesce(length(col(c)).cast("string"), lit("-")), lit(":"),
        coalesce(col(c).cast("string"), lit("")))
    }: _*))

  /** Row-level diff: (key, status, plus one `grp` column carried from
    * whichever side has the row — v2 wins for rows present in both).
    * status ∈ added | removed | changed | unchanged (added = in v2
    * only; removed = in v1 only). */
  def diff(v1: DataFrame, v2: DataFrame, keyCol: String,
      contentCols: Seq[String], carryCols: Seq[String] = Nil): DataFrame = {
    require(contentCols.nonEmpty, "need at least one content column")
    def side(df: DataFrame, tag: String) =
      df.select((col(keyCol) +: contentDigest(contentCols).as(s"h_$tag") +:
        carryCols.map(c => col(c).as(s"${c}_$tag"))): _*)
    val joined = side(v1, "v1").join(side(v2, "v2"), Seq(keyCol), "full_outer")
    val status = when(col("h_v1").isNull, lit("added"))
      .when(col("h_v2").isNull, lit("removed"))
      .when(col("h_v1") === col("h_v2"), lit("unchanged"))
      .otherwise(lit("changed"))
    joined.select((col(keyCol) +: status.as("status") +:
      carryCols.map(c => coalesce(col(s"${c}_v2"), col(s"${c}_v1")).as(c))): _*)
  }

  /** Churn rollup: (grpCol, status, n_docs) over the row-level diff —
    * the per-source dashboard row. */
  def churn(v1: DataFrame, v2: DataFrame, keyCol: String,
      contentCols: Seq[String], grpCol: String): DataFrame =
    diff(v1, v2, keyCol, contentCols, Seq(grpCol))
      .groupBy(col(grpCol), col("status"))
      .agg(count(lit(1)).as("n_docs"))
}
