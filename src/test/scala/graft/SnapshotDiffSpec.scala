package graft

import org.apache.spark.sql.functions._
import graft.analytics.SnapshotDiff

/** Snapshot diff: status classification must be exhaustive and
  * correct row-by-row, the digest must be injection-free, and the
  * churn rollup must carry the group column from whichever side has
  * the row (q142 gates the rollup against DuckDB). */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val v1 = Seq(
    (1L, "a", "one"), (2L, "a", "two"), (3L, "b", "three"), (4L, "b", "gone"))
  private val v2 = Seq(
    (1L, "a", "one"), (2L, "a", "TWO"), (3L, "b", "three"), (5L, "c", "new"))

  test("row-level statuses: added/removed/changed/unchanged") {
    val got = SnapshotDiff.diff(v1.toDF("id", "src", "text"),
        v2.toDF("id", "src", "text"), "id", Seq("text"), Seq("src"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "unchanged", "a"), (2L, "changed", "a"),
      (3L, "unchanged", "b"), (4L, "removed", "b"), (5L, "added", "c")))
  }

  test("digest is injection-free: shifting content across column boundaries is a change") {
    val a = Seq((1L, "ab", "c")).toDF("id", "x", "y")
    val b = Seq((1L, "a", "bc")).toDF("id", "x", "y")
    val st = SnapshotDiff.diff(a, b, "id", Seq("x", "y"))
      .select(col("status")).as[String].head()
    assert(st === "changed")
    // NULL vs empty string is a change too
    val n1 = Seq((1L, Option.empty[String])).toDF("id", "x")
    val n2 = Seq((1L, Option(""))).toDF("id", "x")
    assert(SnapshotDiff.diff(n1, n2, "id", Seq("x"))
      .select(col("status")).as[String].head() === "changed")
  }

  test("churn rollup groups by the carried column") {
    val got = SnapshotDiff.churn(v1.toDF("id", "src", "text"),
        v2.toDF("id", "src", "text"), "id", Seq("text"), "src")
      .as[(String, String, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    assert(got === Seq(("a", "changed", 1L), ("a", "unchanged", 1L),
      ("b", "removed", 1L), ("b", "unchanged", 1L), ("c", "added", 1L)))
  }

  test("identical snapshots are all-unchanged; empty sides classify wholesale") {
    val df = v1.toDF("id", "src", "text")
    val statuses = SnapshotDiff.diff(df, df, "id", Seq("text"))
      .select(col("status")).as[String].collect().toSet
    assert(statuses === Set("unchanged"))
    val empty = spark.emptyDataset[(Long, String, String)]
      .toDF("id", "src", "text")
    assert(SnapshotDiff.diff(empty, df, "id", Seq("text"))
      .select(col("status")).as[String].collect().toSet === Set("added"))
    assert(SnapshotDiff.diff(df, empty, "id", Seq("text"))
      .select(col("status")).as[String].collect().toSet === Set("removed"))
  }
}
