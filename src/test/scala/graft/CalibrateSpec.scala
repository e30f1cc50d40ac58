package graft

import org.apache.spark.sql.functions._
import graft.ml.Calibrate

/** Per-group percentile calibration: the distributed two-pass rank
  * must equal the single-window reference under any input
  * partitioning, the keep rule must be exact integer arithmetic, and
  * the contracts (integral cols, unique ids) must fail loudly (q144
  * gates the stitched ranks against DuckDB percent_rank). */
class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: full sort per group, percent_rank. */
  private def reference(rows: Seq[(Long, String, Long)], num: Long,
      den: Long, ascending: Boolean): Seq[(Long, String, Long, Double)] =
    rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      val ordered =
        if (ascending) rs.sortBy(t => (t._3, t._1))
        else rs.sortBy(t => (-t._3, t._1))
      val n = ordered.size.toLong
      ordered.zipWithIndex.collect {
        case ((id, _, m), i) if i.toLong * den <= (n - 1) * num =>
          val pct = if (n > 1) i.toDouble / (n - 1) else 0.0
          (id, g, m, math.round(pct * 10000).toDouble / 10000.0)
      }
    }.sortBy(_._1)

  test("differential vs the single-threaded reference, both directions, any partitioning") {
    val r = new scala.util.Random(11)
    val rows = (0L until 500L).map { id =>
      (id, s"s${r.nextInt(5)}", r.nextInt(200).toLong)
    }
    for (asc <- Seq(true, false); parts <- Seq(1, 9);
        plan <- Seq("window", "distributed")) {
      val got = Calibrate.keepByPercentile(
          rows.toDF("id", "g", "m").repartition(parts),
          "g", "m", "id", fracNum = 2, fracDen = 5, ascending = asc,
          plan = plan)
        .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got === reference(rows, 2, 5, asc),
        s"asc=$asc parts=$parts plan=$plan")
    }
  }

  test("keep fraction edges: 0/1 keeps only rank-1 rows; 1/1 keeps everything") {
    val rows = (0L until 60L).map(id => (id, s"s${id % 3}", id % 7))
    val df = rows.toDF("id", "g", "m")
    val top = Calibrate.keepByPercentile(df, "g", "m", "id", 0, 1)
      .as[(Long, String, Long, Double)].collect()
    assert(top.length === 3 && top.forall(_._4 === 0.0))
    assert(Calibrate.keepByPercentile(df, "g", "m", "id", 1, 1)
      .count() === 60L)
  }

  test("single-row groups define pct = 0 and are always kept") {
    val df = Seq((1L, "only", 42L), (2L, "pair", 1L), (3L, "pair", 2L))
      .toDF("id", "g", "m")
    val got = Calibrate.keepByPercentile(df, "g", "m", "id", 1, 2)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "only", 42L, 0.0), (2L, "pair", 1L, 0.0)))
  }

  test("contracts fail loudly: non-integral metric, duplicate ids, bad fraction") {
    intercept[IllegalArgumentException] {
      Calibrate.keepByPercentile(
        Seq((1L, "a", 0.5)).toDF("id", "g", "m"), "g", "m", "id", 1, 2)
    }
    // duplicate ids refuse on BOTH plan shapes
    for (plan <- Seq("window", "distributed"))
      intercept[IllegalArgumentException] {
        Calibrate.keepByPercentile(
          Seq((1L, "a", 1L), (1L, "a", 1L)).toDF("id", "g", "m"),
          "g", "m", "id", 1, 2, plan = plan)
      }
    // r17 (r16 advice): a duplicate id under a DIFFERENT group/metric
    // lands in a different range partition — the old per-(partition,
    // group) check passed it silently while the window plan refused;
    // both shapes must enforce the same global unique-id contract
    for (plan <- Seq("window", "distributed"))
      intercept[IllegalArgumentException] {
        Calibrate.keepByPercentile(
          Seq((1L, "a", 1L), (1L, "b", 99L), (2L, "a", 2L))
            .toDF("id", "g", "m"),
          "g", "m", "id", 1, 2, plan = plan)
      }
    intercept[IllegalArgumentException] {
      Calibrate.keepByPercentile(
        Seq((1L, "a", 1L)).toDF("id", "g", "m"), "g", "m", "id", 3, 2)
    }
    ()
  }
}
