package graft

import org.apache.spark.sql.functions._
import graft.ml.Approx

/** Sketch operators: bounded error vs exact answers. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events =
    Tables.t(spark, "/root/testdata/sf0.01", "events")

  test("approx distinct within rsd bounds of exact") {
    val r = Approx.distinctCounts(events, "event_type", "user_id", rsd = 0.02)
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val exact = row.getAs[Long]("exact").toDouble
      val approx = row.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"${row.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx quantiles bracket the true median") {
    val q = events.select(
      Approx.quantiles(events, "value", Seq(0.1, 0.5, 0.9)).as("qs"))
      .head().getSeq[Double](0)
    assert(q.length === 3)
    assert(q(0) < q(1) && q(1) < q(2))
    val exactMedian = events.select(expr("percentile(value, 0.5)"))
      .head().getDouble(0)
    assert(math.abs(q(1) - exactMedian) / math.max(1.0, math.abs(exactMedian)) < 0.05)
  }

  test("frequent items finds the planted hot key") {
    val df = (Seq.fill(900)("hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("key")
    val freq = Approx.frequentItems(df, Seq("key"), support = 0.5)
      .head().getSeq[String](0)
    assert(freq.contains("hot"))
  }
}
