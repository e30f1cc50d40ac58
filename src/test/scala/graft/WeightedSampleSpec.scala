package graft

import org.apache.spark.sql.functions._
import graft.ml.WeightedSample

/** Systematic resampling: the distributed prefix-sum pipeline must
  * equal the single-threaded reference arithmetic exactly — under any
  * input partitioning — and the slot-count law Σ n_copies = m must
  * hold structurally (q132 gates the same math against DuckDB). */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: local cumsum + the same integer slot rule. */
  private def reference(rows: Seq[(Long, Long)], m: Long): Seq[(Long, Long, Long)] = {
    val sorted = rows.sortBy(_._1)
    val total = sorted.map(_._2).sum
    var cum = 0L
    sorted.flatMap { case (id, wt) =>
      val before = cum * m / total
      cum += wt
      val nc = cum * m / total - before
      if (nc > 0) Some((id, wt, nc)) else None
    }
  }

  test("differential vs the single-threaded reference, invariant under input partitioning; slot counts sum to m") {
    val r = new scala.util.Random(19)
    val rows = (0L until 300L).map(id => (id, (r.nextInt(50) + 1).toLong))
    for (m <- Seq(1L, 7L, 100L, 450L); parts <- Seq(1, 5)) {
      val got = WeightedSample.systematic(
          rows.toDF("doc_id", "w").repartition(parts), "doc_id", "w", m)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got === reference(rows, m), s"m=$m parts=$parts")
      assert(got.map(_._3).sum === m, s"slot conservation at m=$m")
    }
  }

  test("a weight heavier than several slots replicates; zero weights never draw") {
    val rows = Seq((1L, 10L), (2L, 0L), (3L, 500L), (4L, 10L))
    val got = WeightedSample.systematic(rows.toDF("doc_id", "w"),
        "doc_id", "w", m = 52)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === reference(rows, 52L))
    assert(!got.exists(_._1 == 2L), "zero-weight row must never be picked")
    assert(got.find(_._1 == 3L).exists(_._3 >= 40L),
      s"the dominant weight must replicate heavily: $got")
    assert(got.map(_._3).sum === 52L)
  }

  test("fractional weight types are refused (silent truncation would break the exactness contract)") {
    val e = intercept[IllegalArgumentException] {
      WeightedSample.systematic(
        Seq((1L, 2.5)).toDF("doc_id", "w"), "doc_id", "w", m = 2)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("duplicate ids are refused loudly — tied cum rows would overlap slot intervals and break Σ n_copies = m (r15 advice)") {
    val e = intercept[IllegalArgumentException] {
      WeightedSample.systematic(
        Seq((1L, 5L), (2L, 5L), (1L, 5L)).toDF("doc_id", "w"),
        "doc_id", "w", m = 4)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("cum·m past Long.MaxValue takes the exact DECIMAL(38,0) slot rule — no silent long wrap (r15 advice)") {
    // total ≈ 3.6e18, m = 1000 → cum·m ≈ 3.6e21 wraps a long; the
    // decimal path must match BigInt reference arithmetic exactly
    val rows = Seq((1L, 1200000000000000000L), (2L, 1200000000000000003L),
      (3L, 1199999999999999999L), (4L, 7L))
    val m = 1000L
    val total = BigInt(rows.map(_._2).sum)
    var cum = BigInt(0)
    val ref = rows.sortBy(_._1).flatMap { case (id, wt) =>
      val before = cum * m / total
      cum += wt
      val nc = cum * m / total - before
      if (nc > 0) Some((id, wt, nc.toLong)) else None
    }
    val got = WeightedSample.systematic(rows.toDF("doc_id", "w"),
        "doc_id", "w", m)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === ref)
    assert(got.map(_._3).sum === m)
  }

  test("NULL ids/weights are excluded; all-zero weights are refused") {
    val rows = Seq((Some(1L), Some(5L)), (None, Some(9L)), (Some(3L), None))
    val got = WeightedSample.systematic(rows.toDF("doc_id", "w"),
        "doc_id", "w", m = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 3L)))
    val e = intercept[IllegalArgumentException] {
      WeightedSample.systematic(Seq((1L, 0L)).toDF("doc_id", "w"),
        "doc_id", "w", m = 2)
    }
    assert(e.getMessage.contains("positive total weight"))
  }
}
