package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

/** Custom operator specs: as-of join semantics. */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward: latest right at-or-before each left time, per key") {
    val trades = Seq(
      ("A", 10L, "t1"), ("A", 25L, "t2"), ("A", 5L, "t0"),
      ("B", 50L, "t3"), ("C", 7L, "t4"))
      .toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.5), ("B", 49L, 7.25), ("B", 50L, 7.5))
      .toDF("sym", "qts", "px")

    val out = AsofJoin.asofBackward(trades, quotes, "sym", "ts", "qts")
      .select($"trade_id", $"asof.qts".as("qts"), $"asof.px".as("px"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap

    assert(out("t1") === ((Some(10L), Some(100.0)))) // equal timestamp matches (inclusive)
    assert(out("t2") === ((Some(20L), Some(101.5)))) // latest preceding, not first
    assert(out("t0") === ((None, None)))             // nothing at-or-before → null
    assert(out("t3") === ((Some(50L), Some(7.5))))   // picks 50 over 49
    assert(out("t4") === ((None, None)))             // key with no right rows
  }

  test("asof is one shuffle: plan has a single exchange on the key") {
    val trades = Seq(("A", 10L, "t1")).toDF("sym", "ts", "trade_id")
    val quotes = Seq(("A", 9L, 1.0)).toDF("sym", "qts", "px")
    val plan = AsofJoin.asofBackward(trades, quotes, "sym", "ts", "qts")
      .queryExecution.optimizedPlan.toString
    // no join node at all — the operator is union + window
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
  }
}
