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

  test("typed top-k aggregator matches the window-rank result") {
    import graft.functions.{ScoredId, TopK}
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i => (s"g${i % 7}", ScoredId(rnd.nextInt(500).toDouble, i)))
    val ds = rows.toDF("g", "s").as[(String, ScoredId)]
    val viaAgg = ds.groupByKey(_._1).mapValues(_._2).agg(TopK.topK(5))
      .collect().toMap

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"g").orderBy($"s.score".desc, $"s.id")
    val viaWindow = ds.toDF("g", "s")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 5)
      .select($"g", $"s").as[(String, ScoredId)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

    assert(viaAgg.keySet === viaWindow.keySet)
    viaAgg.foreach { case (g, top) => assert(top === viaWindow(g), s"group $g") }
  }

  test("asof forward: earliest right at-or-after, multi-key form") {
    val maint = Seq(("A", "east", 10L, "m1"), ("A", "west", 10L, "m2"), ("A", "east", 30L, "m3"))
      .toDF("sym", "region", "mts", "mid")
    val obs = Seq(("A", "east", 5L, "o1"), ("A", "east", 30L, "o2"),
      ("A", "east", 31L, "o3"), ("A", "west", 50L, "o4"))
      .toDF("sym", "region", "ts", "oid")
    val out = graft.operators.AsofJoin.asof(obs, maint, Seq("sym", "region"),
      "ts", "mts", forward = true)
      .select($"oid", $"asof.mid".as("mid"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("o1") === Some("m1")) // earliest ≥ 5 in (A,east) is 10
    assert(out("o2") === Some("m3")) // equal timestamp matches (inclusive)
    assert(out("o3") === None)       // nothing at-or-after 31
    assert(out("o4") === None)       // (A,west) has only t=10 < 50
  }

  test("asof differential: random tables match a brute-force reference") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val keys = Seq("k1", "k2", "k3", "k4")
      val left = (0 until 300).map(i =>
        (keys(rnd.nextInt(keys.length)), rnd.nextInt(1000).toLong, i.toLong))
      // right times made unique per (key, time) to honor the contract
      val right = rnd.shuffle(
        (for (k <- keys; t <- 0 until 80) yield (k, rnd.nextInt(1000).toLong))
          .distinct).take(120)
        .zipWithIndex.map { case ((k, t), i) => (k, t, 10000L + i) }
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq

      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "rid")
      val got = graft.operators.AsofJoin.asofBackward(lDf, rDf, "k", "t", "t")
        .select($"lid", $"asof.rid".as("rid"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap

      val byKey = right.groupBy(_._1)
      val expected = left.map { case (k, t, lid) =>
        lid -> byKey.getOrElse(k, Seq.empty)
          .filter(_._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      }.toMap
      assert(got === expected, s"trial $trial")
    }
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
