package graft

import org.apache.spark.sql.functions._
import graft.ml.{HeavyHitters, MisraGries}

/** Misra-Gries heavy hitters: the membership guarantee (true count >
  * N/(k+1) ⇒ present) must hold under any partitioning, counts must
  * be under-estimates within the N/(k+1) band, and the two-pass
  * exact form must equal the full-cardinality groupBy it avoids
  * (q143 gates the same equality against DuckDB). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish skewed stream: value v_i drawn with weight ∝ 1/(i+1). */
  private def zipfStream(n: Int, card: Int, seed: Int): Seq[String] = {
    val r = new scala.util.Random(seed)
    val weights = (0 until card).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cum = weights.map(_ / total).scanLeft(0.0)(_ + _).tail
    (0 until n).map { _ =>
      val u = r.nextDouble()
      s"v${cum.indexWhere(u <= _).max(0)}"
    }
  }

  test("membership guarantee: every value above N/(k+1) survives the sketch, under 1 and 7 partitions") {
    val stream = zipfStream(20000, 400, seed = 7)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (k <- Seq(8, 32, 128); parts <- Seq(1, 7)) {
      val (n, counters) =
        HeavyHitters.sketch(stream.toDF("v").repartition(parts), "v", k)
      assert(n === stream.size.toLong)
      val bound = n / (k + 1)
      val mustHave = exact.filter(_._2 > bound).keySet
      assert(mustHave.subsetOf(counters.keySet),
        s"k=$k parts=$parts lost ${mustHave -- counters.keySet}")
      assert(counters.size <= k)
      // counts are under-estimates within the error band
      counters.foreach { case (v, est) =>
        val t = exact.getOrElse(v, 0L)
        assert(est <= t, s"over-estimate for $v")
        assert(t - est <= bound, s"error band violated for $v")
      }
    }
  }

  test("two-pass heavyHitters equals the exact groupBy+having it avoids") {
    val stream = zipfStream(5000, 60, seed = 13)
    val df = stream.toDF("v").repartition(5)
    for (fracDen <- Seq(10L, 30L)) {
      val got = HeavyHitters.heavyHitters(df, "v", k = 64, fracDen = fracDen)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
      val n = stream.size.toLong
      val want = stream.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 * fracDen > n).toSeq.sortBy(_._1)
      assert(got === want, s"fracDen=$fracDen")
    }
  }

  test("completeness precondition is loud: fracDen beyond k+1 is refused") {
    val df = Seq("a", "b").toDF("v")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, "v", k = 4, fracDen = 6)
    }
    ()
  }

  test("merge rule preserves the bound when partial summaries overflow capacity") {
    // two disjoint-ish streams forced through tiny k so the merge
    // prune (subtract the (k+1)-th largest) actually runs
    val mg = new MisraGries(3)
    val b1 = "a a a a b b c".split(" ").foldLeft(mg.zero)(mg.reduce)
    val b2 = "d d d d e e f".split(" ").foldLeft(mg.zero)(mg.reduce)
    val (n, m) = mg.merge(b1, b2)
    assert(n === 14L)
    assert(m.size <= 3)
    // a and d (4 each > 14/4=3.5) must survive
    assert(m.contains("a") && m.contains("d"))
  }

  test("stored monitor: folded batches honor the guarantee over the concatenated stream; replays are refused; crash repair restores") {
    val dir = java.nio.file.Files.createTempDirectory("hh_state").toString + "/state"
    val batches = Seq(
      zipfStream(3000, 50, seed = 1),
      zipfStream(3000, 50, seed = 2),
      zipfStream(3000, 50, seed = 3))
    val k = 24
    batches.zipWithIndex.foreach { case (b, i) =>
      assert(HeavyHitters.foldHhBatch(b.toDF("v").repartition(3), dir, "v", k, i.toLong))
    }
    val (n, counters, last) = HeavyHitters.readHhState(spark, dir)
    val all = batches.flatten
    assert(n === all.size.toLong && last === 2L)
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n / (k + 1)
    val mustHave = exact.filter(_._2 > bound).keySet
    assert(mustHave.subsetOf(counters.keySet), s"lost ${mustHave -- counters.keySet}")
    counters.foreach { case (v, est) =>
      assert(est <= exact.getOrElse(v, 0L) && exact.getOrElse(v, 0L) - est <= bound, v)
    }
    // replay of an already-folded batch id is a no-op
    assert(!HeavyHitters.foldHhBatch(batches.head.toDF("v"), dir, "v", k, 1L))
    assert(HeavyHitters.readHhState(spark, dir) === ((n, counters, last)))
    // crash between live-aside and promote: live gone, complete stage
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__stage"))
    assert(HeavyHitters.readHhState(spark, dir) === ((n, counters, last)))
    // crash with an incomplete stage: old aside is restored
    fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "__old"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "__stage"))
    assert(HeavyHitters.readHhState(spark, dir) === ((n, counters, last)))
  }

  test("approxTopK reports the error band; nulls and empties are safe") {
    val df = Seq(Some("x"), Some("x"), Some("y"), None)
      .toDF("v")
    val rows = HeavyHitters.approxTopK(df, "v", k = 4)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._1).toSet === Set("x", "y"))
    assert(HeavyHitters.heavyHitters(
      spark.emptyDataset[String].toDF("v"), "v", 4, 5).count() === 0L)
  }
}
