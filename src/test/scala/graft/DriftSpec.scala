package graft

import org.apache.spark.sql.functions._
import graft.ml.Drift

/** JS-divergence drift monitor: the one-scan multi-dimension plan must
  * equal a driver-side reference computation, honor the JS bounds
  * (0 ≤ js ≤ ln 2), and survive degenerate slices (q141 gates the
  * same numbers against DuckDB). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def referenceJs(rows: Seq[(String, Boolean)]): Double = {
    val ref = rows.filterNot(_._2).groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val cur = rows.filter(_._2).groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val (rt, ct) = (ref.values.sum, cur.values.sum)
    (ref.keySet ++ cur.keySet).toSeq.map { v =>
      val p = if (rt > 0) ref.getOrElse(v, 0.0) / rt else 0.0
      val q = if (ct > 0) cur.getOrElse(v, 0.0) / ct else 0.0
      val m = (p + q) / 2
      (if (p > 0) p * math.log(p / m) / 2 else 0.0) +
        (if (q > 0) q * math.log(q / m) / 2 else 0.0)
    }.sum
  }

  private def e4(x: Double): Double = math.round(x * 10000).toDouble / 10000.0

  test("differential vs the driver-side reference, two dims in one pass") {
    val r = new scala.util.Random(5)
    val rows = (0 until 2000).map { i =>
      (i.toLong, s"s${r.nextInt(6)}", s"l${r.nextInt(3)}", i % 4 == 0)
    }
    val df = rows.toDF("id", "src", "lang", "cur").repartition(7)
    val got = Drift.jsDivergence(df, col("cur"),
        Seq("src" -> col("src"), "lang" -> col("lang")))
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    val nCur = rows.count(_._4).toLong
    for ((dim, pick) <- Seq(
        "src" -> ((t: (Long, String, String, Boolean)) => t._2),
        "lang" -> ((t: (Long, String, String, Boolean)) => t._3))) {
      val want = e4(referenceJs(rows.map(t => (pick(t), t._4))))
      val (_, nr, nc, js) = got(dim)
      assert(nr === rows.size - nCur && nc === nCur, dim)
      assert(js === want, dim)
    }
  }

  test("bounds: identical mixes give 0; disjoint categories give ln 2") {
    // cur = first half: each category lands 50 times on each side —
    // identical mixes (i % 2 would CORRELATE with i % 4 and be
    // disjoint, the q141 %5-slice lesson)
    val same = (0 until 400).map(i => (s"c${i % 4}", i < 200))
      .toDF("v", "cur")
    val sameJs = Drift.jsDivergence(same, col("cur"), Seq("v" -> col("v")))
      .select(col("js")).as[Double].head()
    assert(sameJs === 0.0)
    val disjoint = (0 until 400)
      .map(i => (if (i % 2 == 0) "a" else "b", i % 2 == 0))
      .toDF("v", "cur")
    val dJs = Drift.jsDivergence(disjoint, col("cur"), Seq("v" -> col("v")))
      .select(col("js")).as[Double].head()
    assert(dJs === e4(math.log(2)))
  }

  test("embeddingDrift: identical per-label mixes give cos = 1; a shifted slice drops below; reference check") {
    val r = new scala.util.Random(23)
    def vec(shift: Double) = Seq.fill(8)((r.nextDouble() + shift).toFloat)
    // label 0: cur slice drawn from the same distribution; label 1:
    // cur slice shifted — its centroid must disagree more
    val rows = (0 until 400).map { i =>
      val lbl = i % 2
      val cur = i % 4 < 2
      (i.toLong, lbl, vec(if (lbl == 1 && cur) 3.0 else 0.0), cur)
    }
    val df = rows.toDF("vec_id", "label", "embedding", "cur").repartition(5)
    val got = graft.ml.Drift.embeddingDrift(df, col("cur"))
      .as[(Int, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(got(0)._4 > got(1)._4, "shifted slice must show more drift")
    assert(got(0)._2 === 100L && got(0)._3 === 100L)
    // driver-side reference with the same 6-dp centroid contract
    def ref(lbl: Int): Double = {
      def cent(cur: Boolean) = {
        val vs = rows.filter(t => t._2 == lbl && t._4 == cur).map(_._3)
        (0 until 8).map(p => math.rint(
          vs.map(_(p).toDouble).sum / vs.size * 1e6) / 1e6)
      }
      val (a, b) = (cent(false), cent(true))
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).foldLeft(0.0) { case (s, (u, v)) => s + u * v }
      val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      math.round(c * 10000).toDouble / 10000.0
    }
    assert(got(0)._4 === ref(0) && got(1)._4 === ref(1))
  }

  test("embeddingDrift: ragged embedding dimensions fail loudly (r16 advice)") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // label 0 clean (dim 4 both sides); label 1 ragged on the cur
    // side (one dim-2 row) — high positions would silently average
    // over fewer rows and first(n) would be nondeterministic
    val rows = Seq(
      (1L, 0, Seq(1f, 2f, 3f, 4f), false),
      (2L, 0, Seq(2f, 1f, 4f, 3f), true),
      (3L, 1, Seq(1f, 1f, 1f, 1f), false),
      (4L, 1, Seq(2f, 2f, 2f, 2f), true),
      (5L, 1, Seq(3f, 3f), true))
      .toDF("vec_id", "label", "embedding", "cur")
    val e = intercept[Throwable] {
      graft.ml.Drift.embeddingDrift(rows, col("cur")).collect()
    }
    assert(chain(e).contains("ragged embedding dimensions"), chain(e))
    // the clean shape still computes
    val ok = graft.ml.Drift.embeddingDrift(
      rows.filter(col("vec_id") =!= 5L), col("cur"))
      .as[(Int, Long, Long, Double)].collect()
    assert(ok.length === 2 && ok.forall(t => t._2 === 1L && t._3 === 1L))
  }

  test("stored reference probe equals the one-frame form exactly; unseen categories register") {
    val r = new scala.util.Random(31)
    val rows = (0 until 1500).map { i =>
      (i.toLong, s"s${r.nextInt(5)}", i % 3 == 0)
    }
    val df = rows.toDF("id", "src", "cur")
    val dims = Seq("src" -> col("src"))
    val refDir = java.nio.file.Files.createTempDirectory("drift_ref").toString + "/ref"
    graft.ml.Drift.writeReference(df.filter(!col("cur")), dims, refDir)
    val fromStore = graft.ml.Drift.probeReference(spark, refDir,
        df.filter(col("cur")), dims)
      .as[(String, Long, Long, Double)].collect().toSeq
    val oneFrame = graft.ml.Drift.jsDivergence(df, col("cur"), dims)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(fromStore === oneFrame)
    // a batch category the reference never saw still lands finitely
    val novel = Seq((1L, "BRAND_NEW", true)).toDF("id", "src", "cur")
    val js = graft.ml.Drift.probeReference(spark, refDir, novel, dims)
      .select(col("js")).as[Double].head()
    assert(js === math.round(math.log(2) * 10000).toDouble / 10000.0)
  }

  test("an empty slice degrades finitely instead of NaN-poisoning") {
    val df = (0 until 10).map(i => (s"c$i", false)).toDF("v", "cur")
    val js = Drift.jsDivergence(df, col("cur"), Seq("v" -> col("v")))
      .select(col("js")).as[Double].head()
    assert(!js.isNaN && js >= 0.0)
  }
}
