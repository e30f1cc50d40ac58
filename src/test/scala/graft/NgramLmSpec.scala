package graft

import org.apache.spark.sql.functions._
import graft.ml.NgramLm

/** Reference-LM bigram surprisal: the distributed pipeline must equal
  * an independent single-threaded Stupid Backoff implementation
  * exactly (counts, backoff rule, add-1 unigram smoothing), the
  * backoff path must be live for unseen transitions, and OOV tokens
  * must score finite (q138 gates the same math against DuckDB). */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: plain Scala maps over the same corpus. */
  private def reference(rows: Seq[(Long, String, Boolean)], alpha: Double)
      : Map[Long, (Double, Long, Long)] = {
    def bgs(t: String) = t.split(" ").toSeq.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))).toSeq
    val ref = rows.filter(_._3)
    val cBg = ref.flatMap(r => bgs(r._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cUni = ref.flatMap(_._2.split(" ")).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nTotal = cUni.values.sum
    val v = cUni.size.toLong
    rows.filterNot(_._3).flatMap { case (id, text, _) =>
      val bs = bgs(text)
      if (bs.isEmpty) None
      else {
        val scores = bs.map { case (p, c) =>
          cBg.get((p, c)) match {
            case Some(n) => (n.toDouble / cUni(p), false)
            case None =>
              (alpha * (cUni.getOrElse(c, 0L) + 1L).toDouble / (nTotal + v + 1L), true)
          }
        }
        val mean = scores.map(s => -math.log(s._1)).sum / scores.size
        Some(id -> (math.rint(mean * 1e4) / 1e4,
          scores.size.toLong, scores.count(_._2).toLong))
      }
    }.toMap
  }

  private val vocab = Array("sun", "moon", "tide", "rock", "fern", "dew")

  test("differential vs the single-threaded Stupid Backoff reference on a random corpus; backoff live") {
    val rng = new scala.util.Random(41)
    val rows = (1L to 60L).map { i =>
      val words = Vector.fill(3 + rng.nextInt(12))(vocab(rng.nextInt(vocab.length)))
      // scored docs past 40 mix in tokens the reference never saw
      val text = if (i > 50) (words :+ s"novel$i").mkString(" ")
        else words.mkString(" ")
      (i, text, i <= 40)
    }
    val got = NgramLm.bigramSurprisal(
        rows.toDF("doc_id", "text", "is_ref").repartition(5),
        isRef = col("is_ref"))
      .as[(Long, Double, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = reference(rows, 0.4)
    assert(got === want)
    assert(got.values.exists(_._3 > 0), "backoff path must be live")
    assert(got.values.forall(v => !v._1.isInfinite && !v._1.isNaN),
      "OOV tokens must score finite (add-1 unigram mass)")
  }

  test("a scored doc made ONLY of unseen tokens still scores finite; sub-2-token docs emit nothing") {
    val rows = Seq(
      (1L, "sun moon sun moon", true),
      (2L, "zzz qqq www", false),
      (3L, "solo", false))
    val got = NgramLm.bigramSurprisal(rows.toDF("doc_id", "text", "is_ref"),
        isRef = col("is_ref"))
      .as[(Long, Double, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet === Set(2L))
    assert(got === reference(rows, 0.4))
    // all transitions backed off, none seen
    assert(got(2L)._3 === got(2L)._2)
  }

  test("alpha bounds enforced") {
    val e = intercept[IllegalArgumentException] {
      NgramLm.bigramSurprisal(Seq((1L, "a b", true)).toDF("doc_id", "text", "is_ref"),
        isRef = col("is_ref"), alpha = 0.0)
    }
    assert(e.getMessage.contains("alpha"))
  }
}
