package graft

import org.apache.spark.sql.functions._
import graft.ml.Decontaminate

/** Differential spec for the bloom-screened decontamination path:
  * screened() must equal exact() verbatim (no false negatives by Bloom
  * construction; false positives die in the exact join), while the
  * screen itself must actually reject the clean majority of train
  * grams before any shuffle.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // 3 eval docs + 17 train docs; train docs 20/21 plagiarize eval doc
  // 0's text, train 22 shares a phrase with eval 1, the rest are
  // clean (distinct numbered filler so no accidental 3-gram overlap).
  private def corpus = {
    val eval = Seq(
      0L -> "the standard benchmark question about gravity and light",
      1L -> "name the capital city of every country in europe",
      2L -> "compute the integral of x squared over the interval")
    val contaminated = Seq(
      20L -> "the standard benchmark question about gravity and light copied verbatim",
      21L -> "prefix words then the standard benchmark question about gravity appears",
      22L -> "quiz name the capital city of every country now")
    val clean = (30L to 43L).map(i =>
      i -> s"clean document number $i filler${i}a filler${i}b filler${i}c filler${i}d")
    (eval ++ contaminated ++ clean).toDF("doc_id", "text")
  }

  private val isEval = col("doc_id") < 10

  test("bloom-screened decontamination equals the exact inverted-index form") {
    val exact = Decontaminate.exact(corpus, isEval, n = 3)
      .as[(Long, Long, Long)].collect().toSet
    val screened = Decontaminate.screened(corpus, isEval, n = 3,
      expectedEvalGrams = 100, fpp = 0.01)
      .as[(Long, Long, Long)].collect().toSet
    assert(screened === exact)
    assert(exact.map(_._1) === Set(20L, 21L, 22L)) // the planted contamination
  }

  test("identical results at a sloppy fpp (false positives die in the join)") {
    val exact = Decontaminate.exact(corpus, isEval, n = 3)
      .as[(Long, Long, Long)].collect().toSet
    val sloppy = Decontaminate.screened(corpus, isEval, n = 3,
      expectedEvalGrams = 10, fpp = 0.5) // undersized + high fpp
      .as[(Long, Long, Long)].collect().toSet
    assert(sloppy === exact)
  }

  test("the screen rejects most clean train grams before the join") {
    val sh = graft.ml.TextDedup.shingleKeyTable(corpus, 3)
      .join(corpus.select(col("doc_id"), isEval.as("is_eval")), Seq("doc_id"))
    val evalKeys = sh.filter(col("is_eval")).select(col("shingle")).distinct()
    val bloom = Decontaminate.bloomOf(evalKeys, "shingle",
      expectedItems = 100, fpp = 0.01)
    val train = sh.filter(!col("is_eval"))
    val total = train.count()
    val admitted = train
      .filter(Decontaminate.mightContain(bloom, col("shingle"))).count()
    // true shared grams are ~13 of ~140 train gram rows; at fpp=0.01
    // the admitted count must stay well under half the stream
    assert(admitted < total / 2, s"screen admitted $admitted of $total")
    assert(admitted > 0)
  }

  test("might_contain survives a filter built empty (no eval grams)") {
    val noEval = Decontaminate.screened(corpus, col("doc_id") < 0, n = 3,
      expectedEvalGrams = 10, fpp = 0.01)
    assert(noEval.count() === 0)
    // the natural sizing for an empty eval set is ZERO expected grams;
    // BloomFilter.create requires a positive count, so the empty
    // guard must clamp rather than throw
    val zeroSized = Decontaminate.screened(corpus, col("doc_id") < 0, n = 3,
      expectedEvalGrams = 0, fpp = 0.01)
    assert(zeroSized.count() === 0)
  }

  test("streaming screen: micro-batches flagged against a prebuilt eval index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val index = Decontaminate.indexEval(corpus.filter(isEval), n = 3,
      expectedGrams = 100)

    // static batch first: equals the batch operator's verdict
    val batch = Seq(
      50L -> "the standard benchmark question about gravity quoted again",
      51L -> "wholly original writing with no benchmark overlap at all")
      .toDF("doc_id", "text")
    val static = Decontaminate.screenBatch(batch, index, n = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(static.map(_._1) === Set(50L))

    // end-to-end through a streaming query: two micro-batches
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.Map[Long, Set[Long]]()
    val q = Decontaminate.runStream(
      input.toDF().toDF("doc_id", "text"), index, n = 3) { (batchId, flagged) =>
      collected.synchronized {
        collected(batchId) = flagged.collect().map(_.getLong(0)).toSet
      }
    }
    try {
      input.addData(50L ->
        "the standard benchmark question about gravity quoted once more")
      q.processAllAvailable()
      input.addData(
        51L -> "nothing remotely evaluation flavored in this batch text",
        52L -> "compute the integral of x squared over the interval verbatim")
      q.processAllAvailable()
    } finally q.stop()
    assert(collected(0L) === Set(50L))
    assert(collected(1L) === Set(52L))
  }
}
