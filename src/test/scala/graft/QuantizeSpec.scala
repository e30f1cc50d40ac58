package graft

import org.apache.spark.sql.functions._
import graft.ml.{Quantize, Similarity}

/** Int8 embedding quantization: reconstruction error bound, exact
  * zero-vector handling, and the fitness differential — recall@k of
  * the quantized serving path against the float baseline on seeded
  * data. The code/scale arithmetic itself is oracle-gated in q111. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def seededEmbs(n: Int, dim: Int) = {
    val rng = new scala.util.Random(13)
    (0 until n).map { i =>
      (i.toLong, s"l${i % 3}", Array.fill(dim)(rng.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "label", "embedding")
  }

  test("round-trip error bounded by scale/2 per element; codes are int8") {
    val embs = seededEmbs(100, 24)
    val q = Quantize.quantize(embs)
    // schema: codes really are bytes (the 4x storage claim)
    assert(q.schema("q").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType === org.apache.spark.sql.types.ByteType)
    val joined = Quantize.dequantize(q)
      .withColumnRenamed("embedding", "rec")
      .join(embs.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(q.select(col("vec_id"), col("scale")), Seq("vec_id"))
      .select(col("vec_id"), col("scale"),
        aggregate(zip_with(col("embedding"), col("rec"),
          (a, b) => abs(a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"))
      .collect()
    joined.foreach { r =>
      val (scale, err) = (r.getDouble(1), r.getDouble(2))
      // scale/2 plus float-representation slack on the reconstruction
      assert(err <= scale / 2 + 1e-6, s"vec ${r.getLong(0)}: err $err > ${scale / 2}")
    }
  }

  test("all-zero vectors quantize to scale 0 and reconstruct exactly") {
    val embs = Seq((1L, "a", Array(0f, 0f, 0f)), (2L, "a", Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val q = Quantize.quantize(embs).orderBy("vec_id").collect()
    assert(q(0).getDouble(2) === 0.0)
    assert(q(0).getSeq[Byte](3) === Seq[Byte](0, 0, 0))
    // max element always saturates to exactly +/-127
    assert(q(1).getSeq[Byte](3).map(b => math.abs(b.toInt)).max === 127)
    val rec = Quantize.dequantize(Quantize.quantize(embs))
      .orderBy("vec_id").collect()
    assert(rec(0).getSeq[Float](2) === Seq(0f, 0f, 0f))
  }

  test("quantized top-k recall vs the float path >= 0.9 on seeded data") {
    val embs = seededEmbs(200, 16)
    val queries = Similarity.prepared(embs.filter(col("vec_id") < 5))
    val k = 10
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("cand_id"))
        .as[(Long, Long)].collect().groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
    val want = topSets(
      Similarity.bruteForceTopK(queries, Similarity.prepared(embs), k))
    val got = topSets(
      Quantize.topKCosine(Quantize.quantize(embs), embs.filter(col("vec_id") < 5), k))
    val recalls = want.keys.toSeq.map(qid =>
      (want(qid) intersect got.getOrElse(qid, Set.empty)).size.toDouble / k)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@$k $mean (per-query: $recalls)")
    // and the quantized path is deterministic
    val again = topSets(
      Quantize.topKCosine(Quantize.quantize(embs), embs.filter(col("vec_id") < 5), k))
    assert(got === again)
  }
}
