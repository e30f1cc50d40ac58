package graft

import org.apache.spark.sql.functions._
import graft.ml.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Separable synthetic corpus: "good" docs draw from an edu-ish
  // vocabulary, "bad" docs from a spam-ish one, with shared filler so
  // the task isn't trivial for a single token.
  private def corpus(n: Int): Seq[(Long, String, Int)] = {
    val good = Seq("theorem", "analysis", "research", "study", "method",
      "results", "education", "science", "data", "evidence")
    val bad = Seq("click", "buy", "free", "winner", "prize", "offer",
      "deal", "cash", "now", "limited")
    val fill = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val vocab = if (pos) good else bad
      // deterministic pseudo-random-ish token picks from the doc index
      val toks = (0 until 20).map { j =>
        if (j % 3 == 0) fill((i * 7 + j) % fill.size)
        else vocab((i * 13 + j * 5) % vocab.size)
      }
      (i.toLong, toks.mkString(" "), if (pos) 1 else 0)
    }
  }

  test("train separates a labeled sample; literal-coef fold matches MLlib transform") {
    val df = corpus(200).toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(df, buckets = 256, regParam = 1e-4)
    assert(model.coefficients.length === 256)

    val scored = QualityClassifier.score(df, model)
    val acc = scored
      .withColumn("pred", when(col("quality_prob") >= 0.5, 1).otherwise(0))
      .agg(avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"in-sample accuracy $acc below 0.95")

    // Differential: the map-only fold must equal MLlib's own transform
    // probability — same features, same coefficients, two code paths.
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val feats = QualityClassifier.features(df, 256)
      .join(df.select(col("doc_id"), col("label").cast("double").as("label")),
        Seq("doc_id"))
      .select(col("doc_id"), array_to_vector(col("x")).as("features"),
        col("label"))
    val m = new LogisticRegression().setMaxIter(100).setRegParam(1e-4)
      .fit(feats)
    val mdl = QualityClassifier.Model(256, m.intercept, m.coefficients.toArray)
    val mine = QualityClassifier.score(df, mdl)
      .select(col("doc_id"), col("quality_prob"))
    val theirs = m.transform(feats)
      .select(col("doc_id"),
        element_at(vector_to_array(col("probability")), 2).as("p_mllib"))
    val maxDiff = mine.join(theirs, Seq("doc_id"))
      .agg(max(abs(col("quality_prob") - col("p_mllib")))).head().getDouble(0)
    assert(maxDiff < 1e-9, s"fold vs MLlib transform diverge by $maxDiff")
  }

  test("featurization: tf rows sum to 1; empty/whitespace docs get no feature row") {
    val df = Seq((1L, "Alpha beta beta", 1), (2L, "   ", 0), (3L, "", 0))
      .toDF("doc_id", "text", "label")
    val f = QualityClassifier.features(df, 32)
    val rows = f.select(col("doc_id"),
      aggregate(col("x"), lit(0.0), (a, v) => a + v).as("s")).collect()
    assert(rows.map(_.getLong(0)).toSet === Set(1L))
    assert(math.abs(rows.head.getDouble(1) - 1.0) < 1e-12)
  }

  test("score is case-insensitive and empty-safe; save/load round-trips") {
    val model = QualityClassifier.Model(32, 0.25,
      Array.tabulate(32)(i => (i % 5 - 2) * 0.1))
    val df = Seq((1L, "Hello World"), (2L, "hello world"), (3L, ""))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(df, model)
      .select(col("doc_id"), col("margin")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) === out(2L), "lowercasing must unify case variants")
    assert(out(3L) === 0.25, "empty doc margin is the bare intercept")

    val dir = java.nio.file.Files.createTempDirectory("qcmodel").toString
    QualityClassifier.save(spark, model, dir + "/m")
    val back = QualityClassifier.load(spark, dir + "/m")
    assert(back.buckets === model.buckets)
    assert(back.intercept === model.intercept)
    assert(back.coefficients.toSeq === model.coefficients.toSeq)
  }

  test("classifierFilter pipeline stage keeps high-probability docs only") {
    val df = corpus(100).toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(df, buckets = 256, regParam = 1e-4)
    val kept = graft.ml.CorpusPipeline(df.drop("label"))
      .classifierFilter(model, minProb = 0.5)
      .docs.select($"doc_id").as[Long].collect().toSet
    val expect = QualityClassifier.score(df, model)
      .filter(col("quality_prob") >= 0.5)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < 100)
    // the stage does not leak its scratch columns
    val cols = graft.ml.CorpusPipeline(df.drop("label"))
      .classifierFilter(model, 0.5).docs.columns.toSet
    assert(!cols.contains("margin") && !cols.contains("quality_prob"))
  }
}
