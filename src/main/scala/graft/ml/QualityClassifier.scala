package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the published classifier-filter recipe
  * (label a bounded sample, train a linear model over hashed
  * bag-of-words features, score the full corpus and keep
  * high-probability documents). Reference behavior frame: the
  * reference engine's scored-SELECT quality surface
  * (/root/reference/src/blq/query.py:77-96) exposes arbitrary scoring
  * expressions over stored tables; the trained-classifier recipe
  * itself is the public method (fastText-style linear model over
  * hashed features).
  *
  * Scale design: TRAINING runs on a bounded labeled sample — dense
  * hashed-TF vectors assembled with native expressions +
  * `array_to_vector` (no custom UDF anywhere), then spark.ml logistic
  * regression; the fitted model collapses to `buckets` doubles + an
  * intercept. SCORING inlines those as a LITERAL array, so the
  * corpus-scale pass is a map-only per-row fold over the token array —
  * zero shuffles, zero UDFs, nothing driver-side, same cost shape as
  * the q61 hash-split. The feature hash is the q61 md5 bucket so a
  * DuckDB oracle can score bit-identically (q117 gates the inference
  * path with integer literal coefficients and exact-integer emission).
  *
  * Featurization contract (shared verbatim by train and score):
  * lowercased single-space tokens, empties dropped; feature
  * x_b = count_b / n_tokens (term frequency) for bucket
  * b = md5_32(token) mod buckets.
  */
object QualityClassifier {

  final case class Model(buckets: Int, intercept: Double,
      coefficients: Array[Double]) {
    require(coefficients.length == buckets,
      s"coefficient length ${coefficients.length} != buckets $buckets")
  }

  /** Lowercased single-space tokens, empties dropped — matches the
    * oracle's string_split(lower(text), ' ') + length(tok) > 0. */
  def toksCol(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > 0)

  /** q61 md5 bucket of one token (cross-engine portable hash). */
  def bucketOf(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** Per-doc dense hashed-TF feature array (x_b = count_b / n_toks),
    * native expressions only. Dense `buckets`-wide rows are a
    * TRAINING-SAMPLE cost, never paid corpus-wide — the corpus path is
    * [[score]]'s fold, which never materializes a vector. */
  def features(docs: DataFrame, buckets: Int): DataFrame = {
    val inst = docs
      .select(col("doc_id"), explode(toksCol(col("text"))).as("tok"))
      .select(col("doc_id"), bucketOf(col("tok"), buckets).as("b"))
    inst.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_arrays(collect_list(col("b")),
        collect_list(col("c"))).as("m"), sum(col("c")).as("n"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit((buckets - 1).toLong)),
          i => coalesce(element_at(col("m"), i), lit(0L)).cast("double")
            / col("n")).as("x"))
  }

  /** Fit a logistic-regression quality model on a labeled sample
    * (doc_id, text, label in {0,1}). The sample is bounded by
    * construction (labeling is the expensive human/LLM step); the fit
    * itself is spark.ml's distributed L-BFGS. */
  def train(labeled: DataFrame, buckets: Int = 1024,
      regParam: Double = 1e-4, maxIter: Int = 100): Model = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val feats = features(labeled.select(col("doc_id"), col("text")), buckets)
      .join(labeled.select(col("doc_id"),
        col("label").cast("double").as("label")), Seq("doc_id"))
      .select(array_to_vector(col("x")).as("features"), col("label"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(feats)
    Model(buckets, m.intercept, m.coefficients.toArray)
  }

  def sigmoid(margin: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-margin))

  /** Corpus-scale scorer: adds `margin` (dot(coef, tf) + intercept)
    * and `quality_prob` (sigmoid). One projection materializes the
    * bucket array (multiply-referenced non-cheap alias — Catalyst
    * keeps it, the TextDedup.tokTable rule), then a single fold; the
    * whole scorer is a per-row expression — no shuffle at 100 TB.
    *
    * Pushdown hazard (measured, q117 r11): filtering on
    * `quality_prob` downstream while ALSO emitting it makes predicate
    * pushdown re-materialize the whole tokenize+md5+fold inside the
    * Filter — twice the work, and below any repartition. Either drop
    * the score columns after filtering ([[CorpusPipeline.classifierFilter]]
    * does — the projection prunes the second copy) or pre-filter
    * empty docs on the md5-free [[toksCol]] size. */
  def score(docs: DataFrame, model: Model,
      textCol: String = "text"): DataFrame = {
    val cArr = array(model.coefficients.toIndexedSeq.map(lit): _*)
    docs
      .withColumn("__qc_b",
        transform(toksCol(col(textCol)),
          t => bucketOf(t, model.buckets).cast("int")))
      .withColumn("margin",
        aggregate(col("__qc_b"), lit(0.0),
          (acc, b) => acc + element_at(cArr, b + 1))
          / greatest(size(col("__qc_b")), lit(1))
          + lit(model.intercept))
      .withColumn("quality_prob", sigmoid(col("margin")))
      .drop("__qc_b")
  }

  /** Persist/restore a fitted model (one tiny parquet row). */
  def save(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    Seq((model.buckets, model.intercept, model.coefficients.toSeq))
      .toDF("buckets", "intercept", "coefficients")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Model = {
    val r = spark.read.parquet(path).head()
    Model(r.getAs[Int]("buckets"), r.getAs[Double]("intercept"),
      r.getAs[Seq[Double]]("coefficients").toArray)
  }
}
