package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mechanism experiment for the lex_probe_warm growth (the r9/r10
  * sweeps' one still-growing index metric, 2.7× at 30×): the probe's
  * query-vocabulary IN filter exceeds
  * `spark.sql.parquet.pushdown.inFilterThreshold` (default 10), so
  * the parquet-pushed form degrades to a [min(vocab), max(vocab)]
  * range — which spans essentially the whole term domain of a
  * term-sorted postings file, prunes nothing, and makes every warm
  * probe a full postings scan (linear in corpus size). Raising the
  * threshold pushes the real value SET, and sorted row groups prune
  * by min/max + dictionary.
  *
  * Usage: runMain graft.tools.LexProbeExp <sfDir> [reps]
  * Interleaves warm probes at threshold=default vs threshold=4096 in
  * one session (AbBench protocol) and prints one JSON line plus the
  * pushed-filter excerpt from each plan.
  */
object LexProbeExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count()
    val dir = java.nio.file.Files.createTempDirectory("lexprobe_exp").toString
    graft.ml.LexIndex.build(docs, dir)

    val thrKey = "spark.sql.parquet.pushdown.inFilterThreshold"
    def probe(): Long =
      graft.ml.LexIndex.probeIndexed(spark, dir, col("doc_id") < 5, 5).count()
    def at(thr: Int)(): Double = {
      spark.conf.set(thrKey, thr)
      val t0 = System.nanoTime(); probe(); (System.nanoTime() - t0) / 1e9
    }
    // vocab size of the query set (context for the threshold)
    val vocabN = graft.ml.LexIndex
      .probeIndexed(spark, dir, col("doc_id") < 5, 100000)
      .count() // warm the cache; vocab reported from postings below
    val qvocab = spark.read.parquet(s"$dir/postings")
      .filter(col("doc_id") < 5).select(col("term")).distinct().count()
    val idxVocab = spark.read.parquet(s"$dir/postings")
      .select(col("term")).distinct().count()
    // Decomposition + plan-shape variants (r11): the warm probe's
    // matched volume is corpus-sized when query docs carry corpus-
    // frequent terms (warm_k below), and the shipped single-shuffle
    // plan repartitions those partials into |queries| partitions —
    // parallelism collapses to the query count for the agg AND the
    // window. The two-shuffle shape keeps the (query,doc) agg at full
    // parallelism and lets WindowGroupLimit bound the second exchange
    // to k rows per partition per query.
    import org.apache.spark.sql.expressions.Window
    val stats = spark.read.parquet(s"$dir/stats")
      .select(col("avgdl"), col("n_docs")).head()
    val (avgdl, nDocs) = (stats.getDouble(0), stats.getLong(1))
    val (k1c, bc) = (1.2, 0.75)
    import spark.implicits._
    val qlocal = spark.read.parquet(s"$dir/postings")
      .filter(col("doc_id") < 5)
      .select(col("doc_id").cast("long"), col("term").cast("string"))
      .as[(Long, String)].collect().toSeq
    val vocabL = qlocal.map(_._2).distinct
    def matchedScored() = {
      val qdf = qlocal.toDF("query_id", "term")
      spark.read.parquet(s"$dir/postings")
        .filter(col("term").isin(vocabL: _*))
        .join(broadcast(qdf), Seq("term"))
        .withColumn("idf",
          log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("c",
          col("idf") * col("tf") * (k1c + 1.0) /
            (col("tf") + lit(k1c) * (lit(1.0 - bc) + lit(bc) * col("dl") / lit(avgdl))))
    }
    def timed(f: () => Long)(): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    val scanOnly = timed(() => matchedScored().count()) _
    val twoShuffle = timed { () =>
      val w = Window.partitionBy(col("query_id"))
        .orderBy(round(col("score"), 6).desc, col("doc_id"))
      matchedScored()
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("c")).as("score"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .count()
    } _
    val variants = Seq("thr_default" -> at(10) _, "thr_4096" -> at(4096) _,
      "scan_only" -> scanOnly, "two_shuffle" -> twoShuffle)
    variants.foreach { case (_, f) => f() } // warmup both paths
    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, f) <- variants)
      times(name) = times(name) :+ f()
    val parts = variants.map { case (name, _) =>
      val ts = times(name).sorted
      f""""$name":{"min":${ts.head}%.4f,"med":${ts(ts.size / 2)}%.4f}"""
    }
    println(s"""{"sf":"$sfDir","reps":$reps,"query_vocab":$qvocab,""" +
      s""""index_vocab":$idxVocab,${parts.mkString(",")},"warm_k":$vocabN}""")
    spark.stop()
  }
}
