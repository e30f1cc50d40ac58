package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Tables.t

/** Dev-only micro-profiler for the dedup pipelines: times each stage of
  * q31/q32 separately so optimization targets the measured hot spot
  * instead of the guessed one. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n1 = f
      val t1 = System.nanoTime(); val n2 = f
      val t2 = System.nanoTime()
      println(f"$name%-28s run1=${(t1 - t0) / 1e9}%6.2fs run2=${(t2 - t1) / 1e9}%6.2fs rows=$n2")
      // measurements must not depend on earlier stages' persisted
      // frames piling up (the same pollution Bench clears between
      // queries); run 2 above still reuses run 1's cache
      spark.catalog.clearCache()
    }

    val docs = t(spark, sfDir, "documents")
    docs.count() // warmup scan

    time("docs_scan") { t(spark, sfDir, "documents").count() }
    time("shingleSets") { graft.ml.TextDedup.shingleSets(t(spark, sfDir, "documents"), 3).count() }
    time("shingleTable(explode)") { graft.ml.TextDedup.shingleTable(t(spark, sfDir, "documents"), 3).count() }
    time("minhashSignatures") {
      graft.ml.TextDedup.minhashSignatures(
        graft.ml.TextDedup.shingleSets(t(spark, sfDir, "documents"), 3), 12).count()
    }
    time("lshBands") {
      graft.ml.TextDedup.lshBands(graft.ml.TextDedup.minhashSignatures(
        graft.ml.TextDedup.shingleSets(t(spark, sfDir, "documents"), 3), 12), 4, 3).count()
    }
    time("q31_full") {
      graft.ml.TextDedup.jaccardPairs(t(spark, sfDir, "documents"), 3, 0.3, 50)
        .orderBy(col("doc_a"), col("doc_b")).count()
    }
    time("q31_no_orderby") {
      graft.ml.TextDedup.jaccardPairs(t(spark, sfDir, "documents"), 3, 0.3, 50).count()
    }
    time("q31_postings") {
      graft.ml.TextDedup.jaccardPairsPostings(t(spark, sfDir, "documents"), 3, 0.3, 50).count()
    }
    time("q32_full") {
      graft.ml.TextDedup.minhashLshPairs(t(spark, sfDir, "documents"), 3, 12, 4, 0.3)
        .orderBy(col("doc_a"), col("doc_b")).count()
    }
    time("q51_full") {
      graft.SparkEntry.queries("q51_dedup_clusters")(spark, sfDir).count()
    }

    // Plan inspection: does count() eliminate the trailing sort, and how
    // many exchanges does q31 run?
    val q31 = graft.ml.TextDedup.jaccardPairs(t(spark, sfDir, "documents"), 3, 0.3, 50)
      .orderBy(col("doc_a"), col("doc_b"))
    println("=== q31.count() optimized plan ===")
    println(q31.groupBy().count().queryExecution.optimizedPlan.treeString.take(4000))
    println("=== q31 formatted physical ===")
    println(q31.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")).take(6000))
    spark.stop()
  }
}
