package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end CorpusPipeline timing over a ScaleGen corpus — the
  * "whole corpus build" number SCALING.md cites, as opposed to the
  * per-operator times graft.Bench measures. Runs the full C4-shaped
  * chain (quality → span dedup → exact → near-dedup → decontaminate →
  * mixture → split) and prints the per-stage retention/timing report
  * plus one JSON total.
  *
  * The eval set for the decontamination stage is the corpus's own
  * first 20 documents (deterministic, scale-independent definition —
  * a real pipeline would pass its benchmark suite here).
  *
  * Usage: runMain graft.tools.PipelineBench <sfDir> [ckpt] [budget=N]
  * (`ckpt` = durable parquet stage tables instead of localCheckpoint —
  * measures the restartable mode's write overhead; `budget=N` swaps
  * the langMixture stage for budgetMixture(N) — the token-budget-
  * constrained form, r10.)
  */
object PipelineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val durable = args.contains("ckpt")
    val budget = args.collectFirst {
      case a if a.startsWith("budget=") => a.stripPrefix("budget=").toLong }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val evalSet = docs.filter(col("doc_id") < 20).select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val base =
      if (durable)
        graft.ml.CorpusPipeline.checkpointed(docs,
          java.nio.file.Files.createTempDirectory("pipe_ckpt").toString)
      else graft.ml.CorpusPipeline(docs)
    val mid = base
      .qualityFilter(0.3)
      .spanDedup(k = 5, dfMax = 3)
      .exactDedup()
      .nearDedup(n = 3, k = 12, bands = 4, threshold = 0.3, minAgree = 5)
      .containmentDedup(n = 4, threshold = 0.8)
      .decontaminate(evalSet, n = 4, expectedEvalGrams = 10000)
      .chunk(sizeTokens = 32, stride = 24)
    val p = budget.fold(mid.langMixture(alpha = 0.5))(
      n => mid.budgetMixture(n, alpha = 0.5))
      .split()
    val total = (System.nanoTime() - t0) / 1e9
    println(p.report)
    println(s"""{"sf":"$sfDir","mode":"${if (durable) "ckpt" else "mem"}",""" +
      s""""pipeline_total_sec":${math.rint(total * 100) / 100},""" +
      s""""docs_in":${p.stats.head.docsIn},"docs_out":${p.stats.last.docsOut}}""")
    spark.stop()
  }
}
