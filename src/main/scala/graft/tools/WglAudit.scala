package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot plan audit (r11): does InferWindowGroupLimit bound the
  * rank windows of the OTHER index probes (Ivf.topK, IvfIndex.probe,
  * Similarity top-k) before their hash(query_id) exchange? LexIndex
  * needed an explicit two-shuffle rewrite because its (query,doc)
  * aggregation sits between the join and the window, blocking the
  * partial group-limit; the pure join→window probes should get the
  * partial WindowGroupLimit for free. */
object WglAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
    val df = graft.ml.Ivf.topK(vecs, isQuery = _ < 5,
      k = 5, cells = 8, iters = 1, nprobe = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    println("IVF_TOPK_WGL=" + "WindowGroupLimit".r.findAllIn(plan).size)
    println(plan)
    spark.stop()
  }
}
