package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.ml.TextDedup

// scratch profiling main — not part of the library (deleted after use)
object ProfileQ31 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }
    val docs = t(spark, dir, "documents")
    println("docs=" + docs.count())
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      time("shingleKeyTable") { TextDedup.shingleKeyTable(docs, 3).count() }
      val sh = TextDedup.shingleKeyTable(docs, 3)
      val postings = sh.groupBy(col("shingle"))
        .agg(collect_list(col("doc_id")).as("docs"))
        .filter(size(col("docs")) <= 50)
      time("postings (no persist)") { postings.count() }
      val p2 = postings.persist()
      time("postings persist+count") { p2.count() }
      time("sizes from persisted") {
        p2.select(explode(col("docs")).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1))).count()
      }
      val sorted = col("docs_s")
      time("pairs from persisted") {
        p2.filter(size(col("docs")) >= 2)
          .select(array_sort(col("docs")).as("docs_s"))
          .select(explode_outer(flatten(transform(sorted, (a, i) =>
            transform(slice(sorted, i + lit(2), size(sorted)),
              b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("shared")).count()
      }
      time("pairs packed-long") {
        p2.filter(size(col("docs")) >= 2)
          .select(array_sort(col("docs")).as("docs_s"))
          .select(explode_outer(flatten(transform(sorted, (a, i) =>
            transform(slice(sorted, i + lit(2), size(sorted)),
              b => a * lit(4294967296L) + b)))).as("pk"))
          .groupBy(col("pk"))
          .agg(count(lit(1)).as("shared")).count()
      }
      time("pairs no-sort least/greatest") {
        p2.filter(size(col("docs")) >= 2)
          .select(col("docs").as("docs_s"))
          .select(explode_outer(flatten(transform(sorted, (a, i) =>
            transform(slice(sorted, i + lit(2), size(sorted)),
              b => least(a, b) * lit(4294967296L) + greatest(a, b))))).as("pk"))
          .groupBy(col("pk"))
          .agg(count(lit(1)).as("shared")).count()
      }
      time("full q31") {
        TextDedup.jaccardPairsPostings(docs, 3, 0.3, 50).count()
      }
      p2.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
