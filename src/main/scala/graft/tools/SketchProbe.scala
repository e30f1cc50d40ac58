package graft.tools
import org.apache.spark.sql.SparkSession
object SketchProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[4]").appName("sketchprobe")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
    import spark.implicits._
    val df = (1 to 10000).map(i => (i % 7, s"u${i % 500}", s"b${i % 25}")).toDF("g", "user", "brand")
    df.createOrReplaceTempView("t")
    val fns = spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0))
    println("REGISTERED: " + fns.filter(f => f.contains("hll") || f.contains("top_k") || f.contains("count_min")).sorted.mkString(", "))
    spark.sql("SELECT g, hll_sketch_estimate(hll_sketch_agg(user, 12)) AS d FROM t GROUP BY g ORDER BY g").show(3)
    try {
      spark.sql("SELECT g, approx_top_k(brand, 3, 64) AS tk FROM t GROUP BY g ORDER BY g").show(3, false)
      spark.sql("""SELECT approx_top_k_estimate(approx_top_k_combine(s, 64), 3) FROM
        (SELECT g, approx_top_k_accumulate(brand, 64) AS s FROM t GROUP BY g)""").show(false)
    } catch { case e: Throwable => println("TOPK-FAIL: " + e.toString.take(400)) }
    spark.sql("""SELECT hll_sketch_estimate(hll_union_agg(s, true)) AS total FROM
      (SELECT g, hll_sketch_agg(user, 12) AS s FROM t GROUP BY g)""").show()
    spark.stop()
  }
}
