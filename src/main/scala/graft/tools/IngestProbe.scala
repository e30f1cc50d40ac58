package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration probe for the Bench contention control: repeated
  * benchIngest in one JVM to measure control-sample convergence.
  * r11 measurement on an idle box: 9.27 (cold — parser codegen +
  * JIT) → 2.79 → 2.28/2.24/2.35/2.31 steady. Basis for Bench's
  * one-warmup + min-of-two bracket sampling and the 2.4 band floor. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = graft.Bench.getClass.getDeclaredMethods.find(_.getName == "benchIngest").get
    m.setAccessible(true)
    for (i <- 1 to 6) {
      val v = m.invoke(graft.Bench, spark).asInstanceOf[Double]
      println(f"ingest_run_$i: $v%.3f")
    }
    spark.stop()
  }
}
