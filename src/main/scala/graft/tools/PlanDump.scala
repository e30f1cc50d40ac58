package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only formatted-plan dumper (r19 optimization round): writes
  * `explain("formatted")` output for every SparkEntry query to
  * <outDir>/<name>.txt, so plan-shape claims (Exchange count, join
  * strategy, PushedFilters/ReadSchema) are checkable files instead of
  * terminal scrollback. Complements [[Explain]] (which prints the
  * pre-AQE sparkPlan to stdout for quick greps). Not part of the
  * driver contract.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [nameRegex]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val re = if (args.length > 2) args(2) else ".*"
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
        if name.matches(re)) {
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), plan)
        println(s"dumped $name")
      } catch { case e: Throwable =>
        println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
