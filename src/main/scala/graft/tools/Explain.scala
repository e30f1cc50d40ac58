package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dumper: prints the pre-AQE physical plan of named
  * SparkEntry queries at a chosen data dir, so scale-dependent shape
  * picks (Tables.attachSide, Ivf.probeShaped, LexIndex.probeLocal)
  * can be read directly instead of inferred from timings. Not part of
  * the driver contract.
  *
  * Usage: runMain graft.tools.Explain <sfDir> <nameRegex> [grep]
  * With [grep], prints only plan lines matching the pattern (e.g.
  * "Join|Exchange" for join strategy + shuffle audit).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val re = if (args.length > 1) args(1) else ".*"
    val lineRe = if (args.length > 2) Some(args(2).r) else None
    val spark = graft.Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
        if name.matches(re)) {
      val plan = fn(spark, sfDir).queryExecution.sparkPlan.toString()
      println(s"==== $name @ $sfDir")
      lineRe match {
        case Some(r) =>
          plan.linesIterator.filter(l => r.findFirstIn(l).isDefined)
            .foreach(println)
        case None => println(plan)
      }
    }
    spark.stop()
  }
}
