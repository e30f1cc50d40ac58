package graft

import org.apache.spark.sql.SparkSession

/** Runnable end-to-end showcase: `sbt "runMain graft.Demo"`.
  * Executes two fake builds through the full pipeline (subprocess →
  * live capture → parse → fingerprint → partitioned store), then
  * exercises the analytics surface: report, diff, CI gate, SQL with
  * parse_log, fluent query.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Tables.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val g = GraftEngine(spark, root)

    println("== run 1: failing build ==")
    val r1 = g.exec(Seq("sh", "-c",
      "printf 'src/main.c:15:5: error: expected semicolon\\n" +
        "src/util.c:3:1: warning: unused variable x\\n" +
        "src/main.c:40:2: error: undefined reference to foo\\n'; exit 1"),
      tag = Some("build"), sourceName = Some("cc"), formatHint = "gcc_text")
    println(s"   status=${r1.status} errors=${r1.errors} warnings=${r1.warnings}")

    println("== run 2: one error fixed, one new ==")
    val r2 = g.exec(Seq("sh", "-c",
      "printf 'src/main.c:15:5: error: expected semicolon\\n" +
        "src/new.c:7:1: error: implicit declaration of bar\\n'; exit 1"),
      tag = Some("build"), sourceName = Some("cc"), formatHint = "gcc_text")
    println(s"   status=${r2.status} errors=${r2.errors}")

    println("\n== report ==")
    println(g.analytics.report())

    println("== fingerprint diff run1 -> run2 ==")
    println(g.show(g.analytics.fingerprintDiff(r1.runSerial, r2.runSerial)))

    println("\n== CI gate (run2 vs run1 baseline) ==")
    println(new graft.exec.CiGate(g.analytics).check(r1.runSerial, r2.runSerial))

    println("\n== SQL surface with parse_log ==")
    g.sql(
      """SELECT p.severity, p.ref_file, p.ref_line, p.message
        |FROM (SELECT 'a.py:1: error: bad type  [assignment]' AS c)
        |LATERAL VIEW parse_log(c, 'mypy_text') p""".stripMargin).show(false)

    println("== fluent query: errors in main.c ==")
    g.query.filter("severity" -> "error", "ref_file" -> "%main%")
      .orderBy("event_timestamp").limit(5).df()
      .select("ref", "location", "message").show(false)

    println("== bulk ingest: a directory of mixed-format logs, one job ==")
    val logDir = java.nio.file.Files.createTempDirectory("demo_logs")
    java.nio.file.Files.writeString(logDir.resolve("pylint.log"),
      "app/models.py:42:8: E1101: Instance of 'User' has no 'emial' member (no-member)\n")
    java.nio.file.Files.writeString(logDir.resolve("cargo.log"),
      "error[E0308]: mismatched types\n --> src/main.rs:4:5\n")
    val bulk = g.importDirectory(s"$logDir/*.log")
    println(s"   status=${bulk.status} errors=${bulk.errors} (auto-detected per file)")

    println("\n== MCP-style serving surface ==")
    val serve = new graft.api.Serve(g)
    println("   tools: " + serve.tools.mkString(", "))
    println("   ci_check -> " + serve.call("ci_check",
      Map("baseline" -> r1.runSerial.toString, "candidate" -> r2.runSerial.toString)))

    spark.stop()
  }
}
