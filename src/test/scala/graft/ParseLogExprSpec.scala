package graft

import org.apache.spark.sql.SparkSession
import graft.plans.{GraftExtensions, ParseLog}

/** Specs for the parse_log Catalyst generator + session extensions. */
class ParseLogExprSpec extends SparkSpec {
  import spark.implicits._

  private val gccLog =
    "src/main.c:15:5: error: expected ';'\njunk\nsrc/util.c:3:1: warning: unused variable 'x'"

  test("parse_log generator: LATERAL VIEW over content column") {
    ParseLog.register(spark)
    Seq(("f1.log", gccLog), ("f2.log", "no diagnostics here"))
      .toDF("log_file", "content").createOrReplaceTempView("logs_t")
    val rows = spark.sql(
      """SELECT l.log_file, p.severity, p.ref_file, p.ref_line, p.message
        |FROM logs_t l LATERAL VIEW parse_log(l.content, 'gcc_text') p
        |ORDER BY l.log_file, p.event_index""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(1)).toSeq === Seq("error", "warning"))
    assert(rows.head.getString(2) === "src/main.c")
    assert(rows.head.getInt(3) === 15)
  }

  test("parse_log: single-arg form auto-detects; null content yields no rows") {
    ParseLog.register(spark)
    Seq(Option(gccLog), Option.empty[String]).toDF("content")
      .createOrReplaceTempView("logs_auto_t")
    val rows = spark.sql(
      """SELECT p.tool_name, p.severity
        |FROM logs_auto_t LATERAL VIEW parse_log(content) p""".stripMargin).collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).toSet === Set("gcc"))
  }

  test("parse_log: type mismatch is an analysis error") {
    ParseLog.register(spark)
    Seq(1).toDF("n").createOrReplaceTempView("nums_t")
    val e = intercept[Exception] {
      spark.sql("SELECT p.* FROM nums_t LATERAL VIEW parse_log(n) p").collect()
    }
    assert(e.getMessage.toLowerCase.contains("parse_log") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("GraftExtensions wires parse_log into a fresh session") {
    // spark.sql.extensions is a static conf read at SparkContext
    // creation, so a second same-JVM session cannot pick it up from
    // builder options — withExtensions() is the public API that applies
    // the same class explicitly. Never stop s2: the context is shared.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark)
      import s2.implicits._
      Seq(gccLog).toDF("content").createOrReplaceTempView("ext_logs_t")
      val n = s2.sql(
        "SELECT p.* FROM ext_logs_t LATERAL VIEW parse_log(content, 'auto') p").count()
      assert(n === 2)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
