package graft

import graft.api.{FilterLang, LogQuery}
import graft.store.EventStore
import graft.views.Views
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Fluent API + filter mini-language semantics, mirroring the scenarios
  * of the reference's test_query_filter.py / test_query_api.py. */
class ApiSpec extends SparkSpec {

  lazy val flat = {
    val store = new EventStore(spark, Files.createTempDirectory("api-store").toString)
    Fixtures.populate(store)
    Views.eventsFlat(store).cache()
  }

  test("filter: equality, list->IN, %pattern->ilike, !->not-equal, null") {
    val q = LogQuery(flat)
    assert(q.filter("severity" -> "error").count() === 4)
    assert(q.filter("severity" -> Seq("error", "warning")).count() === 5)
    assert(q.filter("message" -> "%undefined%").count() === 1)
    assert(q.filter("message" -> "%UNDEFINED%").count() === 1) // ilike = case-insensitive
    assert(q.filter("severity" -> "!error").count() === 1)
    assert(q.filter("test_name" -> null).count() === 5)
    assert(q.filter("severity" -> Seq.empty[String]).count() === 0) // empty IN -> FALSE
    assert(q.filter("ref_line" -> 3).count() === 2)
  }

  test("exclude and raw where compose with AND") {
    val q = LogQuery(flat)
    assert(q.exclude("severity" -> "warning").count() === 4)
    assert(q.where("ref_line > 10").count() === 2)
    assert(q.filter("severity" -> "error").where("ref_line < 10").count() === 3)
  }

  test("deferred order: filter -> order -> select -> limit; order on unselected col") {
    val rows = LogQuery(flat)
      .filter("severity" -> "error")
      .orderBy("-ref_line")
      .select("message")   // ref_line NOT selected, ordering still applies
      .limit(2)
      .df().collect()
    assert(rows.length === 2)
    assert(rows.head.getString(0).contains("undefined reference"))
    assert(rows.head.schema.fieldNames.toSeq === Seq("message"))
  }

  test("count() skips order/select/limit (fast path)") {
    val q = LogQuery(flat).filter("severity" -> "error")
      .orderBy("ref_line").select("message").limit(1)
    assert(q.count() === 4)   // limit NOT applied to count
    assert(q.df().count() === 1)
  }

  test("exists and valueCounts") {
    assert(LogQuery(flat).filter("severity" -> "error").exists())
    assert(!LogQuery(flat).filter("severity" -> "nope").exists())
    val vc = LogQuery(flat).valueCounts("severity").collect()
    assert(vc.head.getString(0) === "error" && vc.head.getLong(1) === 4)
  }

  test("grouped aggregations") {
    val c = LogQuery(flat).groupBy("severity").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c("error") === 4 && c("warning") === 1)
    val m = LogQuery(flat).groupBy("severity").max("ref_line")
      .filter(col("severity") === "error").collect().head
    assert(m.getInt(1) === 15)
    val named = LogQuery(flat).groupBy("tool_name")
      .agg("n" -> "count(*)", "files" -> "count(distinct ref_file)")
      .collect().head
    assert(named.getLong(1) === 5 && named.getLong(2) === 3)
  }

  test("filter mini-language: ~, !=, =, comma-IN, precedence") {
    def n(e: String, ic: Boolean = false) =
      flat.filter(FilterLang.parse(e, ic)).count()
    assert(n("severity=error") === 4)
    assert(n("severity=error,warning") === 5)
    assert(n("message~undefined") === 1)
    assert(n("severity!=error") === 1)
    assert(n("severity=ERROR") === 0)
    assert(n("severity=ERROR", ic = true) === 4)       // -i flag
    // ~ checked before != and = : "a~b=c" is ILIKE '%b=c%'
    assert(n("message~';' before") === 2)
  }

  test("mini-language: AND combine, invert, arg split, parse error") {
    val both = FilterLang.parseAll(Seq("severity=error", "ref_file~util")).get
    assert(flat.filter(both).count() === 2)
    val inverted = FilterLang.parseAll(Seq("severity=error"), invert = true).get
    assert(flat.filter(inverted).count() === 1)
    assert(FilterLang.parseAll(Seq.empty).isEmpty)
    val (exprs, files) = FilterLang.splitArgs(Seq("severity=error", "build.log", "msg~x"))
    assert(exprs === Seq("severity=error", "msg~x") && files === Seq("build.log"))
    intercept[FilterLang.ParseError](FilterLang.parse("no-operator-here"))
  }
}
