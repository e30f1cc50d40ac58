package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

/** Fluent query facade (SURVEY.md §3.3): the reference's `LogQuery`
  * chainable builder re-expressed over DataFrame. The reference defers
  * state in Python lists and builds on a terminal call
  * (query.py:53-65,235-428); DataFrame is already lazy, but we keep the
  * same deferred-application ORDER — filter → order → select → limit —
  * so ordering on unselected columns works and `count()` skips
  * order/select/limit exactly like the reference (query.py:417-424).
  *
  * Value-pattern filter dispatch (P2, query.py:268-296):
  *  - null          → IS NULL
  *  - Seq(...)      → IN (empty Seq → FALSE)
  *  - "%pat%"       → ILIKE
  *  - "!v"          → !=
  *  - bool/numeric  → =
  *  - other         → = 'toString'
  */
final class LogQuery private (
    source: DataFrame,
    filters: Vector[Column],
    orderCols: Vector[Column],
    selectCols: Vector[String],
    limitN: Option[Int]) {

  private def copy(filters: Vector[Column] = filters,
      orderCols: Vector[Column] = orderCols,
      selectCols: Vector[String] = selectCols,
      limitN: Option[Int] = limitN): LogQuery =
    new LogQuery(source, filters, orderCols, selectCols, limitN)

  // ---- filters (P1-P4) -------------------------------------------------

  def filter(conditions: (String, Any)*): LogQuery =
    copy(filters = filters ++ conditions.map { case (c, v) => LogQuery.condition(c, v) })

  /** Raw SQL condition pass-through (P4 `where`). */
  def where(sql: String): LogQuery = copy(filters = filters :+ expr(sql))

  /** NOT(condition) per kwarg (P3). */
  def exclude(conditions: (String, Any)*): LogQuery =
    copy(filters = filters ++ conditions.map { case (c, v) => !LogQuery.condition(c, v) })

  def select(cols: String*): LogQuery = copy(selectCols = selectCols ++ cols)

  def orderBy(cols: String*): LogQuery =
    copy(orderCols = orderCols ++ cols.map { c =>
      if (c.startsWith("-")) col(c.drop(1)).desc else col(c)
    })

  def limit(n: Int): LogQuery = copy(limitN = Some(n))

  // ---- terminals (build order: filter → order → select → limit) -------

  private def filtered: DataFrame =
    filters.foldLeft(source)((d, f) => d.filter(f))

  def df(): DataFrame = {
    var d = filtered
    if (orderCols.nonEmpty) d = d.orderBy(orderCols: _*)
    if (selectCols.nonEmpty) d = d.select(selectCols.map(col): _*)
    limitN.foreach(n => d = d.limit(n))
    d
  }

  /** Count fast-path: filters only, no order/select/limit
    * (query.py:417-424). */
  def count(): Long = filtered.count()

  def exists(): Boolean = !filtered.isEmpty

  def show(): Unit = df().show(false)

  def explain(): Unit = df().explain("formatted")

  // ---- grouped path (A5/A6) --------------------------------------------

  def groupBy(cols: String*): LogQueryGrouped =
    new LogQueryGrouped(filtered, cols)

  /** group-count ordered desc (A6, query.py:471-484). */
  def valueCounts(c: String): DataFrame =
    filtered.groupBy(col(c)).agg(functions.count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(c))
}

object LogQuery {
  def apply(df: DataFrame): LogQuery =
    new LogQuery(df, Vector.empty, Vector.empty, Vector.empty, None)

  /** The P2 value-pattern dispatch. */
  private[api] def condition(column: String, value: Any): Column = value match {
    case null | None => col(column).isNull
    case Some(v) => condition(column, v)
    case vs: Seq[_] =>
      if (vs.isEmpty) lit(false) else col(column).isin(vs.map(_.toString): _*)
    case s: String if s.startsWith("%") || s.endsWith("%") => col(column).ilike(s)
    case s: String if s.startsWith("!") => col(column) =!= s.drop(1)
    case b: Boolean => col(column) === b
    case n @ (_: Int | _: Long | _: Double | _: Float) => col(column) === n
    case other => col(column) === other.toString
  }
}

/** Grouped aggregation tail of the fluent API (A5, query.py:460-534). */
final class LogQueryGrouped(df: DataFrame, cols: Seq[String]) {
  private def g = df.groupBy(cols.map(col): _*)
  def count(): DataFrame = g.agg(functions.count(lit(1)).as("count"))
  def sum(c: String): DataFrame = g.agg(functions.sum(col(c)).as(s"sum_$c"))
  def avg(c: String): DataFrame = g.agg(functions.avg(col(c)).as(s"avg_$c"))
  def min(c: String): DataFrame = g.agg(functions.min(col(c)).as(s"min_$c"))
  def max(c: String): DataFrame = g.agg(functions.max(col(c)).as(s"max_$c"))
  /** Named aggregate expressions: agg("n" -> "count(*)", "worst" -> "max(severity)"). */
  def agg(named: (String, String)*): DataFrame =
    g.agg(expr(named.head._2).as(named.head._1),
      named.tail.map { case (n, e) => expr(e).as(n) }: _*)
}
