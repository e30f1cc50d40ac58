package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Analytic-window and reshaping operators beyond the reference's
  * surface (SURVEY.md §2.5 notes the reference has no frame specs or
  * lead/lag): lag deltas, running sums, pivot, grouping sets — all
  * partition-scoped windows (never global) with exact DuckDB oracles.
  */
object WindowQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // lead/lag: per-user inter-event gap in ms. Partition-scoped sort,
    // no global window.
    "q44_lag_delta" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
        .select(col("user_id"), col("event_id"),
          (unix_millis(col("ts")) - col("prev_ms")).as("gap_ms"))
        .filter(col("gap_ms").isNotNull)
        .orderBy(col("user_id"), col("event_id"))
    },

    // running frame aggregate: cumulative order value per customer
    // (rows unbounded preceding). Frame spec the reference lacks.
    "q45_running_sum" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("cum_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // pivot: severity-like event_type counts per user as columns.
    // Expressed as conditional aggregation in BOTH engines so the
    // result is deterministic and portable (native PIVOT emits the
    // same plan shape).
    "q46_pivot" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
        .orderBy(col("user_id"))
    },

    // GROUPING SETS with grouping_id to tell subtotal rows apart from
    // genuine NULL groups.
    "q47_grouping_sets" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"), col("gid"))
        .orderBy(col("gid"), col("status"), col("prio"))
    })

  val oracles: Map[String, String] = Map(
    "q44_lag_delta" ->
      """SELECT user_id, event_id, gap_ms FROM (
        |  SELECT user_id, event_id,
        |    epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        |  FROM events) sub
        |WHERE gap_ms IS NOT NULL ORDER BY user_id, event_id""".stripMargin,
    "q45_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q46_pivot" ->
      """SELECT user_id,
        | count(*) FILTER (WHERE event_type = 'click') AS n_click,
        | count(*) FILTER (WHERE event_type = 'view') AS n_view,
        | count(*) FILTER (WHERE event_type = 'error') AS n_error,
        | count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q47_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        | coalesce(o_orderpriority, 'ALL') AS prio,
        | count(*) AS n, grouping(o_orderstatus, o_orderpriority) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY gid, status, prio""".stripMargin)
}
