package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Core relational operator inventory (SURVEY.md §2.2-§2.7) expressed as
  * driver-checkable queries over the TESTDATA tables.
  *
  * Conventions (required by the driver's DuckDB-oracle hash compare):
  *  - every aggregate / computed column is aliased identically in the
  *    Spark code and the oracle SQL;
  *  - floating-point aggregates are `round`-ed (sum→2dp, avg→4dp) so both
  *    engines land on the same decimal despite different summation order;
  *  - every result ends with a deterministic ORDER BY (full tie-break);
  *  - raw event timestamps (events.ts) are never emitted — the physical
  *    parquet type has varied across testdata generations (TIMESTAMP
  *    NANOS, then MICROS/NTZ; `Tables.t` normalizes both to µs
  *    TimestampType) and the two engines can disagree on precision or
  *    zone rendering; we emit epoch_ms / dates / extracted fields,
  *    which are precision- and zone-portable.
  *
  * Scale notes are on each query: the plan shape we want at 100 TB, not
  * just what passes at sf0.01.
  */
object CoreQueries {

  /** Shared scan for q15/q16: error events grouped on the (user, k)
    * set key with month-half membership flags — one events pass, JSON
    * parsed once, one shuffle; the set ops become flag predicates. */
  private def halfMembership(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "error")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        (dayofmonth(col("ts")) <= 15).as("h1"))
      .groupBy(col("user_id"), col("k"))
      .agg(max(col("h1")).as("a"), max(!col("h1")).as("b"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1: grouped rollup with filtered input (TPC-H Q1 shape).
    // Scale: single shuffle on the group keys with map-side partial agg;
    // shipdate predicate pushed to the parquet scan.
    // Money sums follow the q71 cents contract (integer-scaled units,
    // one division at emission): the float-product sum diverged from
    // the oracle in the LAST CENT at sf1 (26792087102.88 vs .89 —
    // accumulation-order rounding over 6M terms), caught only by the
    // 1000×-span parity sweep. avg_disc likewise accumulates exact
    // integer percents; qty is integral so its double sums are exact.
    "q01_pricing_summary" -> { (s, dir) =>
      val epCents = round(col("l_extendedprice") * 100, 0).cast("long")
      val discPct = round(col("l_discount") * 100, 0).cast("long")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(epCents) / lit(100.0), 2).as("sum_base_price"),
          round(sum(epCents * (lit(100L) - discPct)) / lit(10000.0), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(sum(discPct) / count(lit(1)) / lit(100.0), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // A1/A2: COUNT FILTER + COUNT(DISTINCT) per group
    // (reference: bird_schema.sql:433-465 per-run rollup).
    // Scale: countDistinct forces an expand+two-phase agg; fine on low-
    // cardinality groups. approx_count_distinct is the 100 TB variant.
    "q02_event_rollup" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("value") > 100, 1)).as("n_high"),
          countDistinct(col("user_id")).as("n_users"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("event_type"))
    },

    // A12/O1: top-N by aggregate (errors-by-file shape → TakeOrdered).
    "q03_top_customers" -> { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          round(sum(col("o_totalprice")), 2).as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("o_custkey"))
        .limit(10)
    },

    // J1: the flat-view join chain (events ⋈ invocations analog), with
    // every dimension broadcast — no shuffle for the dim sides at scale.
    "q04_region_revenue" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val o  = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val c  = t(s, dir, "customer")
      val n  = t(s, dir, "nation")
      val r  = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        // q71 cents contract (r12): ~120k float products per group at
        // sf1 is the q01 risk class — sum exact e4 integers, divide
        // once at emission. Small-group money sums elsewhere
        // (q03/q45/q65) keep the float form: term counts are bounded
        // and 4-scale-point parity holds.
        .agg(
          round(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
            (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))) /
            lit(10000.0), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // J2: LEFT join + status-from-nullness (attempts⟕outcomes analog,
    // reference bird_schema.sql:371-406).
    "q05_order_status" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val liAgg = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      o.join(liAgg, o("o_orderkey") === liAgg("l_orderkey"), "left")
        .select(
          col("o_orderkey"),
          coalesce(col("n_items"), lit(0L)).as("n_items"),
          when(col("n_items").isNull, "pending")
            .when(col("n_items") >= 5, "large")
            .otherwise("small").as("status"))
        .orderBy(col("o_orderkey"))
    },

    // J5: anti join (NOT EXISTS — "running attempts without an outcome",
    // bird_schema.sql:640-652). shuffle_hash hint (r10): AQE broadcasts
    // the 600k-key lineitem side here, and building that hash relation
    // is a single-threaded driver-side cost — the r10 AbBench
    // decomposition measured the whole query ≈ the anti join alone,
    // with shuffle-hash 25-30% faster in-session (0.35/0.46 vs
    // 0.48/0.62 min/med). At scale both sides are fact-sized and the
    // join shuffles regardless, so the hint states the honest plan.
    "q06_orders_no_items" -> { (s, dir) =>
      val o  = t(s, dir, "orders")
      val li = t(s, dir, "lineitem").hint("shuffle_hash")
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // J6: semi join (EXISTS).
    "q07_customers_with_f_orders" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // J4: run-diff FULL OUTER with COALESCE both sides + delta
    // (reference schema.sql:261-283 blq_diff).
    "q08_event_diff" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val a = ev.filter(dayofmonth(col("ts")) <= 15)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_before"))
      val b = ev.filter(dayofmonth(col("ts")) > 15)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_after"))
      a.join(b, Seq("event_type"), "full_outer")
        .select(
          col("event_type"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"),
          (coalesce(col("n_after"), lit(0L)) - coalesce(col("n_before"), lit(0L))).as("delta"))
        .orderBy(col("event_type"))
    },

    // W2: latest-per-key (QUALIFY row_number()=1, schema.sql:94).
    // Scale: shuffle on user_id only; per-partition sort, no global sort.
    "q09_latest_event_per_user" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"))
        .orderBy(col("user_id"))
    },

    // W1: global run_serial numbering (bird_schema.sql:288-295). The one
    // scale-hostile construct: ROW_NUMBER over a single partition. Kept
    // here for parity; the store assigns serials at WRITE time instead
    // (see graft.store.EventStore) so reads never need a global window.
    "q10_run_serial" -> { (s, dir) =>
      val w = Window.orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), row_number().over(w).as("run_serial"))
        .orderBy(col("event_id"))
    },

    // J9 as a window frame: grep-context — keep rows within ±2 rows of a
    // match (bird_schema.sql:825-850), the idiomatic Spark form of the
    // reference's EXISTS-BETWEEN join.
    "q11_grep_context" -> { (s, dir) =>
      val isMatch = when(col("event_type") === "error", 1).otherwise(0)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 2)
      t(s, dir, "events")
        .withColumn("is_match", isMatch)
        .withColumn("near", max(col("is_match")).over(w))
        .filter(col("near") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"), col("is_match"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // A6: value_counts (query.py:471-484).
    "q12_value_counts" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("lang"))
    },

    // W3: keep-newest-N prune — rows ranked past the keep horizon
    // (storage.py:660-673).
    "q13_prune_candidates" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") > 40)
        .select(col("user_id"), col("event_id"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // U1: UNION ALL status board (bird_schema.sql:519-556).
    "q14_union_status_board" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val completed = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("key"), lit("completed").as("status"))
      val pending = o.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey").as("key"), lit("pending").as("status"))
      completed.unionByName(pending).orderBy(col("key"), col("status"))
    },

    // U2: fingerprint set difference (fixed = r1 − r2,
    // services/query.py:392-397). The literal EXCEPT plan scans
    // events TWICE (JSON parsed per scan) and pays distinct-both-
    // sides + anti-join exchanges; a ∖ b over the SAME source is one
    // scan + one (user,k) shuffle carrying half-membership flags —
    // EXCEPT ≡ a ∧ ¬b on the grouped row (set semantics: grouping IS
    // the distinct; a null-ts row contributes null to both maxes and
    // drops, exactly as dayofmonth(null) fails both day filters).
    // AbBench sf1 interleaved: 0.53 → 0.38 s (r12).
    "q15_set_except" -> { (s, dir) =>
      halfMembership(t(s, dir, "events"))
        .filter(col("a") && !col("b"))
        .select(col("user_id"), col("k"))
        .orderBy(col("user_id"), col("k"))
    },

    // U2b: set intersection (unchanged = r1 ∩ r2) — same one-scan
    // flag-agg form as q15: INTERSECT ≡ a ∧ b on the grouped row.
    "q16_set_intersect" -> { (s, dir) =>
      halfMembership(t(s, dir, "events"))
        .filter(col("a") && col("b"))
        .select(col("user_id"), col("k"))
        .orderBy(col("user_id"), col("k"))
    },

    // A3/A8: grouped agg + HAVING (tool/category summary shape).
    "q17_supplier_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .filter(col("n") > 600)
        .orderBy(col("l_suppkey"))
    },

    // A10: ordered list aggregation (to_json(list(...)) analog, made
    // deterministic: sorted distinct set → csv string).
    "q18_user_event_sets" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"))
        .orderBy(col("user_id"))
    },

    // A4: GROUP BY ALL (bird_schema.sql:862-888).
    "q19_group_by_all" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"), round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("lang"), col("source"))
    },

    // A7: representative row per group (ANY_VALUE → deterministic min).
    "q20_example_per_type" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(min(col("event_id")).as("example_event"),
          max(col("event_id")).as("latest_event"))
        .orderBy(col("event_type"))
    },

    // A10 proper: JSON-document aggregation — to_json(collect_list(
    // struct(...))) per group, the agent-output emission form
    // (reference: src/blq/schema.sql:354-373). collect_list order is
    // shuffle-dependent, so the struct array is sort_array'd (first
    // field event_id is unique → total order) before serialization;
    // the oracle orders inside list(... ORDER BY event_id). Both
    // engines emit identical compact JSON.
    "q52_json_agg" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(
          // ignoreNullFields=false: DuckDB's to_json always emits null
          // struct fields; Spark drops them by default, which would be
          // a latent hash divergence on any corpus with a NULL
          // event_type (the current testdata has none — don't rely on
          // that).
          to_json(sort_array(collect_list(struct(col("event_id"), col("event_type")))),
            Map("ignoreNullFields" -> "false"))
            .as("events_json"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    },

    // TPC-H Q3 shape (shipping priority): selective dim filter on the
    // customer side, date range split across orders/lineitem (both
    // pushed to the scans), revenue top-10. Per-order revenue sums are
    // few-row groups, so double rounding is engine-stable.
    //
    // Customer carries NO broadcast() hint: it is the second-largest
    // TPC-H relation (~orders/4 rows), and a forced broadcast at the
    // 100 TB target is an executor OOM — the hint would override
    // exactly the size check AQE exists to apply. At small SF the
    // size estimate (or AQE at runtime) still picks a broadcast join;
    // PlanAuditSpec pins that, so dropping the hint costs nothing
    // where broadcasting is actually safe.
    "q65_shipping_priority" -> { (s, dir) =>
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"),
          col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("revenue"), col("ord_ms"), col("o_orderpriority"))
    },

    // TPC-H Q14 shape (promo revenue share): one month of lineitem
    // joined to the broadcast part dim, conditional-vs-total ratio in
    // a single aggregate pass.
    "q66_promo_share" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      li.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) / sum(rev), 4)
          .as("promo_share"))
    },

    // TPC-H Q13 shape (customer order-count distribution). The
    // literal plan (customer ⟕ orders, then double-agg) shuffles the
    // FULL orders table into the join; pre-aggregating orders BELOW
    // the join is equivalent (count(o_orderkey) per customer ≡ the
    // per-custkey order count; the left join's zero-order customers
    // surface as coalesce(n,0)) and map-side combine shrinks the
    // shuffle to (custkey, count) partials — at 100 TB the orders
    // fact never crosses the wire at row width, and the join inputs
    // drop to |customer| vs |distinct custkeys|. AbBench sf1
    // interleaved: 1.05 → 0.53 s (r12).
    "q67_cust_order_distribution" -> { (s, dir) =>
      val cnt = t(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(cnt, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_cust").desc, col("n_orders").desc)
    },

    // TPC-H Q5 shape (local supplier volume): the classic snowflake —
    // region→nation→supplier chained BROADCAST dims (those three stay
    // small at any scale: the fact table never shuffles for them),
    // date-pruned orders, and the same-nation customer⋈supplier
    // correlation on (custkey, nationkey). Customer is NOT hinted:
    // at ~orders/4 rows it is not broadcast-safe at 100 TB, so the
    // size decision is left to the planner/AQE (which still
    // broadcasts it at small SF — PlanAuditSpec pins the executed
    // plan; at cluster scale it degrades to a shuffle join instead
    // of an OOM). Revenue sums span thousands of rows, magnitude
    // ~1e7: double accumulation error ~1e-5 ≪ the 2dp rounding unit,
    // so the rounded emission is engine-stable.
    "q70_local_supplier_volume" -> { (s, dir) =>
      val asiaNations = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val sup = t(s, dir, "supplier").join(broadcast(asiaNations),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(cust,
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("rev")), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q10 shape (returned-item reporting): one quarter of orders,
    // returned lineitems only, revenue per customer with the nation dim
    // broadcast, top-20.
    //
    // Revenue is computed EXACTLY, in integer 1e-4-dollar units:
    // price and discount are 2dp decimals, so ep_cents*(100-disc_pct)
    // is an exact long, its sum is exact, ranking compares exact
    // integers, and the one emitted division (sum/10000.0) performs
    // the identical IEEE-754 operation on the identical integer in
    // both engines. Rounding a float SUM is not portable here: the
    // first attempt put one customer's sum near a .005 boundary where
    // Spark (shortest-decimal-string HALF_UP) and DuckDB (binary
    // round) disagree — accumulation order plus rounding convention
    // both bite at boundaries, and a fixed corpus keeps the boundary
    // forever.
    "q71_returned_items" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val revE4 = (round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("rev_e4")
      val rev = t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), revE4)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
      // nation (25 rows) keeps its hint; the customer⋈nation result is
      // customer-sized and therefore NOT hinted — AQE broadcasts it at
      // small SF (PlanAuditSpec pins this) and shuffle-joins at scale.
      val cust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      rev.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
        .agg(sum(col("rev_e4")).as("rev_e4"))
        .orderBy(col("rev_e4").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"),
          (col("rev_e4") / lit(10000.0)).as("revenue"), col("acctbal"), col("n_name"))
    },

    // TPC-H Q18 shape (large-volume customers): the double-lineitem
    // plan — aggregate lineitem to find >300-quantity orders (a tiny
    // key set), semi-join it back into orders, re-aggregate. The big
    // key list stays a join (never a collect): at 100 TB it is still
    // millions of keys, and AQE broadcasts it only if it measures
    // small. r17 adjudication of the r16 x4.7 move (0.42 -> 1.96 s
    // across close sessions): interleaved q72_cur 0.60/0.69 min/med
    // (aggonly 0.48/0.54), 0.40 s in the round's first full bench,
    // 0.36 s in the clean contended:false close — the r15 envelope
    // restored with no code change; NOISE-PINNED as steal-tail of
    // the degraded r16 close windows.
    "q72_large_volume_cust" -> { (s, dir) =>
      // r6: the oracle's classic double-lineitem plan (aggregate to
      // find big orders, rejoin lineitem, re-aggregate) is redundant —
      // orders⋈customer are 1:1 on the group keys, so the final
      // sum(l_quantity) per order IS the `sq` the first aggregation
      // already produced. One lineitem scan + one shuffle instead of
      // two of each; exactly the textbook Q18 rewrite, and the
      // dominant saving at 100 TB where lineitem is the fact table.
      val bigOrders = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(round(col("sq"), 4) > 300)
      t(s, dir, "orders")
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        // customer unhinted for the same 100 TB reason as q65/q70/q71
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"),
          round(col("o_totalprice"), 2).as("totalprice"),
          round(col("sq"), 2).as("total_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // TPC-H Q4 shape (order priority checking): orders in a quarter
    // having AT LEAST ONE very-late lineitem (shipped > 90 days after
    // the order date — the testdata has no commit/receipt dates, so
    // lateness is vs the order date). The EXISTS compiles to a
    // LeftSemi join between two FACT tables with a non-equi residual:
    // unlike the dim joins above there is no broadcast-able side at
    // scale — both sides shuffle on the order key once, and the semi
    // form never duplicates an order no matter how many late items it
    // has (a plain join + distinct would shuffle the blowup first).
    "q79_late_order_priority" -> { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      // Derived bound (constraint propagation the optimizer can't do
      // across the non-equi residual): o_orderdate >= 1996-01-01 and
      // l_shipdate > o_orderdate + 90d together imply l_shipdate >
      // 1996-03-31 — pushed to the lineitem scan, it prunes most of
      // the fact before the join without changing a single result row
      // (measured 0.94 -> ~0.3 s at sf0.1).
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-03-31").cast("timestamp"))
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q17 shape (small-quantity-order revenue): per-part average
    // quantity aggregated from the fact itself, joined BACK to the
    // fact — the classic agg-join-back plan for correlated scalar
    // subqueries. Both branches hash-partition on l_partkey, so the
    // join reuses the aggregation's shuffle; the agg side is
    // part-cardinality (AQE broadcasts it at small SF, shuffle-joins
    // at scale — part is customer-sized, so no forced hint, same
    // policy as q65/q70-q72). Determinism: l_quantity is integral
    // (1..50), so per-part sums are EXACT doubles and avg = the
    // identical IEEE division in both engines; the 0.5 multiplier is
    // a power of two, so the filter boundary cannot drift. Revenue is
    // summed in exact integer cents (the q71 lesson) and divided once
    // on emission.
    "q80_small_qty_revenue" -> { (s, dir) =>
      // r12 (AbBench sf1: join-back 0.87 / window 0.66 min; the
      // collect_list one-exchange fold measured 1.41 — array overhead
      // loses): the agg-join-back's two fact scans + two exchanges
      // collapse to ONE scan + ONE hash(partkey) exchange when the
      // per-part average is a window aggregate over the same
      // partition. avg over an unbounded frame accumulates the exact
      // integral sums, so the IEEE division — and the 0.5 boundary —
      // is bit-identical to the groupBy avg. Partition key is
      // part-cardinality: no parallelism collapse at any scale.
      val w = Window.partitionBy(col("l_partkey"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("ep_cents"))
        .withColumn("aq", avg(col("l_quantity")).over(w))
        .filter(col("l_quantity") < lit(0.5) * col("aq"))
        .agg(count(lit(1)).as("n_items"),
          (sum(col("ep_cents")) / lit(100.0)).as("revenue"))
    },

    // TPC-H Q21 shape (sole late supplier): suppliers whose lineitem
    // shipped > 60 days after the order date on a multi-supplier
    // order where NO OTHER supplier was late. The classic plan is a
    // semi+anti probe pair over a distinct late set; this is the
    // aggregation decorrelation instead (r7, AbBench med 0.80 s vs
    // 1.16 s for semi+anti at sf0.1): attach the order date to each
    // line, collapse to (order, supplier, any-line-late) — one
    // bounded shuffle with map-side partial agg — then one per-order
    // aggregate produces n_supp / n_late / the sole late suppkey,
    // and the Q21 EXISTS + NOT EXISTS pair becomes the filter
    // n_late=1 ∧ n_supp>1. Two aggregations bounded by pairs/orders
    // replace three fact-keyed joins and a persist; supplier (a
    // bounded dim ~orders/150) broadcasts for the name lookup.
    "q81_sole_late_supplier" -> { (s, dir) =>
      // r12 (AbBench interleaved at sf1: cur 2.11 / date-broadcast
      // fold 1.57 / THIS 1.26 min; sf0.1: 1.29→0.78): join the order
      // dates onto the fact BEFORE the pair agg — the r8 form's
      // mid-plan pairs⋈orders join (and the max_ship carry) disappear
      // and the lateness flag folds into the first aggregate. The
      // join is shuffle_hash on the order key with BOTH sides
      // exchanged (lineitem's repartition feeds the join, both aggs
      // ride its partitioning by the subset rule): no SMJ sorts of
      // two fact tables, and no fact-side broadcast — the r9
      // broadcast-dates fold was faster than r8 too but dies at
      // 100 TB where orders is not a dim; this form keeps its fusion
      // win with fact⋈fact-honest movement.
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .repartition(col("l_orderkey"))
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderdate")).hint("shuffle_hash"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max((col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .cast("int")).as("is_late"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"), sum(col("is_late")).as("n_late"),
          max(when(col("is_late") === 1, col("l_suppkey"))).as("sole_supp"))
        .filter(col("n_late") === 1 && col("n_supp") > 1)
        .join(broadcast(t(s, dir, "supplier")),
          col("sole_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // TPC-H Q22 shape (churned high-value customers): balance above
    // the positive-balance average AND no order since the cutoff,
    // rolled up per nation. The scalar subquery becomes a 1-row
    // broadcast; the NOT EXISTS an anti join against the
    // date-restricted fact — both sides shuffle on the customer key
    // once at scale, and the date filter reaches the orders scan
    // (PushedFilters) before any join. The average is rounded to 4 dp
    // in BOTH engines so a balance sitting within float-summation
    // drift of the threshold cannot flip sides; balances sum in exact
    // integer cents (the q71 lesson).
    "q86_churned_rich_customers" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg(round(avg(col("c_acctbal")), 4).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      cust
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"),
          (sum(round(col("c_acctbal") * 100, 0).cast("long")) / lit(100.0))
            .as("total_bal"))
        .orderBy(col("c_nationkey"))
    },

    // TPC-H Q11 shape (revenue concentration): parts whose revenue
    // share exceeds 1.5× the mean per-part share — a grouped
    // aggregate HAVING-compared against scalar aggregates over the
    // SAME grouped result. The per-part aggregate is computed once;
    // the global total + part count re-aggregate its
    // (part-cardinality) output, not the fact, and cross back as ONE
    // 1-row broadcast. The share gate runs in decimal(38) (DuckDB:
    // HUGEINT) — exact at any corpus size, no float boundary and no
    // 64-bit product overflow (rev_e4 × nparts × 2 blows past a long
    // at ~petabyte revenue volumes).
    "q87_part_revenue_concentration" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
          .as("rev_e4"))
      val total = rev.agg(sum(col("rev_e4")).as("total_e4"),
        count(lit(1)).as("nparts"))
      rev.crossJoin(broadcast(total))
        .filter(col("rev_e4").cast("decimal(38,0)") * col("nparts") * 2 >
          col("total_e4").cast("decimal(38,0)") * 3)
        .select(col("l_partkey"), (col("rev_e4") / lit(10000.0)).as("revenue"),
          round(col("rev_e4") * lit(10000.0) / col("total_e4"), 4).as("share_bp"))
        .orderBy(col("revenue").desc, col("l_partkey"))
    })

  val oracles: Map[String, String] = Map(
    "q65_shipping_priority" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | epoch_ms(o_orderdate) AS ord_ms, o_orderpriority
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, ord_ms, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q66_promo_share" ->
      """SELECT round(100.0 *
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END) /
        |  sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-02-01'""".stripMargin,

    "q67_cust_order_distribution" ->
      """SELECT n_orders, count(*) AS n_cust FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY n_orders ORDER BY n_cust DESC, n_orders DESC""".stripMargin,

    "q70_local_supplier_volume" ->
      """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q71_returned_items" ->
      """SELECT c_custkey, c_name, rev_e4 / 10000.0 AS revenue, acctbal, n_name
        |FROM (
        |  SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal, n_name,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |      AS rev_e4
        |  FROM lineitem
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name)
        |ORDER BY rev_e4 DESC, c_custkey LIMIT 20""".stripMargin,

    "q72_large_volume_cust" ->
      """SELECT c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate) AS ord_ms,
        | round(o_totalprice, 2) AS totalprice,
        | round(sum(l_quantity), 2) AS total_qty
        |FROM orders
        | JOIN (SELECT l_orderkey AS big_orderkey FROM lineitem
        |       GROUP BY l_orderkey HAVING round(sum(l_quantity), 4) > 300)
        |   ON o_orderkey = big_orderkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name, o_orderkey, epoch_ms(o_orderdate),
        |  round(o_totalprice, 2)
        |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q79_late_order_priority" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q80_small_qty_revenue" ->
      """WITH aq AS (
        |  SELECT l_partkey, avg(l_quantity) AS aq FROM lineitem GROUP BY l_partkey)
        |SELECT count(*) AS n_items,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0
        |   AS revenue
        |FROM lineitem JOIN aq USING (l_partkey)
        |WHERE l_quantity < 0.5 * aq""".stripMargin,

    "q81_sole_late_supplier" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
        |late AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM l JOIN orders ON l.l_orderkey = o_orderkey
        |  WHERE l.l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |sole AS (
        |  SELECT t.l_orderkey, t.l_suppkey FROM late t
        |  WHERE EXISTS (SELECT 1 FROM l l2
        |          WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM late o
        |          WHERE o.l_orderkey = t.l_orderkey AND o.l_suppkey <> t.l_suppkey))
        |SELECT s_name, count(*) AS numwait
        |FROM sole JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    "q86_churned_rich_customers" ->
      """WITH ab AS (
        |  SELECT round(avg(c_acctbal), 4) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0
        |    AS total_bal
        |FROM customer CROSS JOIN ab
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q87_part_revenue_concentration" ->
      """WITH pr AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |             (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |      AS rev_e4
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev_e4) AS BIGINT) AS total_e4,
        |               CAST(count(*) AS BIGINT) AS nparts FROM pr)
        |SELECT l_partkey, rev_e4 / 10000.0 AS revenue,
        |  round(rev_e4 * 10000.0 / total_e4, 4) AS share_bp
        |FROM pr CROSS JOIN tot
        |WHERE rev_e4::HUGEINT * nparts * 2 > total_e4::HUGEINT * 3
        |ORDER BY revenue DESC, l_partkey""".stripMargin,

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(CAST(round(l_extendedprice*100,0) AS BIGINT)) / 100.0, 2)
        |   AS sum_base_price,
        | round(sum(CAST(round(l_extendedprice*100,0) AS BIGINT) *
        |           (100 - CAST(round(l_discount*100,0) AS BIGINT))) / 10000.0, 2)
        |   AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(sum(CAST(round(l_discount*100,0) AS BIGINT)) / count(*) / 100.0, 4)
        |   AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_event_rollup" ->
      """SELECT event_type, count(*) AS n_events,
        | count(*) FILTER (WHERE value > 100) AS n_high,
        | count(DISTINCT user_id) AS n_users, round(sum(value),2) AS total_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q03_top_customers" ->
      """SELECT o_custkey, round(sum(o_totalprice),2) AS total_spend, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY total_spend DESC, o_custkey LIMIT 10""".stripMargin,
    "q04_region_revenue" ->
      """SELECT r_name, n_name,
        | round(sum(CAST(round(l_extendedprice*100,0) AS BIGINT) *
        |           (100 - CAST(round(l_discount*100,0) AS BIGINT))) / 10000.0, 2)
        |   AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q05_order_status" ->
      """SELECT o_orderkey, coalesce(n_items, 0) AS n_items,
        | CASE WHEN n_items IS NULL THEN 'pending'
        |      WHEN n_items >= 5 THEN 'large' ELSE 'small' END AS status
        |FROM orders LEFT JOIN (
        |  SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey
        |) li ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q06_orders_no_items" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q07_customers_with_f_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q08_event_diff" ->
      """WITH a AS (SELECT event_type, count(*) AS n_before FROM events
        |           WHERE extract(day FROM ts) <= 15 GROUP BY event_type),
        |     b AS (SELECT event_type, count(*) AS n_after FROM events
        |           WHERE extract(day FROM ts) > 15 GROUP BY event_type)
        |SELECT coalesce(a.event_type, b.event_type) AS event_type,
        | coalesce(n_before, 0) AS n_before, coalesce(n_after, 0) AS n_after,
        | coalesce(n_after, 0) - coalesce(n_before, 0) AS delta
        |FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
        |ORDER BY event_type""".stripMargin,
    "q09_latest_event_per_user" ->
      """SELECT user_id, event_id, event_type, round(value, 2) AS value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q10_run_serial" ->
      """SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS run_serial
        |FROM events ORDER BY event_id""".stripMargin,
    "q11_grep_context" ->
      """SELECT user_id, event_id, event_type, is_match FROM (
        |  SELECT user_id, event_id, event_type,
        |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_match,
        |    max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS near
        |  FROM events) sub
        |WHERE near = 1 ORDER BY user_id, event_id""".stripMargin,
    "q12_value_counts" ->
      "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY n DESC, lang",
    "q13_prune_candidates" ->
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) sub
        |WHERE rn > 40 ORDER BY user_id, event_id""".stripMargin,
    "q14_union_status_board" ->
      """SELECT o_orderkey AS key, 'completed' AS status FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey AS key, 'pending' AS status FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY key, status""".stripMargin,
    "q15_set_except" ->
      """SELECT user_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_type = 'error' AND extract(day FROM ts) <= 15
        |EXCEPT
        |SELECT user_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_type = 'error' AND extract(day FROM ts) > 15
        |ORDER BY user_id, k""".stripMargin,
    "q16_set_intersect" ->
      """SELECT user_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_type = 'error' AND extract(day FROM ts) <= 15
        |INTERSECT
        |SELECT user_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events WHERE event_type = 'error' AND extract(day FROM ts) > 15
        |ORDER BY user_id, k""".stripMargin,
    "q17_supplier_summary" ->
      """SELECT l_suppkey, count(*) AS n, round(sum(l_quantity),2) AS qty
        |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 600 ORDER BY l_suppkey""".stripMargin,
    "q18_user_event_sets" ->
      """SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q19_group_by_all" ->
      """SELECT lang, source, count(*) AS n, round(avg(n_chars),4) AS avg_chars
        |FROM documents GROUP BY ALL ORDER BY lang, source""".stripMargin,
    "q20_example_per_type" ->
      """SELECT event_type, min(event_id) AS example_event, max(event_id) AS latest_event
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q52_json_agg" ->
      """SELECT user_id,
        | to_json(list(struct_pack(event_id := event_id, event_type := event_type)
        |   ORDER BY event_id)) AS events_json,
        | count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
