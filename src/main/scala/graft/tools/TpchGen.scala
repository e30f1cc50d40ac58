package graft.tools

import org.apache.spark.sql.SparkSession
import java.sql.Timestamp

/** Deterministic TPC-H-shaped growth tables (r12) — the other half of
  * [[ScaleGen]]: that tool scales the documents/embeddings corpus for
  * the dedup/index sweeps; this one scales the relational tables
  * (customer/supplier/part/orders/lineitem/events + the fixed
  * nation/region dims) so the TPC-H-shaped bench queries get a
  * genuine sf1 point instead of extrapolating from sf0.1. Counts are
  * `factor`× the driver sf0.1 row counts (factor 10 ≈ sf1: 6M
  * lineitem, 1.5M orders, 1M events), written under a caller-chosen
  * dir (never /root/testdata — read-only).
  *
  * Same discipline as ScaleGen: every row is a pure function of its
  * id (per-row seeded RNG), so output is identical across re-runs and
  * independent of partitioning. Value domains mirror the driver
  * tables (observed via DuckDB: mktsegment/priority/status/type
  * vocabularies, 25 nations over 5 regions, qty 1-50, discount
  * 0-0.10, tax 0-0.08, price bands, 64 two-word part names over the
  * same adjective/noun sets, ship ≈ order date + 1-95 days, events
  * spread over one month with `{"k": n}` props) so every bench
  * query's filters stay selective-but-non-vacuous at scale — the
  * point is measuring the OPERATORS' growth, which requires the
  * predicate and join shapes to survive the scale-up.
  *
  * Usage: runMain graft.tools.TpchGen <outDir> [factor]
  * Combined with `ScaleGen <outDir> <factor>` the dir serves the FULL
  * query suite, so `SPARK_GRAFT_SF_DIR=<outDir> runMain graft.Bench`
  * and `tools/duckbench.py <outDir> <verifyOut>` give a PAIRED sf1
  * measurement, not just an unpaired Spark row.
  */
object TpchGen {

  private val mkts = Vector("MACHINERY", "AUTOMOBILE", "HOUSEHOLD",
    "BUILDING", "FURNITURE")
  private val prios = Vector("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val ptypes = Vector("ECONOMY", "SMALL", "PROMO", "MEDIUM",
    "LARGE", "STANDARD")
  private val adjs = Vector("large", "hot", "blue", "old", "cold",
    "small", "shiny", "dark")
  private val nouns = Vector("ring", "bolt", "plate", "gear", "widget",
    "pin", "cap", "tube")
  private val etypes = Vector("signup", "click", "error", "view", "purchase")

  private def rngFor(kind: Long, id: Long): java.util.Random =
    new java.util.Random(77L + kind * 1000003L + id * 2654435761L)

  private def money(r: java.util.Random, lo: Double, hi: Double): Double =
    math.rint((lo + r.nextDouble() * (hi - lo)) * 100) / 100

  // 1995-01-01 UTC in epoch millis; order dates span ~2404 days
  // (through 2001-08), ship dates trail by 1-95 days (driver data:
  // max shipdate 2001-11 vs max orderdate 2001-08)
  private val day0Ms = 788918400000L
  private def dayTs(day: Long): Timestamp = new Timestamp(day0Ms + day * 86400000L)

  /** Order date is a pure function of the ORDER key so lineitem rows
    * can recompute their parent's date without a join at gen time —
    * the ship>order correlation the Q3-shaped queries prune on. */
  private def orderDay(okey: Long): Long = rngFor(10, okey).nextInt(2404).toLong

  private def customerRow(id: Long): (Long, String, Int, Double, String) = {
    val r = rngFor(1, id)
    (id, f"Customer#$id%09d", r.nextInt(25), money(r, -999.99, 9999.99),
      mkts(r.nextInt(mkts.length)))
  }

  private def supplierRow(id: Long): (Long, String, Int, Double) = {
    val r = rngFor(2, id)
    (id, f"Supplier#$id%09d", r.nextInt(25), money(r, -999.99, 9999.99))
  }

  private def partRow(id: Long): (Long, String, String, String, Int, Double) = {
    val r = rngFor(3, id)
    (id, adjs(r.nextInt(adjs.length)) + " " + nouns(r.nextInt(nouns.length)),
      "Brand#" + (1 + r.nextInt(25)), ptypes(r.nextInt(ptypes.length)),
      1 + r.nextInt(50), math.rint(9000 + (id % 1000)) / 10.0)
  }

  private def orderRow(id: Long, nCust: Long): (Long, Long, String, Double, Timestamp, String) = {
    val r = rngFor(4, id)
    val status = { val d = r.nextDouble(); if (d < 0.49) "O" else if (d < 0.98) "F" else "P" }
    (id, r.nextLong(nCust), status, money(r, 1000.0, 500000.0),
      dayTs(orderDay(id)), prios(r.nextInt(prios.length)))
  }

  private def lineitemRow(id: Long, nOrd: Long, nPart: Long, nSupp: Long)
      : (Long, Long, Long, Int, Double, Double, Double, Double, String, String, Timestamp) = {
    val r = rngFor(5, id)
    val okey = r.nextLong(nOrd)
    val rf = { val d = r.nextDouble(); if (d < 0.34) "A" else if (d < 0.67) "N" else "R" }
    (okey, r.nextLong(nPart), r.nextLong(nSupp), 1 + (id % 7).toInt,
      (1 + r.nextInt(50)).toDouble, money(r, 900.0, 105000.0),
      r.nextInt(11) / 100.0, r.nextInt(9) / 100.0,
      rf, if (r.nextBoolean()) "O" else "F",
      dayTs(orderDay(okey) + 1 + r.nextInt(95)))
  }

  /** Events spread over one month (driver data: Jan 2024, ~26 s
    * apart at sf0.1) with monotone-ish ts: base spacing from the id,
    * plus bounded jitter — per-user gaps stay sessionizable. */
  private def eventRow(id: Long, nEv: Long, nUsers: Long)
      : (Long, Timestamp, Long, String, Double, String) = {
    val r = rngFor(6, id)
    val monthMicros = 30L * 86400000000L
    val ts = new Timestamp(1704067200000L + (id * (monthMicros / nEv) +
      r.nextInt(20000000)) / 1000L)
    (id, ts, r.nextLong(nUsers), etypes(r.nextInt(etypes.length)),
      math.rint(math.min(-math.log(r.nextDouble() + 1e-12) * 45.0, 560.0) * 100) / 100,
      s"""{"k": ${r.nextInt(100)}}""")
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val factor = if (args.length > 1) args(1).toInt else 10
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val (nCust, nSupp, nPart, nOrd, nLi, nEv) =
      (15000L * factor, 1000L * factor, 20000L * factor,
        150000L * factor, 600000L * factor, 100000L * factor)
    val nUsers = 1500L * factor
    val nFiles = math.max(8, factor)

    (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/nation.parquet")
    Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
        (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/region.parquet")
    spark.range(0, nCust, 1, nFiles).map(id => customerRow(id))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    spark.range(0, nSupp, 1, nFiles).map(id => supplierRow(id))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")
    spark.range(0, nPart, 1, nFiles).map(id => partRow(id))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    spark.range(0, nOrd, 1, nFiles).map(orderRow(_, nCust))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    spark.range(0, nLi, 1, nFiles).map(lineitemRow(_, nOrd, nPart, nSupp))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    spark.range(0, nEv, 1, nFiles).map(eventRow(_, nEv, nUsers))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    println(s"wrote factor=$factor TPC-H tables ($nLi lineitem / $nOrd orders / $nEv events) to $out")
    spark.stop()
  }
}
