package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ml.{Ivf, Similarity, Skew}
import graft.store.{EventStore, Maintenance}

/** Specs for maintenance policies, the IVF ANN index, and skew salting. */
class MaintenanceIvfSpec extends SparkSpec {
  import Fixtures._
  import spark.implicits._

  test("pruneByCount ranks runs past the keep horizon per source") {
    val store = new EventStore(spark, Files.createTempDirectory("m1").toString)
    populate(store) // build: serials 1,2; test: serial 3
    val m = new Maintenance(store)
    val doomed = m.pruneByCount(maxRuns = 1).collect()
    assert(doomed.map(_.getAs[String]("invocation_id")).toSet === Set("i1"))
    assert(m.pruneByCount(maxRuns = 5).count() === 0)
  }

  test("pruneByAge and pruneBySize pick old partitions") {
    val store = new EventStore(spark, Files.createTempDirectory("m2").toString)
    populate(store)
    val m = new Maintenance(store)
    // fixture dates are 2026-08-01/02 — both far older than 1 day ago
    assert(m.pruneByAge("invocations", 1).size === 2)
    assert(m.pruneByAge("invocations", 100000).isEmpty)
    // tiny budget: at least the oldest partition is doomed, newest kept
    val doomed = m.pruneBySize("invocations", maxBytes = 1L)
    assert(doomed.nonEmpty)
    assert(doomed.exists(_.contains("date=2026-08-01")))
  }

  test("prune swap leftovers recover losslessly after a simulated crash") {
    val store = new EventStore(spark, Files.createTempDirectory("m_rec").toString)
    populate(store)
    val m = new Maintenance(store)
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(s"${store.root}/events")
    val fs = base.getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(base, "date=2026-08-01")
    val aside = new org.apache.hadoop.fs.Path(base, ".prune_old_date=2026-08-01")
    val before = spark.read.parquet(live.toString).count()
    // crash between rename-aside and rename-in: only the aside copy
    // exists — recovery must restore it under the live name
    assert(fs.rename(live, aside))
    val tmp = new org.apache.hadoop.fs.Path(base, ".prune_tmp_date=2026-08-02")
    fs.mkdirs(tmp) // an uncommitted rewrite leftover, must be dropped
    val handled = m.recoverPruneLeftovers("events")
    assert(handled.toSet === Set(".prune_old_date=2026-08-01", ".prune_tmp_date=2026-08-02"))
    assert(fs.exists(live) && !fs.exists(aside) && !fs.exists(tmp))
    assert(spark.read.parquet(live.toString).count() === before)
    // crash after rename-in but before delete-aside: live (pruned) copy
    // wins, the aside is dropped
    val aside2 = new org.apache.hadoop.fs.Path(base, ".prune_old_date=2026-08-02")
    fs.mkdirs(aside2)
    val live2 = new org.apache.hadoop.fs.Path(base, "date=2026-08-02")
    val live2Count = spark.read.parquet(live2.toString).count()
    assert(m.recoverPruneLeftovers("events") === Seq(".prune_old_date=2026-08-02"))
    assert(fs.exists(live2) && !fs.exists(aside2))
    assert(spark.read.parquet(live2.toString).count() === live2Count)
    // idempotent on a clean table
    assert(m.recoverPruneLeftovers("events").isEmpty)
  }

  test("pruneBySizeTotal: crossing partition doomed, deterministic tie order") {
    val store = new EventStore(spark, Files.createTempDirectory("m_tot").toString)
    populate(store)
    val m = new Maintenance(store)
    val conf = spark.sparkContext.hadoopConfiguration
    // events and invocations share dates 2026-08-01/02 → 4 pooled
    // partitions; expected order: date desc, then path asc (events
    // before invocations on a tied date)
    val expected = Seq(
      "events/date=2026-08-02", "invocations/date=2026-08-02",
      "events/date=2026-08-01", "invocations/date=2026-08-01")
    val all = m.pruneBySizeTotal(Seq("events", "invocations"), maxBytes = 1L)
    assert(all.map(p => p.split("/").takeRight(2).mkString("/")) === expected)
    // same call, same order — the boundary is not run-dependent
    assert(m.pruneBySizeTotal(Seq("events", "invocations"), 1L) === all)
    // budget exactly the newest partition's size: it is KEPT; the
    // partition that crosses the budget (and everything older) is
    // doomed, so the retained total never exceeds the budget
    val first = new org.apache.hadoop.fs.Path(all.head)
    val firstSize = first.getFileSystem(conf).getContentSummary(first).getLength
    val doomed = m.pruneBySizeTotal(Seq("events", "invocations"), firstSize)
    assert(doomed.map(p => p.split("/").takeRight(2).mkString("/")) === expected.tail)
  }

  test("reconcileOrphans appends NULL-exit outcomes for stale attempts") {
    val store = new EventStore(spark, Files.createTempDirectory("m3").toString)
    populate(store) // a1 has an outcome; a2 is pending
    val m = new Maintenance(store)
    val now = Timestamp.valueOf("2026-08-03 00:00:00")
    val orphaned = m.reconcileOrphans(now, staleAfterMs = 60000L)
    assert(orphaned === Seq("a2"))
    // a2 now reads as orphaned through the batch status view
    val status = graft.views.Views.attemptStatus(store)
      .filter(col("id") === "a2").select(col("status")).as[String].head()
    assert(status === "orphaned")
    // idempotent: second pass finds nothing
    assert(m.reconcileOrphans(now, 60000L).isEmpty)
  }

  test("ivf: train/assign partitions space; topK finds the planted neighbor") {
    val vecs = (0L until 40L).map { i =>
      val base = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(base, base * 0.5f, (i % 7) * 0.01f, 0.1f), (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    val p = Similarity.prepared(vecs)
    val centroids = Ivf.train(p, k = 2, iters = 2)
    assert(centroids.count() === 2)
    val assigned = Ivf.assign(p, centroids)
    // two clear clusters (+1 / -1 direction) → assignments split evenly
    val sizes = assigned.groupBy(col("cell_id")).count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.values.toSet === Set(20L))
    val top = Ivf.topK(vecs, q => q === 0L, k = 3, cells = 2, nprobe = 1)
      .as[(Long, Long, Double, Int)].collect()
    assert(top.length === 3)
    // all neighbors of an even (positive-direction) vector are even
    assert(top.forall(_._2 % 2 == 0))
    // scale gate: assignment is a pure per-row map over the inlined
    // centroid array — no Exchange between the input scan and the
    // assignment projection (the scan node's own child plan may embed
    // one from how the cached input was BUILT; that's upstream).
    val assignPlan = Ivf.assign(p, centroids)
      .queryExecution.executedPlan.toString()
    val assignStage = assignPlan.linesIterator
      .takeWhile(l => !l.contains("Scan")).mkString("\n")
    assert(!assignStage.contains("Exchange"),
      s"Ivf.assign shuffled the corpus:\n$assignPlan")
  }

  test("salted join spreads a hot key without changing results") {
    val big = Seq.tabulate(1000)(i => (if (i < 900) "hot" else s"k$i", i))
      .toDF("key", "payload")
    val small = Seq(("hot", "H"), ("k950", "A")).toDF("key", "tag")
    val plain = big.join(small, Seq("key")).orderBy("payload")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(big, small, "key", salts = 8).orderBy("payload")
      .collect().map(_.toSeq).toSeq
    assert(salted === plain)
    assert(salted.size === 901)
    val hot = Skew.hotKeys(big, "key", 1).collect().head
    assert(hot.getAs[String]("key") === "hot")
    assert(hot.getAs[Double]("share") === 0.9)
  }

  test("salting demonstrably collapses the hot key's reducer-load spread (its reason to exist)") {
    // 90%-one-key corpus: 18k "hot" rows + 2k singletons. The spread
    // measurement is Skew.reducerLoads — projected records per shuffle
    // reducer under Spark's own key hash — because at test scale
    // measured task times are all noise and AQE coalesces the tiny
    // partitions anyway; records-per-reducer is the deterministic
    // quantity task time is proportional to.
    val n = 20000
    val big = spark.range(n).select(
      when(col("id") < n * 9 / 10, "hot")
        .otherwise(concat(lit("k"), col("id"))).as("key"),
      col("id").as("payload"))
    val parts = 32
    val unsaltedMax = Skew.reducerLoads(big, Seq("key"), parts)
      .agg(max(col("rows"))).as[Long].head()
    // the exact salted key set saltedJoin shuffles on (position-derived
    // salt, 16 buckets — mirrors the helper's internals)
    val salts = 16
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedMax = Skew.reducerLoads(saltedBig, Seq("key", "__salt"), parts)
      .agg(max(col("rows"))).as[Long].head()
    // unsalted: one reducer owns >= the whole hot key (90% of the table)
    assert(unsaltedMax >= n * 9 / 10, s"unsalted max: $unsaltedMax")
    // salted: the hot key spreads over `salts` buckets; even with a few
    // buckets co-hashing onto one reducer the worst load collapses
    assert(saltedMax <= unsaltedMax / 3, s"salted max: $saltedMax vs $unsaltedMax")
    assert(saltedMax < 6000, s"salted max: $saltedMax")
    // and the salted join result is exactly the plain join's
    val small = Seq(("hot", "H"), ("k19990", "A")).toDF("key", "tag")
    val plain = big.join(small, Seq("key"))
      .agg(count(lit(1)), sum(col("payload"))).as[(Long, Long)].head()
    val salted = Skew.saltedJoin(big, small, "key", salts)
      .agg(count(lit(1)), sum(col("payload"))).as[(Long, Long)].head()
    assert(salted === plain)
    assert(plain._1 === (n * 9 / 10 + 1).toLong)
  }

  test("salted join spreads IDENTICAL duplicate rows across salt buckets") {
    // The canonical hot-key pathology: many fully-identical rows. A
    // content-derived salt puts all of them in one bucket; the
    // position-derived salt must spread them (and keep the join exact).
    val big = spark.range(800).select(lit("hot").as("key"), lit(1).as("payload"))
      .union(Seq(("cold", 2)).toDF("key", "payload"))
    val small = Seq(("hot", "H"), ("cold", "C")).toDF("key", "tag")
    val salted = Skew.saltedJoin(big, small, "key", salts = 8)
    assert(salted.count() === 801L)
    val buckets = big.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .filter(col("key") === "hot")
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(buckets > 1L, s"identical rows collapsed into $buckets salt bucket(s)")
  }
}
