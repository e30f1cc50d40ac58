package graft

import org.apache.spark.sql.functions._
import graft.store.Bucketing

/** Proves the bucketed layout removes the join shuffle: both sides
  * bucketed on the key ⇒ SortMergeJoin with no Exchange in the plan. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without any exchange") {
    val events = (1L to 1000L)
      .map(i => (i, s"inv${i % 50}", if (i % 3 == 0) "error" else "info"))
      .toDF("event_id", "invocation_id", "severity")
    val invs = (0 until 50).map(i => (s"inv$i", s"cmd$i"))
      .toDF("invocation_id", "command")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Bucketing.writeBucketed(events, "g_events_b", "invocation_id", 8)
      Bucketing.writeBucketed(invs, "g_invs_b", "invocation_id", 8)
      val joined = Bucketing.bucketedJoin(spark, "g_events_b", "g_invs_b",
        "invocation_id")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      // and the result is right
      assert(joined.count() === 1000)
      assert(joined.filter($"severity" === "error").count() === 333)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS g_events_b")
      spark.sql("DROP TABLE IF EXISTS g_invs_b")
    }
  }

  test("end-to-end: real store re-layout bucketed; flat-view join has no exchange") {
    // a real store, populated through the real write path
    val root = java.nio.file.Files.createTempDirectory("bucket_store").toString
    val store = new graft.store.EventStore(spark, root)
    val runner = new graft.exec.Runner(store,
      new graft.store.BlobStore(s"$root/blobs"))
    (0 until 6).foreach { i =>
      runner.importContent(
        s"src/f$i.c:${i + 1}:2: error: broken $i\n" +
          s"src/f$i.c:${i + 10}:4: warning: meh $i\n",
        format = "gcc_text", tag = Some(s"b$i"),
        context = Some(graft.exec.ExecContext.Captured.empty))
    }
    val unbucketed = graft.views.Views.eventsFlat(store)
    val expectRows = unbucketed.count()
    val expectErrors = unbucketed.filter($"severity" === "error").count()

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      graft.store.Bucketing.writeStoreBucketed(store, "g_store_b", buckets = 4)
      val flat = graft.store.Bucketing.flatView(spark, "g_store_b")
      val plan = flat.queryExecution.executedPlan.toString()
      // the join itself: sort-merge over co-bucketed scans, NO exchange
      // of any kind (broadcast disabled above, shuffle removed by the
      // write-time bucketing) — including through the invocations-side
      // id -> invocation_id rename (alias-aware output partitioning)
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
      assert(!plan.contains("Exchange"), s"expected no exchange:\n${plan.take(3000)}")
      // same rows as the standard layout: bucketing changed the plan,
      // not the view semantics
      assert(flat.count() === expectRows)
      assert(flat.filter($"severity" === "error").count() === expectErrors)
      // the bucketing keeps paying downstream: a per-run rollup over
      // the flat view rides the same partitioning — still no exchange
      val rollup = flat.groupBy($"invocation_id").count()
      val rollupPlan = rollup.queryExecution.executedPlan.toString()
      assert(!rollupPlan.contains("Exchange"),
        s"rollup should reuse bucketing:\n${rollupPlan.take(3000)}")
      assert(rollup.count() === 6)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS g_store_b_events")
      spark.sql("DROP TABLE IF EXISTS g_store_b_invocations")
    }
  }
}
