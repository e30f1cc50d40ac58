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

  test("compactBucketed: appends pile files per bucket, compaction packs to one each") {
    def tableFiles(t: String): Int = {
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t)).location
      new java.io.File(loc).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    }
    try {
      val d0 = (1L to 400L).map(i => (i, s"k${i % 37}")).toDF("id", "key")
      Bucketing.writeBucketed(d0, "g_cb", "key", 4)
      // two append batches — the BandIndex/IvfIndex daily-fold shape
      for (b <- 1 to 2) {
        ((400L * b + 1) to (400L * b + 400L)).map(i => (i, s"k${i % 37}"))
          .toDF("id", "key")
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .option("compression", "zstd")
          .bucketBy(4, "key").sortBy("key").saveAsTable("g_cb")
      }
      val before = tableFiles("g_cb")
      assert(before > 4, s"expected appends to pile files, got $before")
      val rowsBefore = spark.table("g_cb").orderBy("id")
        .as[(Long, String)].collect().toSeq

      Bucketing.compactBucketed(spark, "g_cb")
      assert(tableFiles("g_cb") === 4, "expected exactly one file per bucket")
      // rows identical, spec preserved, and the bucketed-scan property
      // survives (no exchange when joining on the bucket key)
      assert(spark.table("g_cb").orderBy("id")
        .as[(Long, String)].collect().toSeq === rowsBefore)
      val spec = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("g_cb")).bucketSpec
      assert(spec.exists(s => s.numBuckets == 4 &&
        s.bucketColumnNames == Seq("key")))
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = spark.table("g_cb").groupBy($"key").count()
          .queryExecution.executedPlan.toString()
        assert(plan.contains("Bucketed: true") && !plan.contains("Exchange"),
          plan.take(2000))
      } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // non-bucketed table refused
      spark.range(3).toDF("x").write.saveAsTable("g_cb_plain")
      val ex = intercept[IllegalStateException] {
        Bucketing.compactBucketed(spark, "g_cb_plain")
      }
      assert(ex.getMessage.contains("not a bucketed table"))
    } finally {
      Seq("g_cb", "g_cb__compact", "g_cb_plain")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
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
