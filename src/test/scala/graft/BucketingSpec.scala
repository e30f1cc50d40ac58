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
}
