package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for shuffle-free fact⋈fact joins at scale
  * (SURVEY.md §4: "at 100 TB consider bucketing by invocation_id to
  * make J1 shuffle-free"). Both events and invocations are written
  * bucketed+sorted on the join key; a sort-merge join between them
  * then needs NO exchange on either side — the shuffle happened once,
  * at write time, and is amortized over every subsequent query.
  *
  * Catalog tables (bucketBy requires saveAsTable); the plain
  * partitioned-parquet layout in [[EventStore]] stays the primary
  * store — bucketing is the opt-in layout for deployments where the
  * flat-view join dominates.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** The co-bucketed flat-view join: both sides bucketed on the key ⇒
    * SortMergeJoin with zero Exchange nodes (verify with .explain). */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Re-layout a store's J1 tables as co-bucketed catalog tables:
    * events bucketed on its foreign key, invocations on its id (the
    * rename to the common join name happens in the view — bucketing
    * survives the alias via Spark's alias-aware output partitioning).
    * One write-time shuffle, amortized over every later flat-view
    * query. */
  def writeStoreBucketed(store: EventStore, prefix: String,
      buckets: Int): Unit = {
    writeBucketed(store.events, s"${prefix}_events", "invocation_id", buckets)
    writeBucketed(store.invocations, s"${prefix}_invocations", "id", buckets)
  }

  /** The UNCHANGED flat-view join shape over the bucketed layout —
    * same code path as Views.eventsFlat (Views.flatJoin), no broadcast
    * hint so the co-bucketing is what removes the shuffle. This is the
    * SCALING.md claim "J1 can be made shuffle-free by bucketing
    * without changing any query", as a callable. */
  def flatView(spark: org.apache.spark.sql.SparkSession,
      prefix: String): DataFrame =
    graft.views.Views.flatJoin(
      spark.table(s"${prefix}_events"),
      spark.table(s"${prefix}_invocations"),
      hintBroadcast = false)
}
