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
}
