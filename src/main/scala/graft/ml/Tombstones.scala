package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared tombstone protocol for the TABLE-backed stored indexes
  * (BandIndex, SigIndex, FuzzyJoin.FuzzyIndex; IvfIndex carries its
  * own copy with payload-specific compaction). One `<table>_tombstones`
  * catalog table of deleted ids; probes anti-join their stored side
  * against it (broadcast — the backlog is bounded by compaction
  * cadence), appends refuse resurrections on the RAW batch (the
  * LexIndex lesson: an id-idempotence anti-join placed first would
  * swallow a tombstoned re-add silently), and compaction rewrites the
  * index table(s) without the deleted rows, then clears the set —
  * idempotent under replay.
  *
  * Reference behavior frame: blq-cli's prune/clean surface
  * (/root/reference/src/blq/storage.py prune + DELETE semantics) —
  * generalized to the derived-index family, where a deleted document
  * must also stop appearing in SCREEN RESULTS immediately, not just
  * leave the store at the next rewrite. */
private[ml] object Tombstones {

  def tableFor(table: String): String = table + "_tombstones"

  /** Record ids as deleted. Idempotent set semantics. */
  def add(spark: SparkSession, table: String, ids: DataFrame): Unit = {
    val cast = ids.select(col(ids.columns.head).cast("long").as("doc_id"))
      .filter(col("doc_id").isNotNull).distinct()
    val tt = tableFor(table)
    val novel =
      if (spark.catalog.tableExists(tt))
        cast.join(spark.table(tt), Seq("doc_id"), "left_anti")
      else cast
    if (!novel.isEmpty) {
      novel.coalesce(1).write
        .mode(org.apache.spark.sql.SaveMode.Append).saveAsTable(tt)
      ()
    }
  }

  /** `stored` minus tombstoned ids (matched on `idCol`); the common
    * untombstoned case stays zero-cost. */
  def live(spark: SparkSession, table: String, stored: DataFrame,
      idCol: String): DataFrame = {
    val tt = tableFor(table)
    if (!spark.catalog.tableExists(tt)) stored
    else stored.join(
      broadcast(spark.table(tt).select(col("doc_id").as("__tbs_id"))),
      col(idCol) === col("__tbs_id"), "left_anti")
  }

  /** Refuse a batch that re-adds a tombstoned id — resurrection must
    * be an explicit compact-then-append. Checked on the RAW batch. */
  def requireNoResurrection(spark: SparkSession, table: String,
      batch: DataFrame, idCol: String): Unit = {
    val tt = tableFor(table)
    if (spark.catalog.tableExists(tt)) {
      val clash = batch.select(col(idCol).cast("long").as("doc_id"))
        .join(spark.table(tt), Seq("doc_id"), "left_semi").limit(1).collect()
      require(clash.isEmpty,
        s"batch contains tombstoned id ${clash.headOption.map(_.get(0))} — " +
          s"run the index's compactTombstones($table) first if the re-add " +
          "is intended")
    }
  }

  /** True when a tombstone set exists for `table`. */
  def exists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(tableFor(table))

  /** Drop the tombstone set (after compaction, or on a fresh build). */
  def clear(spark: SparkSession, table: String): Unit =
    graft.store.Bucketing.dropWithDir(spark, tableFor(table))

  /** Repair an interrupted [[compactBucketedTable]] swap (r17 — the
    * r16 advice's crash window): between `RENAME table → __old` and
    * `RENAME __new → table` a JVM death leaves the live name absent,
    * and a replay used to die at getTableMetadata instead of
    * self-repairing (the IvfIndex.recover precedent — its leg got a
    * recovery entry, the shared helper did not). `saveAsTable` only
    * commits the `__new` catalog entry after a complete write, so:
    * live missing + `__new` present ⇒ the compacted copy is whole —
    * roll FORWARD (promote `__new`); live missing + only `__old` ⇒
    * the swap died before the aside landed a replacement — roll BACK
    * (restore `__old`). Live present ⇒ at most stragglers: a leftover
    * `__old` is the pre-compaction copy of a swap that completed its
    * promote — drop it ([[compactBucketedTable]] itself clears any
    * stale `__new` before writing). Called defensively at the start
    * of every compaction; safe no-op on a clean table. Idempotent:
    * every branch ends with the live name serving a complete row set
    * (pre- or post-compaction — the caller's tombstone set is only
    * cleared after every table rewrote, so a rolled-back table just
    * re-compacts). */
  def recoverSwap(spark: SparkSession, table: String): Unit = {
    val newT = table + "__new"
    val oldT = table + "__old"
    def ex(n: String) = spark.catalog.tableExists(n)
    if (!ex(table)) {
      if (ex(newT)) spark.sql(s"ALTER TABLE $newT RENAME TO $table")
      else if (ex(oldT)) spark.sql(s"ALTER TABLE $oldT RENAME TO $table")
      else throw new IllegalStateException(
        s"index table $table missing with no __new/__old to recover from")
    }
    if (ex(oldT)) spark.sql(s"DROP TABLE IF EXISTS $oldT")
    ()
  }

  /** Rewrite one bucketed index table without its tombstoned rows —
    * the shared compaction step: write-aside under `__new`, single
    * rename-aside swap, caller clears the set once EVERY table of the
    * index has been rewritten. Crash-repaired on entry by
    * [[recoverSwap]]. */
  def compactBucketedTable(spark: SparkSession, indexTable: String,
      table: String, idCol: String, bucketCols: Seq[String]): Unit = {
    recoverSwap(spark, table)
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val buckets = meta.bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed index table"))
    val newT = table + "__new"
    val oldT = table + "__old"
    graft.store.Bucketing.dropWithDir(spark, newT)
    live(spark, indexTable, spark.table(table), idCol).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("compression", "zstd")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(newT)
    graft.store.Bucketing.dropWithDir(spark, oldT)
    spark.sql(s"ALTER TABLE $table RENAME TO $oldT")
    spark.sql(s"ALTER TABLE $newT RENAME TO $table")
    spark.sql(s"DROP TABLE IF EXISTS $oldT")
    ()
  }
}
