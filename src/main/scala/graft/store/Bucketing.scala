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

  /** Compact a bucketed catalog table back to ~one file per bucket
    * (r10): every Append — BandIndex.append, IvfIndex.append, any
    * bucketed sink — adds a file per touched bucket, so at a daily
    * cadence the per-bucket file count grows without bound; this is
    * the catalog-table counterpart of Maintenance.applyCompaction's
    * date-partition bin-packing. Rewrites through a temp table with
    * the SAME bucket/sort spec, repartitioned on the bucket columns
    * first (repartition and bucketBy share the Murmur3 hash, so each
    * task holds exactly one bucket's rows ⇒ one file per bucket),
    * then swaps via rename-aside (r11, the Maintenance.applyCompaction
    * protocol): original → `<table>__old`, `<table>__compact` →
    * original, drop `__old`. The original DATA survives until the
    * swap completes — a crash at any point leaves a complete copy
    * under the original name or under `__old`/`__compact` (recover by
    * renaming back); nothing is deleted before the new table serves.
    * Run compaction in the same single-writer maintenance slot as
    * prune. */
  def compactBucketed(spark: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    val spec = spark.sessionState.catalog.getTableMetadata(ident)
      .bucketSpec.getOrElse(throw new IllegalStateException(
        s"$table is not a bucketed table"))
    val tmp = table + "__compact"
    val aside = table + "__old"
    // clear leftovers from an interrupted prior attempt (table AND
    // warehouse dir — a crashed write can leave the dir without the
    // catalog entry)
    dropWithDir(spark, tmp)
    dropWithDir(spark, aside)
    val cols = spec.bucketColumnNames
      .map(org.apache.spark.sql.functions.col)
    // repartition on the WRITER'S bucket-id expression (pmod of the
    // Murmur3 hash — functions.hash — over the bucket columns), not
    // the raw columns: the writer emits one file per (task, bucket)
    // pair, so rows must be grouped by BUCKET ID for the output to be
    // one file per bucket (a plain column repartition spreads each
    // bucket across tasks — measured 12 files for 4 buckets)
    import org.apache.spark.sql.functions.{hash, lit, pmod}
    val bucketId = pmod(hash(cols: _*), lit(spec.numBuckets))
    val base = spark.table(table)
      .repartition(spec.numBuckets, bucketId)
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.drop(1): _*)
    val withSort =
      if (spec.sortColumnNames.nonEmpty)
        base.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.drop(1): _*)
      else base
    withSort.saveAsTable(tmp)
    // rename-aside swap: the original is never deleted before the
    // compacted table is live under its name
    spark.sql(s"ALTER TABLE $table RENAME TO $aside")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.sql(s"DROP TABLE $aside")
  }

  /** Mean data-file count per bucket of a bucketed catalog table —
    * the measured small-file debt a steady append cadence accrues
    * (one file per touched bucket per append). The maintenance loop
    * compacts when this crosses its threshold: a MEASURED trigger,
    * like IvfIndex.driftStats, instead of a blind every-N counter
    * (empty batches and restarts don't skew it). One driver-side
    * directory listing, no job. */
  def filesPerBucket(spark: org.apache.spark.sql.SparkSession,
      table: String): Double = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalStateException(s"$table is not a bucketed table"))
    val loc = new org.apache.hadoop.fs.Path(meta.location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(loc).count(s =>
      s.isFile && !s.getPath.getName.startsWith("_"))
    files.toDouble / buckets
  }

  /** DROP a catalog table AND delete any leftover warehouse dir a
    * crashed write left behind without the catalog entry — saveAsTable
    * refuses to write over a stray dir, so every swap protocol
    * (compaction here, the IvfIndex rebuild swap) clears both. */
  private[graft] def dropWithDir(spark: org.apache.spark.sql.SparkSession,
      name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    ()
  }

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
