package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned schema migrations over the append-only parquet store —
  * the Spark-native shape of the reference's stepwise ALTER-based
  * migration chain (/root/reference/src/blq/bird.py:606-698: a
  * schema_version key in metadata, idempotent per-version steps like
  * "add test_name", "sandbox → extension_data" add+copy rename).
  *
  * A mutable-database engine migrates by ALTERing tables in place. An
  * immutable parquet lake can't (and at 100 TB shouldn't: rewriting
  * history to add a null column is petabytes of IO for nothing), so
  * migration is split into the two scale-appropriate halves:
  *
  *  - '''read-time adaptation''' (`adapt`): every step is an idempotent
  *    DataFrame transform (conditional on column presence/type), applied
  *    after the mergeSchema read. Old partitions stay untouched; readers
  *    always see the latest logical schema. Cost: a few Project nodes —
  *    codegen'd, zero extra IO.
  *  - '''physical rewrite''' (`rewrite`): an explicit maintenance job
  *    that materializes the adapted schema partition-by-partition and
  *    bumps the stored version so future reads skip the adapters. Run
  *    it when the adapter chain grows long, not on every upgrade.
  *
  * The stored version lives in `<root>/_schema_version` (Hadoop FS API,
  * so HDFS/S3 roots work the same as local). Steps with
  * `version <= storedVersion` are skipped at read — after a rewrite the
  * adapter chain is a no-op.
  */
object SchemaMigration {

  /** One versioned step bringing `table` from version-1 to `version`.
    * `adapt` MUST be idempotent: applying it to already-migrated data
    * is a no-op (mirror of bird.py's "check column exists first"). */
  final case class Step(version: Int, table: String, description: String,
      adapt: DataFrame => DataFrame)

  /** Add a typed null column if absent (bird.py 2.1→2.2 test_name). */
  def addColumn(name: String, dataType: String): DataFrame => DataFrame =
    df => if (df.columns.contains(name)) df
    else df.withColumn(name, lit(null).cast(dataType))

  /** Rename with copy-through: old partitions carry `from`, new ones
    * `to`; after a mergeSchema read both exist with nulls in the other
    * half, so the rename is a coalesce (bird.py 2.3→2.4
    * sandbox→extension_data, which is ADD + copy for the same reason —
    * in-place RENAME was not safe there either). */
  def renameColumn(from: String, to: String): DataFrame => DataFrame = df =>
    (df.columns.contains(from), df.columns.contains(to)) match {
      case (true, true) => df.withColumn(to, coalesce(col(to), col(from))).drop(from)
      case (true, false) => df.withColumnRenamed(from, to)
      case _ => df
    }

  /** Widen a column's type (int→bigint etc.). Order matters for this
    * class: parquet mergeSchema refuses to reconcile mixed physical
    * numeric types across partitions, so the table must be physically
    * `rewrite`n (uniformly old → uniformly wide) BEFORE any writer
    * emits the wide type — the adapter covers the window where the
    * whole table is still the narrow type. */
  def widenColumn(name: String, dataType: String): DataFrame => DataFrame =
    df => if (df.columns.contains(name)) df.withColumn(name, col(name).cast(dataType))
    else df
}

final class SchemaMigration(spark: SparkSession, root: String,
    steps: Seq[SchemaMigration.Step]) {
  import SchemaMigration.Step

  private val versionPath = new org.apache.hadoop.fs.Path(s"$root/_schema_version")
  private def fs = versionPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def latestVersion: Int = if (steps.isEmpty) 1 else steps.map(_.version).max

  /** Stored (physical) schema version; 1 when the marker is absent. */
  def currentVersion: Int =
    if (!fs.exists(versionPath)) 1
    else {
      val in = fs.open(versionPath)
      try scala.io.Source.fromInputStream(in).mkString.trim.toInt
      finally in.close()
    }

  private def writeVersion(v: Int): Unit = {
    val out = fs.create(versionPath, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Read-time adapter: apply every step for `table` newer than the
    * stored version, in version order. */
  def adapt(table: String, df: DataFrame): DataFrame = {
    val v = currentVersion
    steps.filter(s => s.table == table && s.version > v)
      .sortBy(_.version)
      .foldLeft(df)((d, s) => s.adapt(d))
  }

  /** Pending steps for `table` (diagnostics / dry-run). */
  def pending(table: String): Seq[Step] = {
    val v = currentVersion
    steps.filter(s => s.table == table && s.version > v).sortBy(_.version)
  }

  /** Physically rewrite `table` at the latest schema and bump the
    * stored version once every listed table is rewritten. Writes to a
    * sibling tmp dir then swaps, so a crashed rewrite never corrupts
    * the live table. Partition columns are preserved.
    *
    * Every table that still has pending steps MUST be listed: the
    * version marker is store-wide, so bumping it with a pending table
    * omitted would silently disable that table's read-time adapters.
    *
    * Crash recovery: the swap is two renames (live → .pre_migrate_t,
    * tmp → live). A crash or failure between them leaves NO live dir —
    * reads fail loudly (the version marker was not bumped, so nothing
    * reads stale data silently); recover by renaming
    * `.pre_migrate_<table>` back to `<table>` and re-running. When the
    * second rename fails, the restore rename is attempted immediately
    * and its own failure is reported with the recovery path named. */
  def rewrite(tables: Map[String, (DataFrame, Seq[String])]): Unit = {
    val v = currentVersion
    val uncovered = steps.filter(_.version > v).map(_.table).distinct
      .filterNot(tables.contains)
    require(uncovered.isEmpty,
      s"rewrite must cover every table with pending steps; missing: " +
        uncovered.mkString(", "))
    tables.foreach { case (table, (raw, partitionCols)) =>
      val adapted = adapt(table, raw)
      val live = new org.apache.hadoop.fs.Path(s"$root/$table")
      val tmp = new org.apache.hadoop.fs.Path(s"$root/.migrate_$table")
      val old = new org.apache.hadoop.fs.Path(s"$root/.pre_migrate_$table")
      val w = adapted.write.mode(SaveMode.Overwrite).option("compression", "zstd")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp.toString)
      if (fs.exists(old)) fs.delete(old, true)
      // Hadoop rename signals failure by RETURNING false (and renames
      // INTO an existing dir rather than over it) — check both hops or
      // a failed swap corrupts the table while the version still bumps.
      if (!fs.rename(live, old))
        throw new java.io.IOException(s"migration swap: rename $live -> $old failed")
      if (!fs.rename(tmp, live)) {
        val restored = fs.rename(old, live)
        throw new java.io.IOException(
          s"migration swap: rename $tmp -> $live failed; " + (
            if (restored) s"previous table restored from $old"
            else s"RESTORE ALSO FAILED — live table is at $old; " +
              s"rename it back to $live manually and re-run"))
      }
      fs.delete(old, true)
    }
    writeVersion(latestVersion)
  }
}

/** The store's built-in migration chain — mirrors the reference's
  * version history on the graft event schema (bird.py:622-673), plus a
  * type-widen example of the third migration class the reference never
  * needed (DuckDB ALTERs types in place; parquet cannot). */
object GraftMigrations {
  import SchemaMigration._

  val steps: Seq[Step] = Seq(
    Step(2, "events", "add test_name column (reference 2.1→2.2)",
      addColumn("test_name", "string")),
    Step(3, "events", "sandbox → extension_data rename-with-copy (reference 2.3→2.4)",
      renameColumn("sandbox", "extension_data")),
    Step(4, "events", "widen ref_line to bigint (type-widen class)",
      widenColumn("ref_line", "bigint")))

  def apply(spark: SparkSession, root: String): SchemaMigration =
    new SchemaMigration(spark, root, steps)
}
