package graft.store

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Outcome

/** Store maintenance (SURVEY.md §2.5 W3, §2.9 T4; storage.py:624-714,
  * bird.py:1178-1271): prune policies and orphan reconciliation,
  * re-expressed for append-only parquet — pruning selects *partition
  * directories / run ids* for a rewrite job (plain parquet has no row
  * DELETE), and orphaning *appends* synthetic outcomes instead of
  * updating attempts.
  */
final class Maintenance(store: EventStore) {

  /** Prune-by-age: partition dirs older than `days` (delete targets). */
  def pruneByAge(table: String, days: Int): Seq[String] =
    store.prunablePartitions(table, days)

  /** Prune-by-count: invocation ids ranked past the newest `maxRuns`
    * per source (W3's ranking window, storage.py:660-673). The caller
    * rewrites the affected partitions without these runs. */
  def pruneByCount(maxRuns: Int): DataFrame = {
    val w = Window
      .partitionBy(coalesce(col("source_name"), lit("__none__")))
      .orderBy(col("started_at").desc, col("id").desc)
    store.invocations
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > maxRuns)
      .select(col("id").as("invocation_id"), col("source_name"), col("date"))
  }

  /** Prune-by-size: oldest `date=` partitions beyond a total byte
    * budget (newest kept first — the reference's total-MB policy). */
  def pruneBySize(table: String, maxBytes: Long): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"${store.root}/$table")
    val fs = p.getFileSystem(store.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val parts = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.startsWith("date="))
      .map(s => (s.getPath, fs.getContentSummary(s.getPath).getLength))
    // newest first: ISO date strings sort lexicographically
    val newestFirst = parts.sortBy(_._1.getName.stripPrefix("date="))(Ordering[String].reverse)
    var acc = 0L
    val doomed = Seq.newBuilder[String]
    newestFirst.foreach { case (path, size) =>
      acc += size
      if (acc > maxBytes) doomed += path.toString
    }
    doomed.result()
  }

  /** Blob orphan reconciliation (J7; bird.py:1522-1527): hashes present
    * on disk but referenced by no outputs row — left_anti against the
    * outputs frame. Returns the orphaned hashes (delete targets). */
  def orphanBlobs(blobs: BlobStore): Seq[String] = {
    val spark = store.spark
    import spark.implicits._
    val onDisk = blobs.listHashes().toDF("hash")
    val referenced = store.outputs
      .filter(org.apache.spark.sql.functions.col("storage_type") === "blob")
      .select(org.apache.spark.sql.functions.col("content_hash").as("hash"))
      .distinct()
    onDisk.join(referenced, Seq("hash"), "left_anti")
      .as[String].collect().toSeq
  }

  /** Orphan reconciliation (T4): pending attempts older than
    * `staleAfterMs` (no outcome row) get a synthetic outcome with NULL
    * exit code appended — the append-only form of the reference's
    * "mark orphaned" UPDATE. Returns the orphaned attempt ids. */
  def reconcileOrphans(now: Timestamp, staleAfterMs: Long): Seq[String] = {
    val cutoff = new Timestamp(now.getTime - staleAfterMs)
    val attempts = store.attempts
    val stale = attempts
      .join(store.outcomes.select(col("attempt_id")),
        attempts("id") === col("attempt_id"), "left_anti")
      .filter(col("timestamp") < lit(cutoff))
      .select(col("id"))
      .collect().map(_.getString(0)).toSeq
    if (stale.nonEmpty) {
      val today = new java.sql.Date(now.getTime)
      store.appendOutcomes(stale.map(id =>
        Outcome(attempt_id = id, completed_at = now, duration_ms = None,
          exit_code = None, signal = None, timeout = false, date = today)))
    }
    stale
  }
}
