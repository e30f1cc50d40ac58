package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the OUTPUT stage of a corpus build: land
  * the surviving documents as N balanced parquet shards plus a
  * per-shard manifest, the layout a training job's data loader
  * consumes (the WebDataset/Megatron-style sharded-corpus practice:
  * many same-sized shards, loaders claim shards not rows). Reference
  * behavior frame: the reference engine's partitioned parquet sink
  * (/root/reference/src/blq/store.py:214-268) writes query results as
  * partitioned parquet; sharded training export is the
  * pipeline-specific form of that sink.
  *
  * Scale design:
  *  - Shard assignment is the q61/q117 portable md5 bucket of doc_id —
  *    a per-row expression, zero data movement to decide placement,
  *    deterministic across runs/engines (q118 gates it against a
  *    DuckDB oracle). Balance comes from hashing: shard token counts
  *    concentrate tightly around mean for any real corpus (the
  *    manifest records the realized skew so the claim is CHECKED, not
  *    assumed).
  *  - ONE file per shard: `repartition(nShards, col("shard"))` puts
  *    every row of a shard into a single task (hash collisions merge
  *    shards into one task but never split one), so the
  *    partitionBy("shard") writer emits exactly one file per shard —
  *    no small-file debt to compact later. At 100 TB pick nShards ≈
  *    totalBytes / targetShardBytes (shards are the parallelism unit
  *    for BOTH the write and the downstream loader).
  *  - Crash-safe: shards + manifest are written under `<dir>.tmp_`
  *    (manifest LAST — its presence under tmp is the build-complete
  *    marker) and swapped in with the rename-aside protocol (aside →
  *    rename-in → drop aside). [[recover]] repairs an interrupted
  *    swap the IvfIndex way: roll FORWARD when tmp is complete, roll
  *    BACK the aside otherwise — so a crash at any point, including
  *    between the two renames, leaves a readable export after the
  *    next entry, and the old copy is never deleted until the new one
  *    is serving (the r11 review hole: blind entry deletes destroyed
  *    the stranded-aside last good copy).
  */
object ShardExport {

  /** Portable deterministic shard id (md5 of the decimal doc_id, the
    * q61 hash contract): non-negative, so plain % matches DuckDB. */
  def shardId(docId: Column, nShards: Int): Column =
    (conv(substring(md5(docId.cast("string")), 1, 8), 16, 10)
      .cast("long") % nShards).cast("int")

  /** Append the `shard` column (no data movement). */
  def assign(docs: DataFrame, nShards: Int): DataFrame =
    docs.withColumn("shard", shardId(col("doc_id"), nShards))

  /** Per-shard manifest of an assigned frame: doc/token/char totals.
    * Integer-only emission (the q71 contract); whitespace tokens are
    * the engine-wide tokenizer contract (q117/q38). */
  def manifest(assigned: DataFrame): DataFrame =
    assigned
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(QualityClassifier.toksCol(col("text"))).cast("long"))
          .as("n_toks"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .orderBy(col("shard"))

  /** Write `docs` (doc_id, text, ...) as `nShards` parquet shards
    * under `dir` (one file per shard, zstd) plus `dir/_manifest` and
    * return the manifest. The swap into `dir` is atomic-ish per the
    * rename-aside protocol above. */
  def write(docs: DataFrame, dir: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = docs.sparkSession
    val assigned = assign(docs, nShards)
      .repartition(nShards, col("shard"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(dir + ".tmp_")
      val old = new org.apache.hadoop.fs.Path(dir + ".old_")
      // repair any interrupted prior swap BEFORE touching tmp/old —
      // a stranded aside may be the last good copy (never delete it
      // until a replacement is serving)
      recover(spark, dir)
      fs.delete(tmp, true) // stale INCOMPLETE tmp from a dead writer
      assigned.write.mode("overwrite")
        .option("compression", "zstd")
        .partitionBy("shard")
        .parquet(tmp.toString)
      val mf = manifest(assigned)
      mf.coalesce(1).write.mode("overwrite")
        .option("compression", "zstd")
        .parquet(new org.apache.hadoop.fs.Path(tmp, "_manifest").toString)
      if (fs.exists(base) && !fs.rename(base, old))
        throw new java.io.IOException(s"shard export rename-aside failed for $dir")
      if (!fs.rename(tmp, base)) {
        if (fs.exists(old)) fs.rename(old, base) // restore the aside
        throw new java.io.IOException(s"shard export rename-in failed for $dir")
      }
      fs.delete(old, true)
      readManifest(spark, dir)
    } finally assigned.unpersist(false)
  }

  /** Repair an interrupted [[write]] swap (the IvfIndex.recover
    * protocol, `IvfIndex.scala` — roll forward iff the new side is
    * complete, roll back otherwise). States, decided from what exists
    * on entry:
    *
    *  - base COMPLETE (its `_manifest` exists — the swap is atomic,
    *    so a dir [[write]] landed always has one; a bare dir without
    *    it was never an export and must NOT read as one — the r18
    *    poisoning bug persisted the export-debt file INSIDE `dir`
    *    before any export existed, and bare-existence recovery then
    *    sent every restart into a readManifest of nothing): a live
    *    export is serving. Any `.old_` is a post-rename-in straggler
    *    (write crashed inside its final delete) — drop it. An
    *    incomplete tmp is a dead writer's partial — write clobbers it
    *    anyway.
    *  - base missing, tmp COMPLETE (its `_manifest/_SUCCESS` exists —
    *    the manifest is written last): the writer died between
    *    rename(base→old) and rename(tmp→base), or just before the
    *    aside of a first export. Roll FORWARD: tmp → base, then drop
    *    the aside (superseded by a complete new export).
    *  - base missing, tmp absent/incomplete, aside present: the
    *    writer died mid-build after setting the aside (or a prior
    *    roll-forward crashed before its aside-drop... which cannot
    *    strand: forward drops aside only after rename-in). Roll
    *    BACK: `.old_` → base — the last good copy serves again.
    *  - nothing at all: first-ever export, clean no-op.
    *
    * Idempotent; called defensively at the start of every [[write]]
    * and safe to call any time. Returns true when an export is
    * readable at `dir` afterwards. */
  def recover(spark: SparkSession, dir: String): Boolean = {
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".tmp_")
    val old = new org.apache.hadoop.fs.Path(dir + ".old_")
    val tmpComplete = fs.exists(
      new org.apache.hadoop.fs.Path(tmp, "_manifest/_SUCCESS"))
    val baseComplete = fs.exists(
      new org.apache.hadoop.fs.Path(base, "_manifest"))
    if (baseComplete) { fs.delete(old, true); true }
    else if (tmpComplete) {
      // an INCOMPLETE base was never an export (see scaladoc) — it
      // must not block the complete tmp from landing
      if (fs.exists(base)) fs.delete(base, true)
      if (!fs.rename(tmp, base))
        throw new java.io.IOException(
          s"shard export roll-forward rename failed for $dir")
      fs.delete(old, true); true
    } else if (fs.exists(old)) {
      fs.delete(tmp, true)
      if (fs.exists(base)) fs.delete(base, true)
      if (!fs.rename(old, base))
        throw new java.io.IOException(
          s"shard export roll-back rename failed for $dir")
      true
    } else { fs.delete(tmp, true); false }
  }

  /** The manifest of a completed export. */
  def readManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/_manifest").orderBy(col("shard"))

  /** Read an export back as one frame (loaders read single shards:
    * `spark.read.parquet(s"$dir/shard=7")`). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Realized balance of an export: (max/mean, min/mean) of per-shard
    * token counts — the check behind the "hashing balances" claim. */
  def skew(manifestDf: DataFrame): (Double, Double) = {
    val r = manifestDf
      .agg(max(col("n_toks")).cast("double").as("mx"),
        min(col("n_toks")).cast("double").as("mn"),
        avg(col("n_toks")).as("av"))
      .head()
    (r.getDouble(0) / r.getDouble(2), r.getDouble(1) / r.getDouble(2))
  }
}
