package graft

import org.apache.spark.sql.functions._
import graft.ml.ShardExport

class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"doc $i body ${"tok " * (i % 7)}"))
      .toDF("doc_id", "text")

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("shardexp").toString + "/out"

  test("write lands every doc exactly once, one data file per shard") {
    val dir = tmpDir()
    val mf = ShardExport.write(corpus(500), dir, 8)
    val back = ShardExport.read(spark, dir)
    assert(back.count() === 500)
    assert(back.select($"doc_id").distinct().count() === 500)
    // set equality with the input
    assert(back.select($"doc_id").except(corpus(500).select($"doc_id")).count() === 0)
    // shard column reconstructed from the partition dirs and matching
    // the deterministic assignment
    val mismatched = back
      .withColumn("expect", ShardExport.shardId(col("doc_id"), 8))
      .filter(col("shard") =!= col("expect")).count()
    assert(mismatched === 0)
    // exactly one parquet data file per shard directory
    val root = new java.io.File(dir)
    val shardDirs = root.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length === mf.count().toInt)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName} has ${files.length} files")
    }
  }

  test("manifest matches the written data; skew is measured") {
    val dir = tmpDir()
    val mf = ShardExport.write(corpus(1000), dir, 16).collect()
    val actual = ShardExport.read(spark, dir)
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.ml.QualityClassifier.toksCol($"text")).cast("long")).as("n_toks"),
        sum(length($"text").cast("long")).as("n_chars"))
      .orderBy($"shard").collect()
    assert(mf.length === actual.length)
    mf.zip(actual).foreach { case (m, a) =>
      assert(m.getInt(0) === a.getInt(0))
      assert(m.getLong(1) === a.getLong(1), s"n_docs shard ${m.getInt(0)}")
      assert(m.getLong(2) === a.getLong(2), s"n_toks shard ${m.getInt(0)}")
      assert(m.getLong(3) === a.getLong(3), s"n_chars shard ${m.getInt(0)}")
    }
    val (mx, mn) = ShardExport.skew(ShardExport.readManifest(spark, dir))
    assert(mx >= 1.0 && mn <= 1.0 && mx < 3.0 && mn > 0.2,
      s"hash-shard skew out of plausible band: max/mean=$mx min/mean=$mn")
  }

  test("assignment is deterministic and engine-stable") {
    val a = ShardExport.assign(corpus(200), 8)
      .select($"doc_id", $"shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = ShardExport.assign(corpus(200), 8)
      .select($"doc_id", $"shard").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
    // pinned example values so a hash-contract change can't slip by:
    // md5("0") = cfcd2084..., first 8 hex = 0xcfcd2084 % 8
    assert(a(0L) === (java.lang.Long.parseLong("cfcd2084", 16) % 8).toInt)
  }

  test("rewrite over an existing export swaps atomically; stale tmp is clobbered") {
    val dir = tmpDir()
    ShardExport.write(corpus(100), dir, 4)
    // plant a stale tmp from a "dead writer" plus junk inside
    val tmp = new java.io.File(dir + ".tmp_")
    tmp.mkdirs()
    new java.io.FileOutputStream(new java.io.File(tmp, "junk")).close()
    val mf2 = ShardExport.write(corpus(300), dir, 4)
    assert(ShardExport.read(spark, dir).count() === 300)
    assert(mf2.agg(sum($"n_docs")).head().getLong(0) === 300L)
    assert(!tmp.exists(), "tmp dir must be consumed by the swap")
    assert(!new java.io.File(dir + ".old_").exists(), "aside must be dropped")
  }

  // Simulate the exact r11-verdict crash: writer died BETWEEN
  // rename(base→old) and rename(tmp→base) — base gone, last good
  // copy stranded in .old_, complete new export in .tmp_. recover
  // must roll FORWARD (tmp is complete: its _manifest landed last).
  test("recover rolls forward a complete tmp stranded between the two renames") {
    val dir = tmpDir()
    ShardExport.write(corpus(100), dir, 4) // v1 serving
    // build v2's complete tmp via the real writer, then arrange the
    // mid-swap state with plain renames (exactly what write does)
    val side = tmpDir()
    ShardExport.write(corpus(300), side, 4)
    assert(new java.io.File(side, "_manifest/_SUCCESS").exists(),
      "manifest _SUCCESS is the completeness marker — must exist")
    assert(new java.io.File(side).renameTo(new java.io.File(dir + ".tmp_")))
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old_")))
    // crash here: NO live export
    assert(!new java.io.File(dir).exists())
    assert(ShardExport.recover(spark, dir), "recover must leave an export readable")
    assert(ShardExport.read(spark, dir).count() === 300, "forward = the NEW export")
    assert(!new java.io.File(dir + ".tmp_").exists())
    assert(!new java.io.File(dir + ".old_").exists())
  }

  test("recover rolls back the aside when tmp is incomplete; a follow-up write never destroys the last good copy") {
    val dir = tmpDir()
    ShardExport.write(corpus(100), dir, 4) // v1 serving
    // crash state: aside taken, tmp only partially written (no
    // _manifest — the completeness marker is written last)
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old_")))
    val tmp = new java.io.File(dir + ".tmp_")
    tmp.mkdirs()
    new java.io.FileOutputStream(new java.io.File(tmp, "partial.parquet")).close()
    assert(ShardExport.recover(spark, dir), "recover must restore the aside")
    assert(ShardExport.read(spark, dir).count() === 100, "back = the OLD export")
    assert(!tmp.exists() && !new java.io.File(dir + ".old_").exists())
    // and the write entry path repairs the same state by itself
    // (the r11 hole: blind entry deletes destroyed the aside copy)
    assert(new java.io.File(dir).renameTo(new java.io.File(dir + ".old_")))
    tmp.mkdirs()
    val mf = ShardExport.write(corpus(250), dir, 4)
    assert(mf.agg(sum($"n_docs")).head().getLong(0) === 250L)
    assert(ShardExport.read(spark, dir).count() === 250)
  }

  test("recover is a clean no-op on a healthy or absent export") {
    val dir = tmpDir()
    assert(!ShardExport.recover(spark, dir), "nothing to recover")
    ShardExport.write(corpus(50), dir, 2)
    assert(ShardExport.recover(spark, dir))
    assert(ShardExport.read(spark, dir).count() === 50)
  }

  // r19 advice (high): a dir that EXISTS but holds no _manifest was
  // never an export — the r18 poisoning state, where the export-debt
  // clock was persisted INSIDE a not-yet-created export dir. Bare-
  // existence recovery then declared it readable and every restart
  // died in readManifest. recover must say "no export" and a
  // follow-up write must land cleanly over it.
  test("recover treats a manifest-less dir as no export; write recovers a poisoned dir") {
    val dir = tmpDir()
    val poisoned = new java.io.File(dir)
    poisoned.mkdirs()
    val out = new java.io.FileOutputStream(new java.io.File(poisoned, ".export_debt"))
    out.write("3".getBytes("UTF-8")); out.close()
    assert(!ShardExport.recover(spark, dir),
      "a dir without _manifest must not read as a live export")
    assert(poisoned.exists(), "recover must not destroy the dir (legacy debt clock)")
    val mf = ShardExport.write(corpus(40), dir, 2)
    assert(mf.agg(sum($"n_docs")).head().getLong(0) === 40L)
    assert(ShardExport.read(spark, dir).count() === 40)
    assert(ShardExport.recover(spark, dir))
  }

  // poisoned base + complete tmp (an r18 deployment that crashed
  // mid-swap after the poisoning): the incomplete base must not block
  // the roll-forward
  test("roll-forward clears a manifest-less base in its way") {
    val dir = tmpDir()
    val side = tmpDir()
    ShardExport.write(corpus(80), side, 2)
    assert(new java.io.File(side).renameTo(new java.io.File(dir + ".tmp_")))
    val poisoned = new java.io.File(dir)
    poisoned.mkdirs()
    new java.io.FileOutputStream(new java.io.File(poisoned, ".export_debt")).close()
    assert(ShardExport.recover(spark, dir), "complete tmp must roll forward")
    assert(ShardExport.read(spark, dir).count() === 80)
    assert(!new java.io.File(dir + ".tmp_").exists())
  }

  test("pipeline terminal exportShards lands the chain's survivors") {
    val dir = tmpDir()
    val mf = graft.ml.CorpusPipeline(corpus(200))
      .exactDedup()
      .exportShards(dir, 4)
    val n = mf.agg(sum($"n_docs")).head().getLong(0)
    assert(n === 200L)
    assert(ShardExport.read(spark, dir).count() === 200)
  }
}
