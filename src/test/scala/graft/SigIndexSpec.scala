package graft

import org.apache.spark.sql.functions._
import graft.ml.{Multimodal, SigIndex}

/** Stored bit-signature index: banded probe must equal the batch-form
  * hammingNearDupPairs restricted to batch-touching pairs; append is
  * additive + id-idempotent; cross-batch near-dups are caught FROM
  * the index; the pigeonhole precondition is enforced. */
class SigIndexSpec extends SparkSpec {
  import spark.implicits._

  private def randSig(seed: Long): String = {
    val r = new scala.util.Random(seed)
    Seq.fill(64)(if (r.nextBoolean()) '1' else '0').mkString
  }
  private def flip(sig: String, bits: Int, seed: Long): String = {
    val r = new scala.util.Random(seed)
    val idx = r.shuffle((0 until sig.length).toList).take(bits).toSet
    sig.zipWithIndex
      .map { case (c, i) => if (idx(i)) (if (c == '1') '0' else '1') else c }
      .mkString
  }

  test("probe equals the batch form on batch-touching pairs; append idempotent; cross-batch dup caught from the index") {
    // corpus: 6 well-separated random sigs + one planted near-pair
    val corpus = ((1L to 6L).map(i => (i, randSig(i * 37))) :+
      (7L, flip(randSig(2 * 37), 2, 99))).toDF("media_id", "sig")
    try {
      SigIndex.write(corpus, "media_id", "sig", "g_sigidx", bands = 8,
        buckets = 4)
      // batch: 100 ≈ corpus 3 (2 bits), 101 ≈ 102 within-batch (1 bit),
      // 103 unrelated
      val batch = Seq(
        (100L, flip(randSig(3 * 37), 2, 7)),
        (101L, randSig(555)),
        (102L, flip(randSig(555), 1, 8)),
        (103L, randSig(777))).toDF("media_id", "sig")
      val got = SigIndex.probe(spark, "g_sigidx", batch, "media_id", "sig",
          maxDist = 3, bands = 8)
        .as[(Long, Long, Int)].collect().toSet
      assert(got.map(p => (p._1, p._2)) === Set((3L, 100L), (101L, 102L)), got)
      // differential vs the batch form over the union, restricted to
      // pairs touching the batch (probe's contract excludes
      // corpus×corpus — those were screened when THEY were the batch)
      val batchIds = Set(100L, 101L, 102L, 103L)
      val full = Multimodal.hammingNearDupPairs(
          corpus.unionByName(batch), "media_id", "sig",
          maxDist = 3, bands = 8)
        .as[(Long, Long, Int)].collect().toSet
        .filter(p => batchIds(p._1) || batchIds(p._2))
      assert(got === full, s"probe diverged from batch form: $got vs $full")

      // append: additive, then a REPLAY is a no-op
      SigIndex.append(spark, "g_sigidx", batch, "media_id", "sig", bands = 8)
      val n1 = spark.table("g_sigidx").count()
      SigIndex.append(spark, "g_sigidx", batch, "media_id", "sig", bands = 8)
      assert(spark.table("g_sigidx").count() === n1, "replay appended rows")
      assert(spark.table("g_sigidx").select($"id").distinct().count() === 11L)

      // cross-batch: a later batch near APPENDED id 101 is caught
      // from the index, not from any in-memory state
      val b2 = Seq((200L, flip(randSig(555), 2, 9))).toDF("media_id", "sig")
      val got2 = SigIndex.probe(spark, "g_sigidx", b2, "media_id", "sig",
          maxDist = 3, bands = 8)
        .as[(Long, Long, Int)].collect().toSet
      assert(got2.map(p => (p._1, p._2)) === Set((101L, 200L), (102L, 200L)),
        got2)

      // pigeonhole precondition enforced, not silently under-recalled
      intercept[IllegalArgumentException] {
        SigIndex.probe(spark, "g_sigidx", b2, "media_id", "sig",
          maxDist = 8, bands = 8)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_sigidx")
    }
  }

  test("banding precondition: signature length must be a positive multiple of bands — bad rows fail loudly, never degrade") {
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    // len 60 with bands=8: floor-truncation would silently drop the
    // tail 4 bits from every band key
    val truncated = Seq((1L, randSig(11).take(60))).toDF("media_id", "sig")
    val e1 = intercept[Throwable] {
      SigIndex.bandRows(truncated, "media_id", "sig", 8).count()
    }
    assert(chain(e1).contains("multiple of bands"), chain(e1))
    // len 4 < bands=8: bandLen floor = 0, every key would be the
    // empty string and the candidate join would degenerate to all-pairs
    val short = Seq((1L, "1010")).toDF("media_id", "sig")
    val e2 = intercept[Throwable] {
      Multimodal.hammingNearDupPairs(
        short.unionByName(short.withColumn("media_id", lit(2L))),
        "media_id", "sig", maxDist = 2, bands = 8).count()
    }
    assert(chain(e2).contains("multiple of bands"), chain(e2))
    // a MIXED batch fails too (per-row check, not a first-row sample)
    val mixed = Seq((1L, randSig(12)), (2L, randSig(13).take(60)))
      .toDF("media_id", "sig")
    val e3 = intercept[Throwable] {
      SigIndex.bandRows(mixed, "media_id", "sig", 8).count()
    }
    assert(chain(e3).contains("multiple of bands"), chain(e3))
    // the valid shape still bands cleanly: 64/8 → 8 bands of 8
    val rows = SigIndex.bandRows(
      Seq((1L, randSig(14))).toDF("media_id", "sig"), "media_id", "sig", 8)
      .as[(Int, String, Long, String)].collect()
    assert(rows.length === 8 && rows.forall(_._2.length === 8))
  }

  // ---- compaction crash-window recovery (r17 — VERDICT r16 #4) ----
  // compactBucketedTable swaps via two catalog renames; a JVM death
  // between them leaves the live name absent. Each test constructs
  // one half-swapped catalog state by hand, then proves a REPLAY of
  // compactTombstones self-repairs (recoverSwap) and lands the
  // correct row set: tombstoned id gone, everything else present,
  // side tables dropped, tombstone set cleared.

  private def sigCorpus(tag: Long) =
    (1L to 5L).map(i => (i, randSig(i * 31 + tag))).toDF("media_id", "sig")

  /** live rows minus id 3, written bucketed under `table__new` — what
    * a crashed compaction's completed write-aside looks like. */
  private def handBuildNew(table: String): Unit =
    spark.table(table).filter(col("id") =!= 3L)
      .write.option("compression", "zstd")
      .bucketBy(4, "band", "key").sortBy("band", "key")
      .saveAsTable(table + "__new")

  private def assertRecovered(table: String): Unit = {
    assert(spark.catalog.tableExists(table))
    assert(!spark.catalog.tableExists(table + "__new"))
    assert(!spark.catalog.tableExists(table + "__old"))
    assert(!spark.catalog.tableExists(table + "_tombstones"),
      "tombstone set must be cleared after a completed compaction")
    val ids = spark.table(table).select("id").distinct()
      .as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L, 4L, 5L), ids.toSeq.toString)
  }

  test("compaction replay recovers mid-swap crash: live missing, __old + __new present → roll forward") {
    val t = "g_ts_fwd"
    try {
      SigIndex.write(sigCorpus(100), "media_id", "sig", t, bands = 8,
        buckets = 4)
      SigIndex.addTombstones(spark, t, Seq(3L).toDF("id"))
      // crash state: write-aside committed, first rename landed, JVM
      // died before the promote — live name absent
      handBuildNew(t)
      spark.sql(s"ALTER TABLE $t RENAME TO ${t}__old")
      assert(!spark.catalog.tableExists(t))
      SigIndex.compactTombstones(spark, t) // replay self-repairs
      assertRecovered(t)
    } finally Seq(t, t + "__new", t + "__old", t + "_tombstones")
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("compaction replay recovers: live missing, only __old present → roll back, then compact") {
    val t = "g_ts_back"
    try {
      SigIndex.write(sigCorpus(200), "media_id", "sig", t, bands = 8,
        buckets = 4)
      SigIndex.addTombstones(spark, t, Seq(3L).toDF("id"))
      // crash state: aside landed but no committed __new survives
      // (operator cleanup of a half-written aside) — roll back
      spark.sql(s"ALTER TABLE $t RENAME TO ${t}__old")
      assert(!spark.catalog.tableExists(t))
      SigIndex.compactTombstones(spark, t)
      assertRecovered(t)
    } finally Seq(t, t + "__new", t + "__old", t + "_tombstones")
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }

  test("compaction replay recovers: live present with __old straggler → straggler dropped") {
    val t = "g_ts_strag"
    try {
      SigIndex.write(sigCorpus(300), "media_id", "sig", t, bands = 8,
        buckets = 4)
      SigIndex.addTombstones(spark, t, Seq(3L).toDF("id"))
      // crash state: promote landed, died before the final __old drop
      spark.table(t).write.option("compression", "zstd")
        .bucketBy(4, "band", "key").sortBy("band", "key")
        .saveAsTable(t + "__old")
      SigIndex.compactTombstones(spark, t)
      assertRecovered(t)
    } finally Seq(t, t + "__new", t + "__old", t + "_tombstones")
      .foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
  }
}
