package graft

import org.apache.spark.sql.functions._
import graft.ml.{NgramIndex, TextDedup}

/** Stored n-gram postings index: the indexed plans must equal the
  * ad-hoc TextDedup forms row-for-row (q125/q126 gate them against
  * the DuckDB oracles; this spec pins the differential at unit scale
  * plus the storage contract the oracles can't see — hot-shingle
  * truncation, dfCap-vs-dfMax enforcement, merged-df re-capping). */
class NgramIndexSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with real structure: shared boilerplate (hot grams),
  // a near-dup pair, a containment pair, and unique docs
  private def docs = Seq(
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of 1
    (3, "kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi"),
    (4, "kappa lambda mu nu xi omicron"), // contained in 3
    (5, "completely different words live in this document only"),
    (6, "common filler common filler common filler distinct tail one"),
    (7, "common filler common filler common filler distinct tail two"))
    .toDF("doc_id", "text")

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("g_ngidx").toString + "/idx"

  test("pairsJaccard from the stored index equals jaccardPairsPostings; pairsContainment equals containmentPairsPostings") {
    val dir = freshDir()
    NgramIndex.build(docs, dir, n = 3, dfMax = 8)
    val gotJ = NgramIndex.pairsJaccard(spark, dir, threshold = 0.1, dfCap = 4)
      .as[(Int, Int, Double)].collect().toSet
    val wantJ = TextDedup.jaccardPairsPostings(docs, n = 3,
        threshold = 0.1, dfCap = 4)
      .as[(Int, Int, Double)].collect().toSet
    assert(gotJ === wantJ && gotJ.nonEmpty, s"jaccard: $gotJ vs $wantJ")
    val gotC = NgramIndex.pairsContainment(spark, dir, threshold = 0.5,
        dfCap = 4)
      .as[(Int, Int, Long, Double, Long, Long)].collect().toSet
    val wantC = TextDedup.containmentPairsPostings(docs, n = 3,
        threshold = 0.5, dfCap = 4)
      .as[(Int, Int, Long, Double, Long, Long)].collect().toSet
    assert(gotC === wantC && gotC.nonEmpty, s"containment: $gotC vs $wantC")
  }

  test("probeContainment: stored corpus + self-tokenized batch equals the from-scratch incremental form, including merged-df re-capping") {
    val dir = freshDir()
    val corpus = docs.filter($"doc_id" <= 5)
    val batch = Seq(
      (8, "kappa lambda mu nu xi omicron pi rho"), // contained in 3
      // shares the 'alpha beta gamma' gram family with corpus 1/2:
      // merged df for those grams crosses a tight cap, exercising the
      // re-cap path (a gram rare in the corpus goes hot with batches)
      (9, "alpha beta gamma delta epsilon zeta eta theta wholly"),
      (10, "alpha beta gamma delta epsilon zeta eta theta fully"))
      .toDF("doc_id", "text")
    NgramIndex.build(corpus, dir, n = 3, dfMax = 8)
    for (cap <- Seq(3, 8)) {
      val got = NgramIndex.probeContainment(spark, dir, batch,
          threshold = 0.3, dfCap = cap)
        .as[(Int, Int, Long, Double, Long, Long)].collect().toSet
      val want = TextDedup.containmentPairsIncremental(
          corpus.unionByName(batch), $"doc_id" >= 8, n = 3,
          threshold = 0.3, dfCap = cap)
        .as[(Int, Int, Long, Double, Long, Long)].collect().toSet
      assert(got === want, s"cap=$cap: $got vs $want")
      assert(got.nonEmpty, s"cap=$cap vacuous")
    }
  }

  test("storage contract: hot shingles keep df but store EMPTY lists; probes refuse dfCap > dfMax") {
    val dir = freshDir()
    // 'common filler common' etc appear in docs 6+7 only; with dfMax=1
    // every df-2 gram stores empty
    NgramIndex.build(docs, dir, n = 3, dfMax = 2)
    val stored = spark.read.parquet(s"$dir/postings")
    val hot = stored.filter($"df" > 2)
    assert(hot.count() === 0L) // this corpus has max df 2 (pairs only)
    val df2 = stored.filter($"df" === 2)
    assert(df2.count() > 0L)
    assert(df2.filter(size($"docs") =!= 2).count() === 0L,
      "df<=dfMax lists must be complete")
    val dir2 = freshDir()
    NgramIndex.build(docs, dir2, n = 3, dfMax = 1)
    val stored2 = spark.read.parquet(s"$dir2/postings")
    val truncated = stored2.filter($"df" === 2)
    assert(truncated.count() > 0L)
    assert(truncated.filter(size($"docs") =!= 0).count() === 0L,
      "df>dfMax lists must store empty")
    intercept[IllegalArgumentException] {
      NgramIndex.pairsJaccard(spark, dir2, threshold = 0.1, dfCap = 2)
    }
    intercept[IllegalArgumentException] {
      NgramIndex.probeContainment(spark, dir2,
        Seq((9, "x y z")).toDF("doc_id", "text"), threshold = 0.1,
        dfCap = 50)
    }
  }

  test("append: incremental fold equals a from-scratch build; probes agree; replay no-op on complete rows") {
    val dir = freshDir()
    val corpus = docs.filter($"doc_id" <= 5)
    // batch shares grams with corpus docs 1/2 (merged df grows) and
    // carries its own near-dup pair (6/7's common filler)
    val batch = docs.filter($"doc_id" >= 6)
      .unionByName(Seq(
        (8, "alpha beta gamma delta epsilon zeta brand new ending"))
        .toDF("doc_id", "text"))
    NgramIndex.build(corpus, dir, n = 3, dfMax = 8)
    NgramIndex.append(spark, dir, batch)
    val dirFull = freshDir()
    NgramIndex.build(docs.unionByName(Seq(
        (8, "alpha beta gamma delta epsilon zeta brand new ending"))
        .toDF("doc_id", "text")),
      dirFull, n = 3, dfMax = 8)
    def rows(d: String) = spark.read.parquet(s"$d/postings")
      .as[(Long, Long, Seq[Int])].collect().toSet
    assert(rows(dir) === rows(dirFull), "appended index != from-scratch build")
    // probes over the appended index equal the ad-hoc full forms
    val all = docs.unionByName(Seq(
      (8, "alpha beta gamma delta epsilon zeta brand new ending"))
      .toDF("doc_id", "text"))
    val gotJ = NgramIndex.pairsJaccard(spark, dir, 0.1, dfCap = 4)
      .as[(Int, Int, Double)].collect().toSet
    val wantJ = TextDedup.jaccardPairsPostings(all, n = 3, threshold = 0.1,
        dfCap = 4)
      .as[(Int, Int, Double)].collect().toSet
    assert(gotJ === wantJ && gotJ.nonEmpty)
    // replay: the identical batch re-merged changes nothing
    val before = rows(dir)
    NgramIndex.append(spark, dir, batch)
    assert(rows(dir) === before, "replayed append changed the postings")
  }

  test("append: a complete row crossing dfMax truncates like a fresh build; hot-row df inflation under replay is monotone and stays above every legal cap") {
    val dir = freshDir()
    // dfMax=1: corpus pair-grams (df 2) store EMPTY from the start
    NgramIndex.build(docs.filter($"doc_id" <= 5), dir, n = 3, dfMax = 1)
    val batch = Seq(
      (9, "alpha beta gamma delta epsilon zeta eta theta again"))
      .toDF("doc_id", "text")
    NgramIndex.append(spark, dir, batch)
    val dirFull = freshDir()
    NgramIndex.build(
      docs.filter($"doc_id" <= 5).unionByName(batch), dirFull, n = 3,
      dfMax = 1)
    def rows(d: String) = spark.read.parquet(s"$d/postings")
      .as[(Long, Long, Seq[Int])].collect().toSet
    assert(rows(dir) === rows(dirFull),
      "crossing-to-hot truncation diverged from a fresh build")
    // replay: hot rows may inflate df (can't dedup unknown membership)
    // but never shrink, never regain a list, and the complete rows
    // stay byte-identical
    val before = rows(dir).map(r => r._1 -> r).toMap
    NgramIndex.append(spark, dir, batch)
    val after = rows(dir).map(r => r._1 -> r).toMap
    assert(after.keySet === before.keySet)
    before.foreach { case (sh, (_, df0, docs0)) =>
      val (_, df1, docs1) = after(sh)
      if (df0 <= 1) assert((df1, docs1) === ((df0, docs0)), s"complete row $sh moved")
      else { assert(df1 >= df0, s"hot row $sh shrank"); assert(docs1.isEmpty) }
    }
  }

  test("plan pin: indexed probes never touch text — no tokenize/hash work in the pairsJaccard plan; probeContainment hashes only the batch") {
    val dir = freshDir()
    NgramIndex.build(docs, dir, n = 3, dfMax = 8)
    // full-corpus probe: the whole point is zero text processing —
    // no split/xxhash64 anywhere in the optimized plan, and the scan
    // reads the index parquet, not a documents table
    val p = NgramIndex.pairsJaccard(spark, dir, 0.1, dfCap = 4)
      .queryExecution.optimizedPlan.toString()
    assert(!p.contains("xxhash64") && !p.toLowerCase.contains("split("),
      p.take(2000))
    assert(p.contains("Relation [shingle") && p.contains("parquet"),
      p.take(2000))
    // incremental probe: exactly the BATCH side tokenizes — the plan
    // carries hash work (for the batch) but scans the index for the
    // corpus side
    val batch = Seq((9, "alpha beta gamma fresh tail")).toDF("doc_id", "text")
    val p2 = NgramIndex.probeContainment(spark, dir, batch, 0.3, dfCap = 4)
      .queryExecution.optimizedPlan.toString()
    assert(p2.contains("xxhash64") && p2.contains("Relation [shingle"),
      p2.take(2000))
  }

  test("append swap repair: committed stage completes the interrupted swap; an __old-only dir is restored, never deleted; uncommitted stage dropped") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def state(dir: String) = spark.read.parquet(s"$dir/postings")
      .as[(Long, Long, Seq[Int])].collect().toSet

    // (1) committed stage + live still pre-merge: repair must finish
    // the swap (the staged merge supersedes live by single-writer)
    val d1 = freshDir()
    NgramIndex.build(docs.filter($"doc_id" <= 5), d1, n = 3, dfMax = 8)
    val batch = docs.filter($"doc_id" >= 6)
    NgramIndex.append(spark, d1, batch) // clean append for the target state
    val want = state(d1)
    // rebuild the pre-merge live, then plant the merged result as a
    // COMMITTED stage (simulates a kill between stage write and swap)
    val d2 = freshDir()
    NgramIndex.build(docs.filter($"doc_id" <= 5), d2, n = 3, dfMax = 8)
    val d2live = new Path(s"$d2/postings")
    val d2stage = new Path(s"$d2/postings__stage")
    val d1live = new Path(s"$d1/postings")
    // copy d1's merged postings in as d2's stage
    org.apache.hadoop.fs.FileUtil.copy(fs, d1live, fs, d2stage, false,
      spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(d2stage, "_SUCCESS")), "fixture: stage must look committed")
    // next probe triggers entry repair through postingsFrame
    val probed = NgramIndex.pairsJaccard(spark, d2, 0.1, dfCap = 4).count()
    assert(state(d2) === want, "committed stage was not rolled forward")
    assert(!fs.exists(d2stage) && !fs.exists(new Path(s"$d2/postings__old")))
    assert(probed > 0)

    // (2) live missing, only __old survives: defensive restore
    val d3 = freshDir()
    NgramIndex.build(docs, d3, n = 3, dfMax = 8)
    val pre = state(d3)
    assert(fs.rename(new Path(s"$d3/postings"), new Path(s"$d3/postings__old")))
    NgramIndex.append(spark, d3,
      Seq((9, "wholly novel appended words after the anomaly")).toDF("doc_id", "text"))
    val post = state(d3)
    // the appended doc's words are novel → its gram rows are disjoint
    // from pre's, so post must be EXACTLY pre plus the new rows
    assert(pre.subsetOf(post), "restored content lost")
    assert(post.exists(_._3.contains(9)), "append after restore missing")

    // (3) uncommitted stage is dropped, live untouched
    val d4 = freshDir()
    NgramIndex.build(docs, d4, n = 3, dfMax = 8)
    val before4 = state(d4)
    val junkStage = new Path(s"$d4/postings__stage")
    fs.mkdirs(junkStage)
    val out = fs.create(new Path(junkStage, "part-junk.parquet"), true)
    out.write("partial garbage".getBytes("UTF-8")); out.close()
    // no _SUCCESS → entry repair must delete it and read live cleanly
    val d4n = NgramIndex.pairsJaccard(spark, d4, 0.1, dfCap = 4).count()
    assert(!fs.exists(junkStage))
    assert(state(d4) === before4)
    assert(d4n > 0)
  }

  test("id-type guard: a batch whose doc_id narrows the stored id type is refused; widening is accepted") {
    // int-id index, long-id batch: the silent non-ANSI cast would wrap
    // ids past Int range into corrupted postings — must throw instead
    val dir = freshDir()
    NgramIndex.build(docs, dir, n = 3, dfMax = 8)
    val longBatch = Seq((3_000_000_000L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val eA = intercept[IllegalArgumentException] {
      NgramIndex.append(spark, dir, longBatch)
    }
    assert(eA.getMessage.contains("not losslessly castable"))
    val eP = intercept[IllegalArgumentException] {
      NgramIndex.probeContainment(spark, dir, longBatch, 0.5, dfCap = 4)
    }
    assert(eP.getMessage.contains("not losslessly castable"))

    // long-id index, int-id batch: lossless widening — works, and the
    // probe output matches the from-scratch incremental form
    val dirL = freshDir()
    val corpusL = docs.filter($"doc_id" <= 5)
      .select($"doc_id".cast("long").as("doc_id"), $"text")
    NgramIndex.build(corpusL, dirL, n = 3, dfMax = 8)
    val intBatch = Seq((8, "kappa lambda mu nu xi omicron pi rho"))
      .toDF("doc_id", "text")
    val got = NgramIndex.probeContainment(spark, dirL, intBatch, 0.5, dfCap = 4)
      .as[(Long, Long, Long, Double, Long, Long)].collect().toSet
    val want = TextDedup.containmentPairsIncremental(
        corpusL.withColumn("is_new", lit(false)).unionByName(
          intBatch.select($"doc_id".cast("long").as("doc_id"), $"text")
            .withColumn("is_new", lit(true))),
        $"is_new", n = 3, threshold = 0.5, dfCap = 4)
      .as[(Long, Long, Long, Double, Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
    NgramIndex.append(spark, dirL, intBatch) // must not throw
    assert(NgramIndex.pairsContainment(spark, dirL, 0.5, dfCap = 4)
      .count() >= got.size)
  }

  test("build atomicity: a stage that died between parquet and meta is dropped, live survives; a dir with postings but no meta anywhere is cleanly detected; v1 root _meta is still readable") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)

    // (1) kill between the stage's parquet commit and its meta write:
    // parquet _SUCCESS present, _graft_meta absent → NOT committed;
    // entry repair drops the stage and live keeps serving
    val d1 = freshDir()
    NgramIndex.build(docs, d1, n = 3, dfMax = 8)
    val before = spark.read.parquet(s"$d1/postings")
      .as[(Long, Long, Seq[Int])].collect().toSet
    val stage = new Path(s"$d1/postings__stage")
    org.apache.hadoop.fs.FileUtil.copy(fs, new Path(s"$d1/postings"),
      fs, stage, false, spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(stage, "_graft_meta"), false) // simulate the kill
    assert(fs.exists(new Path(stage, "_SUCCESS")),
      "fixture: parquet looks committed")
    val n1 = NgramIndex.pairsJaccard(spark, d1, 0.1, dfCap = 4).count()
    assert(n1 > 0 && !fs.exists(stage))
    assert(spark.read.parquet(s"$d1/postings")
      .as[(Long, Long, Seq[Int])].collect().toSet === before)

    // (2) postings with no meta anywhere (the pre-r15 half-built
    // state): detected loudly, not served with garbage parameters
    val d2 = freshDir()
    NgramIndex.build(docs, d2, n = 3, dfMax = 8)
    fs.delete(new Path(s"$d2/postings/_graft_meta"), false)
    val e = intercept[IllegalStateException] {
      NgramIndex.meta(spark, d2)
    }
    assert(e.getMessage.contains("incomplete"))

    // (3) a v1-era dir (meta at the root, none in postings/) still
    // reads via the legacy fallback
    val d3 = freshDir()
    NgramIndex.build(docs, d3, n = 3, dfMax = 8)
    fs.rename(new Path(s"$d3/postings/_graft_meta"), new Path(s"$d3/_meta"))
    assert(NgramIndex.meta(spark, d3) === NgramIndex.Meta(3, 8))
    assert(NgramIndex.pairsJaccard(spark, d3, 0.1, dfCap = 4).count() > 0)
  }

  test("ensure: builds once per corpus fingerprint; separate tags coexist") {
    val sfDir = java.nio.file.Files.createTempDirectory("g_ngsf").toString
    docs.coalesce(1).write.parquet(s"$sfDir/documents.parquet")
    val d1 = NgramIndex.ensure(spark, sfDir, docs, n = 3, dfMax = 8, "full")
    val t1 = new java.io.File(s"$d1/postings").lastModified()
    // second ensure: same fingerprint, no rebuild
    val d1b = NgramIndex.ensure(spark, sfDir, docs, n = 3, dfMax = 8, "full")
    assert(d1b === d1)
    assert(new java.io.File(s"$d1/postings").lastModified() === t1)
    // a different tag is its own index dir
    val d2 = NgramIndex.ensure(spark, sfDir,
      docs.filter($"doc_id" <= 3), n = 4, dfMax = 8, "slice")
    assert(d2 !== d1)
    assert(NgramIndex.meta(spark, d2) === NgramIndex.Meta(4, 8))
  }

  test("probeNovelty: per-doc novelty equals a driver-side reference over the stored vocabulary; 0.0 for a pure replay, 1.0 for all-new content") {
    val dir = freshDir()
    NgramIndex.build(docs.select($"doc_id", $"text"), dir, n = 3, dfMax = 64)
    // driver-side reference: the corpus's distinct 3-gram vocabulary
    def grams(t: String): Set[String] = {
      val toks = t.split(" ").toSeq
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val vocab = docs.collect()
      .flatMap(r => grams(r.getString(1))).toSet
    val batch = Seq(
      (100, "alpha beta gamma delta epsilon zeta"), // = doc 1's text? mixed
      (101, "totally unseen words arranged in a fresh novel order today"),
      (102, docs.filter($"doc_id" === 5).head().getString(1))) // replay text
      .toDF("doc_id", "text")
    val got = NgramIndex.probeNovelty(spark, dir, batch)
      .as[(Int, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = batch.collect().map { r =>
      val g = grams(r.getString(1))
      val novel = g.count(x => !vocab.contains(x)).toLong
      r.getInt(0) -> (g.size.toLong, novel,
        math.rint(novel.toDouble / g.size * 10000) / 10000.0)
    }.toMap
    assert(got === want)
    assert(got(101)._3 === 1.0, "all-new content must score 1.0")
    assert(got(102)._3 === 0.0, "replayed corpus text must score 0.0")
  }

  test("tombstones: forget is immediate on every probe; compact equals a from-scratch build on the remaining docs; deletion feed is idempotent") {
    val dir = freshDir()
    NgramIndex.build(docs, dir, n = 3, dfMax = 8)
    // delete doc 2 (the near-dup of 1) and doc 4 (contained in 3)
    NgramIndex.addTombstones(spark, dir, Seq(2, 4).toDF("doc_id"))
    val remaining = docs.filter(!$"doc_id".isin(2, 4))
    def pairsOf(d: String) =
      NgramIndex.pairsJaccard(spark, d, 0.1, 4)
        .as[(Int, Int, Double)].collect().toSet
    def contOf(d: String) =
      NgramIndex.pairsContainment(spark, d, 0.5, 4)
        .as[(Int, Int, Long, Double, Long, Long)].collect().toSet
    // immediate forget: no deleted id in any probe output, and (this
    // fixture has no cap-boundary grams) exact from-scratch equality
    val wantJ = TextDedup.jaccardPairsPostings(remaining, 3, 0.1, 4)
      .as[(Int, Int, Double)].collect().toSet
    assert(pairsOf(dir) === wantJ)
    val wantC = TextDedup.containmentPairsPostings(remaining, 3, 0.5, 4)
      .as[(Int, Int, Long, Double, Long, Long)].collect().toSet
    assert(contOf(dir) === wantC)
    // the probe path too: batch pairs never mention a deleted id
    val batch = Seq((8, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text") // near-dup of deleted 2 AND of live 1
    val probed = NgramIndex.probeContainment(spark, dir, batch, 0.5, 8)
      .select($"doc_a", $"doc_b").as[(Int, Int)].collect()
    assert(probed.nonEmpty, "the live near-dup must still pair")
    assert(!probed.exists(p => Set(p._1, p._2).intersect(Set(2, 4)).nonEmpty))
    // idempotent feed: re-adding the same ids appends nothing new
    NgramIndex.addTombstones(spark, dir, Seq(2, 4, 2).toDF("doc_id"))
    assert(pairsOf(dir) === wantJ)
    // compact: physical rewrite equals a fresh build on the remaining
    // docs; tombstone set cleared; results unchanged
    NgramIndex.compactTombstones(spark, dir)
    val fresh = freshDir()
    NgramIndex.build(remaining, fresh, n = 3, dfMax = 8)
    assert(pairsOf(dir) === pairsOf(fresh) && contOf(dir) === contOf(fresh))
    assert(!new java.io.File(s"$dir/tombstones").exists,
      "compact must clear the tombstone set")
    // resurrection is explicit: post-compact the id appends cleanly...
    NgramIndex.append(spark, dir,
      Seq((2, "alpha beta gamma delta epsilon zeta eta iota")).toDF("doc_id", "text"))
    assert(pairsOf(dir).exists(p => p._1 == 1 && p._2 == 2),
      "re-added doc must pair again after compact")
  }

  test("tombstones: resurrection before compact is refused; a rebuild starts clean; hot-gram conservatism is the safe direction") {
    val dir = freshDir()
    NgramIndex.build(docs, dir, n = 3, dfMax = 8)
    NgramIndex.addTombstones(spark, dir, Seq(1).toDF("doc_id"))
    intercept[IllegalArgumentException] {
      NgramIndex.append(spark, dir,
        Seq((1, "alpha beta gamma")).toDF("doc_id", "text"))
    }
    // rebuild of a NEW corpus clears the stale tombstone set
    NgramIndex.build(docs, dir, n = 3, dfMax = 8)
    assert(NgramIndex.pairsJaccard(spark, dir, 0.1, 4)
      .as[(Int, Int, Double)].collect()
      .exists(p => p._1 == 1 || p._2 == 1),
      "doc 1 must participate again after a rebuild")
    // hot-gram conservatism: a gram hot at build (df > dfMax) stays
    // excluded even when deletions would bring its df under the cap —
    // fewer pairs than from-scratch (never a leak), recovered at
    // rebuild. Corpus: 4 docs sharing one gram, dfMax 3 → hot.
    val hotDocs = Seq(
      (1, "shared gram here padding aa"), (2, "shared gram here padding bb"),
      (3, "shared gram here padding cc"), (4, "shared gram here padding dd"))
      .toDF("doc_id", "text")
    val hd = freshDir()
    NgramIndex.build(hotDocs, hd, n = 3, dfMax = 3)
    NgramIndex.addTombstones(spark, hd, Seq(3, 4).toDF("doc_id"))
    // remaining df for "shared gram here" is 2 <= cap, but the list
    // was never stored: conservative = no pairs pre-rebuild
    assert(NgramIndex.pairsJaccard(spark, hd, 0.1, 3).count() === 0L)
    NgramIndex.compactTombstones(spark, hd)
    assert(NgramIndex.pairsJaccard(spark, hd, 0.1, 3).count() === 0L,
      "compact cannot recover a list that was never stored")
    NgramIndex.build(hotDocs.filter(!$"doc_id".isin(3, 4)), hd, n = 3, dfMax = 3)
    assert(NgramIndex.pairsJaccard(spark, hd, 0.1, 3).count() > 0L,
      "a rebuild recovers the now-rare gram")
  }
}
