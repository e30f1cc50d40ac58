package graft

import org.apache.spark.sql.functions._
import graft.ml.FuzzyJoin

/** Blocked fuzzy join: distances must equal an independent
  * edit-distance implementation, the length prefilter must be a true
  * lower bound (it can never drop a real match), and the hot-block
  * cap must drop oversized blocks wholesale (q130 gates the same
  * pipeline against DuckDB's levenshtein at data scale). */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: the classic O(nm) DP, written fresh here
    * so the spec does not trust the engine function it checks. */
  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private val vocab = Array("alpha", "beta", "gamma", "delta", "epsln")
  private def randStr(r: scala.util.Random) =
    Seq.fill(2 + r.nextInt(4))(vocab(r.nextInt(vocab.length))).mkString(" ")

  test("differential: candidate pairs and distances equal the brute-force blocked reference") {
    val r = new scala.util.Random(41)
    val rows = (0L until 60L).map(id => (id, randStr(r)))
    val df = rows.toDF("id", "s")
    val maxDist = 6
    val got = FuzzyJoin.blockedCandidates(df, "id", "s",
        substring(col("s"), 1, 3), maxDist, blockCap = 1000)
      .as[(Long, Long, Long, Boolean)].collect().toSet
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.take(3) == sb.take(3)
      if math.abs(sa.length - sb.length) <= maxDist
    } yield (ia, ib, editDist(sa, sb).toLong,
        editDist(sa, sb) <= maxDist)).toSet
    assert(got === want && got.nonEmpty, s"${got.size} vs ${want.size}")
    assert(got.exists(_._4) && got.exists(!_._4),
      "fixture must exercise both match and reject")
  }

  test("length prefilter is a true lower bound: no pair it prunes could have matched") {
    val r = new scala.util.Random(5)
    val rows = (0L until 80L).map(id => (id, randStr(r)))
    val maxDist = 3
    // every same-block pair the operator did NOT emit was pruned by
    // the length bound — its true distance must exceed maxDist
    val emitted = FuzzyJoin.blockedCandidates(rows.toDF("id", "s"), "id", "s",
        substring(col("s"), 1, 2), maxDist, blockCap = 1000)
      .as[(Long, Long, Long, Boolean)].collect().map(t => (t._1, t._2)).toSet
    val pruned = for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && sa.take(2) == sb.take(2)
      if !emitted.contains((ia, ib))
    } yield (ia, ib, sa, sb)
    assert(pruned.nonEmpty, "fixture must exercise the prefilter")
    pruned.foreach { case (ia, ib, sa, sb) =>
      assert(math.abs(sa.length - sb.length) > maxDist,
        s"($ia,$ib) pruned but lengths within bound")
      assert(editDist(sa, sb) > maxDist,
        s"($ia,$ib) pruned a TRUE match: '$sa' vs '$sb'")
    }
  }

  test("hot-block cap drops oversized blocks wholesale; small blocks are unaffected; matches() is the filtered view") {
    val hot = (0L until 10L).map(i => (i, s"HOT common text $i"))
    val cold = Seq((100L, "COLD shared words here"),
      (101L, "COLD shared words hero"), (102L, "COLD other thing entirely"))
    val df = (hot ++ cold).toDF("id", "s")
    val out = FuzzyJoin.blockedCandidates(df, "id", "s",
        substring(col("s"), 1, 4), maxDist = 4, blockCap = 5)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(!out.exists(_._1 < 100L), "hot block (10 > cap 5) must be dropped")
    assert(out.map(t => (t._1, t._2)).toSet ===
      Set((100L, 101L), (100L, 102L), (101L, 102L)))
    val m = FuzzyJoin.matches(df, "id", "s",
        substring(col("s"), 1, 4), maxDist = 4, blockCap = 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(m === out.filter(_._4).map(t => (t._1, t._2, t._3)).toSet)
    assert(m.contains((100L, 101L, 1L)), "the 1-edit pair must match")
    // raising the cap readmits the hot block
    val all = FuzzyJoin.blockedCandidates(df, "id", "s",
        substring(col("s"), 1, 4), maxDist = 4, blockCap = 100).count()
    assert(all === (45 + 3).toLong)
  }

  test("FuzzyIndex: stored probe equals the ad-hoc form over corpus ∪ batch (batch-touching pairs); append is id-idempotent; replay echoes excluded") {
    val corpus = Seq((1L, "k1", "alpha beta gamma"), (2L, "k2", "delta epsilon zeta"))
      .toDF("id", "blk", "s")
    val batch = Seq(
      (10L, "k1", "alpha beta gamub"), // 2 edits from doc 1
      (11L, "k1", "alpha beta gamub"), // in-batch exact dup of 10
      (12L, "k3", "totally new block"))
      .toDF("id", "blk", "s")
    graft.store.Bucketing.dropWithDir(spark, "g_fuzzy_t1")
    FuzzyJoin.FuzzyIndex.write(corpus, "g_fuzzy_t1", "id", "s", col("blk"))
    val got = FuzzyJoin.FuzzyIndex.probe(spark, "g_fuzzy_t1", batch,
        "id", "s", col("blk"), maxDist = 4)
      .as[(Long, Long, Long)].collect().toSet
    // corpus×batch matches AND the in-batch pair; nothing for k3
    assert(got === Set((1L, 10L, 2L), (1L, 11L, 2L), (10L, 11L, 0L)))
    // append folds the batch in; a replayed append is a no-op
    FuzzyJoin.FuzzyIndex.append(spark, "g_fuzzy_t1", batch, "id", "s", col("blk"))
    val n1 = spark.table("g_fuzzy_t1").count()
    FuzzyJoin.FuzzyIndex.append(spark, "g_fuzzy_t1", batch, "id", "s", col("blk"))
    assert(spark.table("g_fuzzy_t1").count() === n1 && n1 === 5L)
    // replay echo: re-probing the SAME batch self-pairs are excluded;
    // surviving pairs are only the genuine distinct-id matches
    val echo = FuzzyJoin.FuzzyIndex.probe(spark, "g_fuzzy_t1", batch,
        "id", "s", col("blk"), maxDist = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(!echo.exists(p => p._1 == p._2))
    assert(echo === Set((1L, 10L, 2L), (1L, 11L, 2L), (10L, 11L, 0L)))
    // hot-block cap counts the COMBINED population: k1 holds 2 stored
    // + 2 batch rows = 4 > cap 3 → the block is refused wholesale
    val capped = FuzzyJoin.FuzzyIndex.probe(spark, "g_fuzzy_t1",
        Seq((20L, "k1", "alpha beta gamma")).toDF("id", "blk", "s"),
        "id", "s", col("blk"), maxDist = 4, blockCap = 3)
    assert(capped.count() === 0)
  }

  test("FuzzyIndex: replay probe census counts a replayed doc ONCE — a block exactly at the cap still screens on replay (r15 advice)") {
    // block kb holds exactly blockCap=3 docs once 30/31 are appended;
    // a replay of the same batch must still emit the SAME pairs — the
    // pre-r16 census counted replayed ids twice (stored + batch copy),
    // read 5 > cap and refused the block, silently weakening the
    // replay-deterministic drop contract.
    val corpus = Seq((30L, "kb", "aa bb cc"), (31L, "kb", "aa bb cd"),
      (32L, "kb", "aa bb ce")).toDF("id", "blk", "s")
    graft.store.Bucketing.dropWithDir(spark, "g_fuzzy_t2")
    FuzzyJoin.FuzzyIndex.write(corpus, "g_fuzzy_t2", "id", "s", col("blk"))
    val replay = corpus.filter(col("id") >= 31L) // 31,32 replayed
    val got = FuzzyJoin.FuzzyIndex.probe(spark, "g_fuzzy_t2", replay,
        "id", "s", col("blk"), maxDist = 2, blockCap = 3)
      .as[(Long, Long, Long)].collect().toSet
    // all batch-touching pairs of the 3-doc block survive at cap 3
    assert(got === Set((30L, 31L, 1L), (30L, 32L, 1L), (31L, 32L, 1L)))
  }

  test("FuzzyIndex: append's replay check is block-restricted — stored scan is semi-joined on batch blocks before the id distinct (r16)") {
    val corpus = Seq((1L, "k1", "alpha beta"), (2L, "k2", "gamma delta"))
      .toDF("id", "blk", "s")
    graft.store.Bucketing.dropWithDir(spark, "g_fuzzy_t3")
    FuzzyJoin.FuzzyIndex.write(corpus, "g_fuzzy_t3", "id", "s", col("blk"))
    val batch = Seq((1L, "k1", "alpha beta"), (9L, "k1", "alpha betb"))
      .toDF("id", "blk", "s")
    // plan pin: the replay-check frame restricts the stored scan with
    // a LeftSemi on blk — the corpus-wide distinct of the pre-r16 form
    // had no semi join in its plan at all
    val probeSide = FuzzyJoin.FuzzyIndex.storedIdsInBatchBlocks(
      spark, "g_fuzzy_t3", batch)
    assert(probeSide.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
      "append's stored-id scan must be block-restricted")
    // functional: replayed id 1 skipped, fresh id 9 lands, and a
    // second identical append is a pure no-op
    FuzzyJoin.FuzzyIndex.append(spark, "g_fuzzy_t3", batch, "id", "s", col("blk"))
    assert(spark.table("g_fuzzy_t3").count() === 3L)
    FuzzyJoin.FuzzyIndex.append(spark, "g_fuzzy_t3", batch, "id", "s", col("blk"))
    assert(spark.table("g_fuzzy_t3").count() === 3L)
    assert(spark.table("g_fuzzy_t3").select("id").as[Long].collect().toSet
      === Set(1L, 2L, 9L))
  }

  test("blockingRecallProbe: counts cross-block losses AND hot-block-cap losses against the brute-force truth (r16)") {
    // sample = even ids. True pairs (levenshtein <= 2 on s):
    //   (2,3):  same block b1 — found at any cap >= 2
    //   (4,5):  DIFFERENT blocks (b2/b3) — a structural blocking miss
    //   (6,7),(6,8),(7,8): block b4 of size 3 — found at cap >= 3,
    //     refused wholesale at cap 2
    // (1,9) shares block b0 but dist > 2: never a true pair.
    val df = Seq(
      (1L, "b0", "aaaaaa"), (9L, "b0", "zzzzzz"),
      (2L, "b1", "hello"), (3L, "b1", "hallo"),
      (4L, "b2", "world"), (5L, "b3", "worlb"),
      (6L, "b4", "kitten"), (7L, "b4", "kittes"), (8L, "b4", "kitter"))
      .toDF("id", "blk", "s")
    val out = FuzzyJoin.blockingRecallProbe(df, "id", "s", col("blk"),
        maxDist = 2, isSample = col("id") % 2 === 0, blockCaps = Seq(2, 3))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // brute truth touching sample: (2,3),(4,5),(6,7),(6,8),(7,8) = 5
    assert(out === Seq(
      (2, 5L, 1L, 0.2),   // cap 2: b4 refused (3 > 2), (4,5) cross-block
      (3, 5L, 4L, 0.8)))  // cap 3: only the cross-block (4,5) missing
  }

  test("count filter is a true lower bound: matches/probe output is IDENTICAL to the unfiltered threshold semantics (r16)") {
    // theorem check on adversarial inputs: strings built by applying
    // exactly d random edits — every such pair MUST pass the filter
    // at maxDist >= d (ed <= d implies sum|delta counts| <= 2d)
    val rng = new scala.util.Random(53)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    def applyEdits(s: String, d: Int): String = {
      var cur = s
      (1 to d).foreach { _ =>
        val op = rng.nextInt(3)
        val i = if (cur.isEmpty) 0 else rng.nextInt(cur.length)
        cur = op match {
          case 0 if cur.nonEmpty => cur.updated(i, ('a' + rng.nextInt(26)).toChar)
          case 1 => cur.patch(i, ('a' + rng.nextInt(26)).toChar.toString, 0)
          case _ if cur.nonEmpty => cur.patch(i, "", 1)
          case _ => cur
        }
      }
      cur
    }
    def counts(s: String) = ('a' to 'z').map(c => s.count(_ == c))
    (1 to 300).foreach { _ =>
      val a = randStr(5 + rng.nextInt(30))
      val d = rng.nextInt(6)
      val b = applyEdits(a, d)
      val sumAbs = counts(a).zip(counts(b)).map(p => (p._1 - p._2).abs).sum
      val ed = editDist(a, b) // <= d by construction
      assert(sumAbs <= 2 * ed,
        s"count bound violated: a=$a b=$b ed=$ed sumAbs=$sumAbs")
    }
    // end-to-end: matches (count-filtered) equals blockedCandidates'
    // threshold view (unfiltered) on a random blocked corpus
    val df = (1L to 120L).map { i =>
      val blk = s"b${i % 6}"
      (i, blk, randStr(8 + rng.nextInt(10)))
    }.toDF("id", "blk", "s")
    val viaCandidates = FuzzyJoin.blockedCandidates(df, "id", "s",
        col("blk"), maxDist = 3, blockCap = 64)
      .filter(col("is_match"))
      .select(col("id_a"), col("id_b"), col("dist"))
      .as[(Long, Long, Long)].collect().toSet
    val viaMatches = FuzzyJoin.matches(df, "id", "s",
        col("blk"), maxDist = 3, blockCap = 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaMatches === viaCandidates)
  }

  test("NULL ids, strings, or block keys don't participate") {
    val df = Seq((Some(1L), Some("aa bb")), (Some(2L), Some("aa bc")),
        (None, Some("aa bd")), (Some(4L), None))
      .toDF("id", "s")
    val out = FuzzyJoin.blockedCandidates(df, "id", "s",
        substring(col("s"), 1, 2), maxDist = 2, blockCap = 10)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq((1L, 2L, 1L, true)))
  }
}
