package graft

import graft.ml.Bpe
import org.apache.spark.sql.functions.{col, split}

/** Differential spec for distributed BPE training: the Spark loop must
  * match an in-memory reference implementation merge-for-merge (same
  * greedy left-to-right fuse, same (count desc, pair asc) selection),
  * and encode() must reproduce training's final tokenization.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference fuse: greedy left-to-right, no re-merge. */
  private def fuseSimple(v: Vector[String], a: String, b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    for (t <- v) {
      if (out.nonEmpty && out.last == a && t == b) {
        out.remove(out.length - 1); out += (a + Bpe.Sep + b)
      } else out += t
    }
    out.toVector
  }

  test("fuse semantics: greedy left-to-right, no re-merge of a fused token") {
    val got = spark.sql("SELECT 1").select(
      Bpe.mergePair(org.apache.spark.sql.functions.split(
        org.apache.spark.sql.functions.lit("a a a b a"), " "), "a", "a")).head()
      .getSeq[String](0)
    assert(got === fuseSimple(Vector("a", "a", "a", "b", "a"), "a", "a"))
    assert(got === Vector("a" + Bpe.Sep + "a", "a", "b", "a"))
  }

  test("native bpe_apply is bit-identical to the mergePair fold chain") {
    assert(graft.plans.BpeOps.Sep === Bpe.Sep)
    // seeded random corpus over a tiny vocab (maximizes adjacent-pair
    // collisions), a merge table whose later rules consume earlier
    // rules' leftovers, plus edge shapes: empty-ish, single token,
    // all-same-token runs
    val rng = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    val texts = Vector.fill(40)(
      Vector.fill(1 + rng.nextInt(14))(vocab(rng.nextInt(4))).mkString(" ")) ++
      Vector("a", "a a a a a", "b b", "c")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("b", "b"), ("a", "a"),
      ("a" + Bpe.Sep + "b", "c"), ("c", "d"))
    val native = docs.select(col("doc_id"),
        graft.plans.BpeOps.applyCol(split(col("text"), " "), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val folds = merges.foldLeft(
        docs.select(col("doc_id"), split(col("text"), " ").as("toks"))) {
        (d, m) => d.select(col("doc_id"),
          Bpe.mergePair(col("toks"), m._1, m._2).as("toks"))
      }.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(native === folds)
    // and both match the in-memory reference
    val ref = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> merges.foldLeft(t.split(" ").toVector) {
        (v, m) => fuseSimple(v, m._1, m._2) }
    }.toMap
    assert(native === ref)
    assert(native.values.exists(_.exists(_.contains(Bpe.Sep))))
  }

  test("empty merge table is the identity tokenizer") {
    // train() on a corpus with no repeated pair returns Seq.empty;
    // encode/fertility must then be the plain whitespace tokenization
    // (and applyCol must not build a zero-element array<void> literal)
    val docs = Seq((1L, "a b c"), (2L, "d")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(enc === Map(1L -> Vector("a", "b", "c"), 2L -> Vector("d")))
    val fert = Bpe.fertility(docs.withColumn("lang",
        org.apache.spark.sql.functions.lit("A")), Seq.empty, "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(fert === Map("A" -> 1.0))
  }

  test("seeded random corpus: distributed training equals the reference") {
    val rng = new scala.util.Random(11)
    val vocab = Vector("x", "y", "z", "w", "v")
    val texts = Vector.fill(30)(
      Vector.fill(3 + rng.nextInt(10))(vocab(rng.nextInt(5))).mkString(" "))
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Bpe.train(docs, numMerges = 6).map(m => (m.a, m.b, m.count))
    // reference via the simple fuse (the two fuse impls agree by the
    // test above; use the simple one to avoid duplicated subtlety)
    var ref = texts.map(_.split(" ").toVector)
    val expected = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    for (_ <- 0 until 6 if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for (d <- ref; i <- 0 until d.length - 1) counts((d(i), d(i + 1))) += 1
      val elig = counts.toSeq.filter(_._2 >= 2)
      if (elig.isEmpty) done = true
      else {
        val ((a, b), n) = elig.minBy { case ((a, b), n) => (-n, a, b) }
        expected += ((a, b, n))
        ref = ref.map(fuseSimple(_, a, b))
      }
    }
    assert(got === expected.toSeq)
    assert(got.nonEmpty)
  }

  test("encode reproduces training's final tokenization") {
    val docs = Seq(
      (1L, "p q p q r s p q"),
      (2L, "p q r s r s")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 3)
    val enc = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    // replay the reference fuses
    var ref = Map(1L -> "p q p q r s p q", 2L -> "p q r s r s")
      .view.mapValues(_.split(" ").toVector).toMap
    for (m <- merges) ref = ref.view.mapValues(fuseSimple(_, m.a, m.b)).toMap
    assert(enc === ref)
    // the fused tokens actually appear
    assert(enc(1L).exists(_.contains(Bpe.Sep)))
  }

  test("fertility: per-group tokens/word and chars/token, Sep excluded") {
    // lang A: "p q" fuses everywhere -> fertility 0.5 (every 2 words
    // become 1 token); lang B shares no pairs -> fertility 1.0.
    val docs = Seq(
      (1L, "p q p q", "A"),
      (2L, "p q", "A"),
      (3L, "u v w", "B")).toDF("doc_id", "text", "lang")
    val merges = Seq(Bpe.Merge("p", "q", 3L))
    val rows = Bpe.fertility(docs, merges, "lang").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // A: 2 docs, 6 words, 3 tokens ("pq","pq","pq"), 6 visible chars
    assert(rows("A") === ((2L, 6L, 3L, 0.5, 2.0)))
    // B: 1 doc, 3 words, 3 tokens, 3 chars
    assert(rows("B") === ((1L, 3L, 3L, 1.0, 1.0)))
  }
}
