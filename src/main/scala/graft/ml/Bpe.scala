package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE-style tokenizer training at word granularity: learn
  * the top merge rules by iteratively (1) counting adjacent token
  * pairs across the corpus, (2) picking the most frequent pair
  * (deterministic tie-break: lexicographic), (3) rewriting every
  * document's token array with that pair fused — the classic
  * byte-pair-encoding loop (Sennrich et al. 2016) run as Spark jobs
  * instead of a single-machine heap.
  *
  * Scale shape per iteration: pair counting is ONE explode + groupBy
  * (map-side partials bound it by distinct pairs per partition); the
  * argmax is a 1-row sort-limit; the merge rewrite is a per-row
  * `aggregate` fold (native HOF expression, no UDF) — zero shuffle.
  * The token frame localCheckpoints between iterations: k merges =
  * k bounded jobs, never a k-deep lazy plan (the CorpusPipeline
  * lineage lesson). Word-granularity keeps the demo honest on the
  * whitespace corpus; byte/char granularity is the same loop over
  * `split(text, '')`.
  *
  * The merged token is `a + Sep + b` (U+0001 separator), atomic in later rounds —
  * exactly BPE's non-overlapping left-to-right greedy fuse (a fold
  * cannot re-merge the element it just produced: "a a a" with rule
  * (a,a) yields [aa, a]).
  */
object Bpe {

  /** Separator inside fused tokens (keeps a fused pair distinct from
    * any real corpus word). */
  val Sep = "\u0001"

  /** Adjacent-pair counts over token-array rows: (a, b, n). */
  def pairCounts(toks: DataFrame): DataFrame = {
    val th = col("toks")
    // positional zip: pair i = (toks[i], toks[i+1]); slice drops the
    // trailing (last, null) artifact. Materialized toks column — the
    // lambda references it per element (no CSE inside lambdas).
    val pairs = slice(
      zip_with(th, slice(concat(th, array(lit(null).cast("string"))), lit(2), size(th)),
        (a, b) => struct(a.as("a"), b.as("b"))),
      lit(1), size(th) - 1)
    toks
      .filter(size(th) >= 2)
      .select(explode(pairs).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Rewrite a token array fusing every non-overlapping (a, b) into
    * one token, greedy left-to-right — the BPE apply step as a native
    * fold expression. */
  def mergePair(toks: Column, a: String, b: String): Column = {
    val fused = a + Sep + b
    // try_element_at: null (not an ANSI error) on the empty
    // accumulator; null === a is null, so the when() falls through
    // to the append branch.
    aggregate(toks, array().cast("array<string>"), (acc, t) =>
      when(try_element_at(acc, lit(-1)) === lit(a) && t === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
        .otherwise(concat(acc, array(t))))
  }

  /** Learned merge rule. */
  final case class Merge(a: String, b: String, count: Long)

  /** Run `numMerges` BPE iterations over (doc_id, text); returns the
    * merge table in learned order. Stops early when no pair repeats. */
  def train(docs: DataFrame, numMerges: Int): Seq[Merge] = {
    var toks = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val top = pairCounts(toks)
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val r = top.head
        val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += Merge(a, b, n)
        // native single-rule apply (bit-identical to mergePair — the
        // BpeSpec differential); checkpoint still truncates the
        // k-iteration lineage
        toks = toks
          .select(col("doc_id"),
            graft.plans.BpeOps.applyCol(col("toks"), Seq((a, b))).as("toks"))
          .localCheckpoint(true)
      }
      i += 1
    }
    merges.toSeq
  }

  /** Apply a learned merge table to (doc_id, text): returns
    * (doc_id, toks) tokenized with all merges fused, in rule order.
    *
    * r8: ONE native codegen'd expression for the whole table
    * ([[graft.plans.BpeOps]]) instead of a chain of per-rule
    * aggregate-HOF folds — bit-identical by the BpeSpec differential,
    * several× faster (no per-element array rebuilds, no lambda
    * dispatch), and with no k-deep lazy plan there is nothing to
    * localCheckpoint either (the fold chain needed lineage truncation
    * every 8 rules just to keep Catalyst/Janino bounded). */
  def encode(docs: DataFrame, merges: Seq[Merge]): DataFrame =
    docs.select(col("doc_id"),
      graft.plans.BpeOps.applyCol(split(col("text"), " "),
        merges.map(m => (m.a, m.b))).as("toks"))

  /** Tokenizer fertility per group (the standard tokenizer-eval
    * metric): tokens emitted per whitespace word, and characters per
    * emitted token, after applying `merges`. At this WORD granularity
    * merges only ever fuse words, so fertility ≤ 1.0: exactly 1.0
    * means no merge applied (the identity tokenization) and LOWER
    * means better compression — a group stuck near 1.0 is under-served
    * by the merge table (the classic multilingual-tokenizer skew
    * diagnostic, with the subword convention's ≥1 scale mirrored
    * below 1; BpeSpec pins 0.5-compressed vs 1.0-identity).
    *
    * Input needs (doc_id, text, <groupCol>). One encode pass (the
    * merge folds are per-row; groupCol and the word/char counts ride
    * along as passthrough columns, so there is NO doc_id join and no
    * second tokenization) + one groupBy bounded by group cardinality.
    * Character counts exclude the Sep marker so a fused token costs
    * exactly its visible characters — and since merges never change
    * visible characters, n_chars is computed BEFORE the folds as
    * length(text) minus the single-space separators. */
  def fertility(docs: DataFrame, merges: Seq[Merge],
      groupCol: String): DataFrame = {
    val base = docs.select(col("doc_id"), col(groupCol),
      split(col("text"), " ").as("toks"),
      length(col("text")).as("text_len"))
      .withColumn("n_words", size(col("toks")).cast("long"))
      .withColumn("n_chars", col("text_len") - (col("n_words") - 1L))
      .drop("text_len")
    val enc = base.withColumn("toks",
      graft.plans.BpeOps.applyCol(col("toks"), merges.map(m => (m.a, m.b))))
    enc
      .select(col(groupCol), col("n_words"), col("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("n_tokens")) / sum(col("n_words")).cast("double"), 4)
          .as("fertility"),
        round(sum(col("n_chars")) / sum(col("n_tokens")).cast("double"), 4)
          .as("chars_per_token"))
      .orderBy(col(groupCol))
  }
}
