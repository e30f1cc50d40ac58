package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: language ID, quality
  * scoring, token counting, document fingerprinting. Pure codegen'd
  * column expressions — no UDFs — so every score is pushdown-friendly
  * and has an exact SQL oracle.
  */
object TextAnalysis {

  /** Marker-word profiles for the n-gram-heuristic language detector.
    * Integer hit counts (not tf-idf floats) so cross-engine comparison
    * is exact. Small by design: a real profile set would be loaded as a
    * broadcast dimension table with the same query shape. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "und", "die", "ist", "nicht"),
    "es" -> Seq("el", "de", "la", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai"))

  /** The qualityScore punct-class complement for the translate-based
    * counter: every ASCII alphanumeric plus space. */
  private val alnumSpace: String =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')).mkString + " "

  /** Count of whole-word occurrences of `word` in text.
    * `regexp_count` (r12): counts matches without materializing the
    * match array `size(regexp_extract_all(...))` built just to
    * measure — same value (both count the same non-overlapping
    * leftmost matches), one less allocation per row. */
  def wordHits(text: Column, word: String): Column =
    regexp_count(text, lit("\\b" + word + "\\b"))

  /** Total whole-word hits over a word SET, as ONE fused alternation
    * scan (r12) — value-identical to summing [[wordHits]] per word:
    * whole-token matches at a given position are mutually exclusive
    * (the trailing \b fails the shorter alternative and backtracks to
    * the longer), so the per-word counts partition the alternation's
    * matches. One regex pass instead of |words| — the scans were the
    * dominant cost of qualityScore/langId (q38/q39/q74 class). */
  def phraseHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit(words.mkString("\\b(", "|", ")\\b")))

  /** Per-language marker score columns: lang -> integer score. */
  def langScores(text: Column): Seq[(String, Column)] =
    langProfiles.map { case (lang, words) =>
      lang -> phraseHits(text, words)
    }

  /** Predicted language: argmax of marker scores, ties broken by
    * profile order (en first). */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, s), alt) =>
      when(s === best && s > 0, lang).otherwise(alt)
    }
  }

  def wsTokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count: alpha runs + digit runs + individual
    * punctuation, the pre-tokenization split every BPE vocab shares. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(split(text, " ")))

  /** Heuristic quality score in [0,1]: length band + type-token ratio +
    * stopword presence + punctuation sanity. Deterministic double
    * arithmetic, rounded at the edge. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nToks = wsTokenCount(text)
    val ttr = distinctTokenCount(text).cast("double") / nToks
    val stopHits = phraseHits(text, Seq("the", "a", "of", "is", "and"))
    val stopRatio = stopHits.cast("double") / nToks
    // Punct count via translate, NOT regexp_count("[^a-zA-Z0-9 ]"):
    // value-identical (a single-char class matches once per char, so
    // match count == survivor length after deleting the class's
    // complement), but the regex form is a measured 10-20× hot spot —
    // Java regex evaluates a negated class through per-char lambda
    // predicates with no Boyer-Moore skip, and a zero-match scan
    // walks every char at ~57 ns (AbBench r12 q74_punctonly 1.98 s
    // vs q74_translate 0.2 s at sf1); translate is a table lookup.
    val punctCount = length(translate(text, alnumSpace, ""))
    // greatest(.,1): total on the EMPTY string (a span-dedup pass can
    // legitimately excise a whole document) — ANSI mode turns the bare
    // division into a job-killing error there; identical result for
    // every non-empty text, so the q39/q74/q77 oracles are untouched.
    val punctRatio = punctCount.cast("double") / greatest(nChars, lit(1))
    val lenScore = when(nChars >= 200 && nChars <= 2000, 1.0)
      .when(nChars >= 50, 0.5).otherwise(0.0)
    val score = lenScore * 0.3 +
      least(ttr * lit(2.0), lit(1.0)) * 0.3 +
      least(stopRatio * lit(5.0), lit(1.0)) * 0.2 +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * 0.2
    round(score, 4)
  }

  /** Winnowing-style document fingerprint: the minimum salted-md5 over
    * the doc's n-gram shingles — robust to local edits (a changed
    * shingle only changes the fingerprint if it was the minimum), the
    * same selection rule as winnowing with window = document. */
  def docFingerprint(docs: DataFrame, n: Int): DataFrame =
    TextDedup.shingleTable(docs, n)
      .groupBy(col("doc_id"))
      .agg(min(md5(col("shingle"))).as("fingerprint"),
        count(lit(1)).as("n_shingles"))

  /** Full winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * selection rule): hash every k-token gram, slide a window of w
    * consecutive gram hashes, keep each window's minimum, dedup — the
    * guarantee is that any shared run of w+k-1 tokens between two
    * documents shares at least one selected fingerprint, with only
    * ~2/(w+1) of grams retained. [[docFingerprint]] is the degenerate
    * window=document form; this is the substring-matching-grade
    * fingerprint an attribution / clone-detection pipeline stores.
    *
    * Entirely per-row array math (zero shuffle): toks → grams →
    * 63-bit md5-half hashes (the portable key arithmetic
    * [[TextDedup.keySetsFromDigests]] establishes — DuckDB computes
    * the identical longs) → window minima → distinct set. Each
    * derived array is its own projection so no lambda re-evaluates a
    * computed array per element (the CSE trap CLAUDE.md records).
    * Docs shorter than k tokens get an empty fingerprint set; docs
    * with fewer than w grams get the single global minimum (the
    * standard short-document degeneration).
    *
    * Output: (doc_id, n_grams, n_fp, fp_md5) — the fingerprint SET
    * summarized as md5 over the sorted longs, so the oracle compare
    * covers every selected hash without emitting corpus×fingerprints
    * rows. */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val hash63 = (g: Column) => {
      val d = md5(g)
      (conv(substring(d, 1, 8), 16, 10).cast("long") % lit(2147483648L)) *
        lit(4294967296L) + conv(substring(d, 9, 8), 16, 10).cast("long")
    }
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("grams",
        when(size(col("toks")) >= k,
          transform(sequence(lit(1), size(col("toks")) - (k - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
          .otherwise(array().cast("array<string>")))
      .withColumn("hashes", transform(col("grams"), hash63))
      .withColumn("mins",
        when(size(col("hashes")) >= w,
          transform(sequence(lit(1), size(col("hashes")) - (w - 1)),
            i => array_min(slice(col("hashes"), i, lit(w)))))
          .when(size(col("hashes")) > 0, array(array_min(col("hashes"))))
          .otherwise(array().cast("array<long>")))
      .withColumn("fp", array_sort(array_distinct(col("mins"))))
      .select(col("doc_id"),
        size(col("grams")).as("n_grams"),
        size(col("fp")).as("n_fp"),
        md5(concat_ws(",", transform(col("fp"), x => x.cast("string"))))
          .as("fp_md5"))
  }

  /** Full per-document text profile. */
  def profile(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(col("doc_id"),
      langId(t).as("pred_lang"),
      wsTokenCount(t).as("n_tokens"),
      bpeishTokenCount(t).as("n_subwords"),
      distinctTokenCount(t).as("n_distinct"),
      qualityScore(t).as("quality"))
  }
}
