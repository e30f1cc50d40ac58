package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance record linkage — the fuzzy join a curation
  * pipeline runs to reconcile near-identical identifiers (titles,
  * URLs, product names) that token-set similarity misreads: Jaccard
  * over shingles is blind to character-level edits inside a token,
  * levenshtein is exactly that signal.
  *
  * Reference behavior frame: blq-cli's fingerprint suppression
  * normalizes messages before hashing so near-identical log lines
  * collapse (/root/reference/src/blq/query.py fingerprint path) — the
  * record-linkage generalization: instead of normalize-then-exact-
  * match, block-then-verify with an edit-distance budget.
  *
  * Scale shape (the df-capped-postings discipline applied to
  * blocking): candidates come ONLY from the equi-join on the blocking
  * key, hot blocks are dropped at `blockCap` (candidate volume is
  * Σ_b min(|b|, cap)², never corpus², and the cap makes the worst
  * block's quadratic term a constant), and the O(|s|²) levenshtein
  * verify runs only on pairs that survive the length lower bound
  * ||s_a| − |s_b|| ≤ maxDist (an edit changes length by at most 1, so
  * the prefilter can never drop a true match — FuzzyJoinSpec proves
  * it differentially). All three stages are plain codegen'd Column
  * ops: the equi-join shuffles on the block key, the verify is
  * map-only. */
object FuzzyJoin {

  /** All blocked candidate pairs with their edit distance:
    * (id_a, id_b, dist, is_match), id_a < id_b, `is_match` =
    * dist ≤ maxDist. Emitting the unfiltered candidates (not just the
    * matches) is deliberate — it is the audit view a linkage pipeline
    * thresholds interactively, and it gates the full distance
    * computation, not only the accepted tail (q130 pins levenshtein
    * on every surviving pair cross-engine).
    *
    * `blockKey` is any deterministic Column over `df`'s columns
    * (first tokens, a phonetic code, a sort-key prefix). Rows with a
    * NULL id, string, or block key don't participate. */
  def blockedCandidates(df: DataFrame, idCol: String, strCol: String,
      blockKey: Column, maxDist: Int, blockCap: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(blockCap >= 1, s"blockCap must be >= 1, got $blockCap")
    val base = df.select(blockKey.cast("string").as("blk"),
        col(idCol).cast("long").as("id"), col(strCol).cast("string").as("s"))
      .filter(col("blk").isNotNull && col("id").isNotNull &&
        col("s").isNotNull)
    // hot-block drop: a block past the cap contributes cap²-unbounded
    // candidate volume — the operator refuses it wholesale, exactly
    // like a df-capped posting list (q31/q97 discipline)
    val keep = base.join(
      base.groupBy(col("blk")).agg(count(lit(1)).as("bn"))
        .filter(col("bn") <= blockCap).select(col("blk")),
      Seq("blk"), "left_semi")
    val a = keep.select(col("blk"), col("id").as("id_a"), col("s").as("s_a"))
    val b = keep.select(col("blk"), col("id").as("id_b"), col("s").as("s_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      // length lower bound BEFORE the quadratic verify
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).cast("long").as("dist"))
      .withColumn("is_match", col("dist") <= maxDist)
  }

  /** The accepted pairs only: (id_a, id_b, dist), dist ≤ maxDist —
    * the edge list a clustering pass ([[DedupClusters]]) consumes. */
  def matches(df: DataFrame, idCol: String, strCol: String,
      blockKey: Column, maxDist: Int, blockCap: Int = 1000): DataFrame =
    blockedCandidates(df, idCol, strCol, blockKey, maxDist, blockCap)
      .filter(col("is_match")).drop("is_match")
}
