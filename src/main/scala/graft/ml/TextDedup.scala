package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash-groupBy), n-gram Jaccard (inverted index), MinHash+LSH
  * (shingle → signature → band → bucket-join), and SimHash.
  *
  * Portability contract: every hash primitive is built from `md5` +
  * string ops that exist identically in Spark and DuckDB, so each
  * pipeline has an exact SQL oracle (see graft.queries.PipelineQueries).
  * MinHash uses the *lexicographic minimum of salted md5 hex digests* —
  * deterministic, engine-independent, and an unbiased permutation-min
  * approximation (each salt defines an independent pseudo-permutation
  * of shingle space).
  *
  * Scale design (the point of these over a naive cross join):
  *  - exact dedup: one shuffle on the 128-bit content hash; no pairs.
  *  - inverted-index Jaccard: pairs are generated only for docs sharing
  *    a shingle, with hot shingles (df > dfCap) dropped — the classic
  *    "stop-shingle" prefix filter. Cross-join never materializes.
  *  - MinHash+LSH: candidate generation is a groupBy on (band, key) —
  *    O(docs·bands) rows shuffled, independent of pair count. This is
  *    the 100 TB path: banding keys partition uniformly (md5), and the
  *    verify join touches only candidate pairs.
  *  - SimHash: one agg over exploded tokens → 32-bit signature; near-dup
  *    candidates bucket on a signature prefix (hamming ≤ r within
  *    bucket), again avoiding all-pairs.
  */
object TextDedup {

  /** Whitespace tokens of `text` (clean single-space corpus contract). */
  def tokens(text: Column): Column = split(text, " ")

  /** (doc_id, toks) with the split MATERIALIZED as its own projection.
    * This exists because Catalyst does NO subexpression elimination
    * inside higher-order-function lambda bodies: a gram builder
    * written directly over `split(text)` embeds the whole split
    * expression at every `get(toks, i+j)` reference, re-splitting the
    * document once per token per gram — O(tokens²) string work per doc
    * (confirmed in the optimized plan: `transform(split(text,' '))[i+1]`
    * inlined inside the gram lambda; this was the measured shingle hot
    * path). After materialization each reference is a bound array
    * attribute — O(1). CollapseProject keeps the projection because
    * the alias is non-cheap and multiply-referenced downstream.
    *
    * Also repartitions first: document tables often arrive as few
    * large files (one input split each) and everything downstream of
    * the split is the expensive part — spread it across all cores
    * BEFORE it fans out. */
  private def tokTable(docs: DataFrame): DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))

  /** Distinct word n-gram shingles from a MATERIALIZED token-array
    * column (see [[tokTable]]). Index-aware `transform` + O(1) `get`
    * lookups — no per-element `sequence`/`slice` array allocation.
    * Docs shorter than n tokens fall back to a single whole-text
    * shingle (mirrored in the oracle CTE — keep the two in sync). */
  def shinglesFrom(toks: Column, n: Int): Column = {
    // concat_ws skips the nulls that get() yields past the array end;
    // those partial trailing grams are sliced off below.
    val grams = transform(toks, (x, i) =>
      concat_ws(" ", x +: (1 until n).map(j => get(toks, i + lit(j))): _*))
    when(size(toks) >= n, array_distinct(slice(grams, lit(1), size(toks) - (n - 1))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Column-level convenience over raw text. Fine for ad-hoc use;
    * table-scale pipelines must go through [[tokTable]]-based builders
    * below or they inherit the quadratic re-split documented there. */
  def shingles(text: Column, n: Int): Column = shinglesFrom(tokens(text), n)

  /** (doc_id, shingle) exploded, distinct. Input must have doc_id, text.
    *
    * explode_outer, deliberately: plain explode carries an implicit
    * `size(arr) > 0` filter that Catalyst pushes BELOW the repartition,
    * re-evaluating the whole shingle expression on the unsplit input
    * partition — the exact single-core trap tokTable's repartition
    * exists to avoid. shinglesFrom() never returns an empty or null
    * array (short docs get the whole-text fallback), so outer ≡ inner
    * here, minus the pushed-down filter. */
  def shingleTable(docs: DataFrame, n: Int): DataFrame =
    tokTable(docs)
      .select(col("doc_id"), explode_outer(shinglesFrom(col("toks"), n)).as("shingle"))

  /** (doc_id, shingle_key) with 64-bit hashed shingle keys — the
    * Spark-internal fast path for pipelines whose RESULTS don't expose
    * the shingle itself (q31's pair counts): every downstream shuffle,
    * sort and comparison runs on 8-byte longs instead of ~20-char
    * strings. Collision odds across 10^5..10^9 distinct shingles are
    * ≤ ~1e-9 per corpus (64-bit birthday), and any collision only
    * perturbs one candidate pair's count. Oracle-exposed paths
    * (q32 minhash, q40 fingerprint) keep the string form — their md5s
    * are part of the checked output.
    *
    * The keys never materialize a gram STRING: each token is
    * xxhash64'd exactly once, and a gram key is the xxhash64 of its n
    * token hashes (fixed 8n-byte input). The previous form concat_ws'd
    * every gram then hashed it — each token's bytes copied and hashed
    * n times over, plus a string allocation per gram; that allocation
    * churn was the measured q31 hot path. Key identity still tracks
    * gram identity exactly (distinctness, df counts and pair counts
    * are unchanged modulo the 64-bit collision odds above), so the
    * string-based oracle stays a valid comparator. Short docs (< n
    * tokens) key on a fold of all token hashes, mirroring the
    * whole-text-shingle fallback in [[shingles]]. */
  def shingleKeyTable(docs: DataFrame, n: Int): DataFrame = {
    // token hashes materialized as their own column for the same
    // no-CSE-in-lambdas reason as tokTable: the gram lambda below
    // references them once per gram position.
    val th = col("th")
    // get() past the array end yields null; those trailing partial
    // grams are sliced off, same as in shinglesFrom().
    val grams = transform(th, (x, i) =>
      xxhash64(x +: (1 until n).map(j => get(th, i + lit(j))): _*))
    val keys = when(size(th) >= n,
        array_distinct(slice(grams, lit(1), size(th) - (n - 1))))
      .otherwise(array(aggregate(th, lit(42L), (acc, h) => xxhash64(acc, h))))
    tokTable(docs)
      .select(col("doc_id"),
        transform(col("toks"), t => xxhash64(t)).as("th"))
      .select(col("doc_id"), explode_outer(keys).as("shingle"))
  }

  /** Exact duplicate groups: docs keyed by content hash; `keep_id` is
    * the canonical (minimum) doc of each group. One shuffle, no pairs —
    * the only exact-dedup shape that survives 100 TB. */
  def exactDuplicates(docs: DataFrame, keyExpr: Column): DataFrame =
    docs.select(col("doc_id"), md5(keyExpr).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("group_size"),
        array_sort(collect_list(col("doc_id"))).as("members"))

  /** Per-doc distinct shingle-set frame: (doc_id, sh array). Kept as an
    * ARRAY column — set sizes, intersections and minhashes are per-row
    * array expressions, so nothing about a single document ever
    * shuffles. */
  def shingleSets(docs: DataFrame, n: Int): DataFrame =
    tokTable(docs)
      .select(col("doc_id"), shinglesFrom(col("toks"), n).as("sh"))

  /** Attach both docs' shingle-set arrays to candidate (doc_a, doc_b)
    * pairs and emit verified Jaccard >= threshold. `sets` may carry the
    * string shingles or (the fast path) their 63-bit md5-derived keys
    * from [[keySetsFromDigests]] — the set algebra is identical; the
    * key form shuffles and intersects 8-byte longs instead of ~20-char
    * strings. Candidates are small relative to the corpus (that is the
    * point of candidate generation) so AQE broadcasts them when they
    * measure small — but no forced hint: a skewed LSH run can produce
    * a candidate list too big to broadcast, and the hint would turn
    * that into an OOM instead of a shuffle join. */
  private[ml] def verifyJaccard(candidates: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame = {
    val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    // extra candidate columns (BandIndex.pairsAll's star-edge bkt_n)
    // ride through the verify untouched
    val extras = candidates.columns.toSeq
      .filterNot(Set("doc_a", "doc_b")).map(col)
    candidates
      .join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("shared") / (size(col("sh_a")) + size(col("sh_b")) - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a") +: col("doc_b") +: col("jaccard") +: extras: _*)
  }

  /** (doc_id, dig) — each doc's distinct shingles md5'd once. The ONE
    * digest pass both the minhash signatures and the verify keys are
    * derived from; persist THIS frame when both consumers run. */
  def shingleDigests(sets: DataFrame): DataFrame =
    sets.select(col("doc_id"), transform(col("sh"), s => md5(s)).as("dig"))

  /** 63-bit shingle keys from the digest frame, as a distinct-key set
    * array: key = (h1 mod 2^31)·2^32 + h2 with h1/h2 the digest's two
    * leading 32-bit halves — the same md5-half arithmetic the minhash
    * slots use, so DuckDB computes the identical keys
    * (CAST('0x'||substr(md5(s),…) AS BIGINT); xxhash64 has no DuckDB
    * counterpart, which is why this is NOT [[shingleKeyTable]]'s
    * xxhash64). Max value (2^31-1)·2^32 + 2^32-1 = 2^63-1: no overflow
    * in Spark's wrapping longs or DuckDB's checked BIGINTs. The
    * array_distinct mirrors the oracle's SELECT DISTINCT, so a key
    * collision (≈1e-10 at 10^5 shingles) perturbs both engines
    * identically — the comparison stays exact, not just close. */
  def keySetsFromDigests(withDig: DataFrame): DataFrame =
    withDig.select(col("doc_id"),
      array_distinct(transform(col("dig"), d =>
        (conv(substring(d, 1, 8), 16, 10).cast("long") % lit(2147483648L)) *
          lit(4294967296L) +
          conv(substring(d, 9, 8), 16, 10).cast("long"))).as("sh"))

  /** Posting-list variant of [[jaccardPairs]]: group docs per shingle
    * (the inverted index as actual lists), drop hot shingles by list
    * size, and emit each list's pairs with per-row array math. Replaces
    * the window-sort df filter + self-join with plain groupBys — no
    * sort anywhere, and the pair fan-out is bounded by dfCap²/2 per
    * shingle. Results identical to jaccardPairs by construction.
    *
    * When doc_id is a 32-bit-or-narrower integer, each pair is packed
    * LOSSLESSLY into one long ((a<<32)|(b&0xffffffff), bitwise so
    * negatives cannot overflow) and the co-occurrence groupBy runs on
    * a single 8-byte key instead of a two-field struct — measured 40%
    * faster on the pair stage (0.76→0.47 s warm at sf0.1, 1.13M pair
    * rows), which was the dominant q31 cost. Long doc_ids keep the
    * struct form: a >2³¹-doc corpus genuinely needs the width, and
    * packing two longs is impossible — the struct path IS the 100 TB
    * shape; the packed path covers every corpus that fits int keys. */
  def jaccardPairsPostings(docs: DataFrame, n: Int, threshold: Double,
      dfCap: Int = 50): DataFrame = {
    val (pairs, sizes) = postingsPairCounts(docs, n, dfCap)
    finalizeJaccard(pairs, sizes, threshold)
  }

  /** Prefix-filtered exact Jaccard self-join (the AllPairs/PPJoin
    * prefix principle — Chaudhuri et al. 2006, Xiao et al. 2008):
    * identical output to [[jaccardPairsPostings]] (same dfCap
    * semantics, same [[finalizeJaccard]] tail, q133 gates it against
    * q31's oracle text), but candidates come from a PREFIX of each
    * doc's shingle set instead of every rare shingle.
    *
    * The filter: order every capped set by the global (df, shingle)
    * total order (rarest first) and emit only the first
    * |s| − ⌈t·|s|⌉ + 1 elements. If J(x, y) ≥ t then |x∩y| ≥ t·|x∪y|
    * ≥ t·|x|, so the intersection cannot fit entirely in the ⌈t·|x|⌉−1
    * suffix — every qualifying pair shares a prefix element, and
    * rarest-first ordering makes those prefix postings the LOW-df
    * ones. Measured candidate pair-slots on the sf0.1 corpus
    * (3-gram, dfCap 50): 1.27 M via capped postings → 695 k at
    * t = 0.3 → 122 k at t = 0.8 — the filter sharpens exactly as the
    * threshold rises, where the postings form's volume is
    * threshold-blind.
    *
    * Measured envelope (AbBench interleaved, min-of-5/4, r15) — read
    * before preferring this plan: at sf0.1/t=0.8 the candidate cut
    * WINS (1.09 s vs 1.52 postings); at the t=0.3 gate point it loses
    * (2.04 vs 1.49 — weak prefix + the extra set-build shuffle); and
    * at sf1/t=0.8 it INVERTS (3.05 vs 1.57): the per-doc sorted-set
    * materialization alone (1.85 s isolated) exceeds the whole
    * postings pipeline, because with dfCap=50 the postings pair
    * expansion is already capped-bounded — candidate volume is not
    * the binding constraint on this corpus's df distribution. (A
    * cheaper hash-order prefix — any global total order is correct —
    * recovers to 2.80 s at sf1, still losing.) So the postings form
    * stays the default at scale; this plan is the
    * moderate-corpus/high-threshold point tool, kept correctness-
    * gated (q133, same oracle as q31/q125) so the trade can be
    * re-measured as corpora change. Verification is exact |x∩y| via
    * array_intersect on the stored sorted sets — never a re-scan of
    * the corpus. */
  def jaccardPairsPrefixFilter(docs: DataFrame, n: Int, threshold: Double,
      dfCap: Int = 50): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"prefix filtering needs 0 < threshold <= 1, got $threshold")
    val sh = shingleKeyTable(docs, n)
    val dfs = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val capped = sh.join(dfs.filter(col("df") <= dfCap), Seq("shingle"))
    // per-doc capped set under the global rarest-first total order;
    // consumed three times (prefix explode + both verify sides) with
    // the whole tokenize pipeline upstream — the 2+-consumers persist
    // rule's core case (expensive recompute, not a stored scan)
    val sets = capped.groupBy(col("doc_id"))
      .agg(
        transform(
          array_sort(collect_list(struct(col("df"), col("shingle")))),
          s => s.getField("shingle")).as("set"),
        count(lit(1)).as("n_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefLen = (size(col("set")) -
      ceil(lit(threshold) * size(col("set"))).cast("int") + 1)
    val pre = sets.select(col("doc_id"),
      explode(slice(col("set"), lit(1), prefLen)).as("shingle"))
    val cands = pre.as("a")
      .join(pre.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val verified = cands
      .join(sets.select(col("doc_id").as("doc_a"), col("set").as("sa")),
        Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("set").as("sb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("shared"))
    finalizeJaccard(verified, sets.select(col("doc_id"), col("n_sh")),
      threshold)
  }

  /** Shared postings-index pair machinery: (pairs(doc_a, doc_b, shared),
    * sizes(doc_id, n_sh)) over rare shingles (df <= dfCap). Both the
    * Jaccard ([[jaccardPairsPostings]]) and the containment
    * ([[containmentPairsPostings]]) measures finalize from these two
    * frames — the expensive index/pair stages exist exactly once. */
  private def postingsPairCounts(docs: DataFrame, n: Int,
      dfCap: Int): (DataFrame, DataFrame) = {
    val sh = shingleKeyTable(docs, n)
    val postings = sh.groupBy(col("shingle"))
      .agg(collect_list(col("doc_id")).as("docs"))
      .filter(size(col("docs")) <= dfCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairCountsFromCapped(postings)
  }

  /** Sizes + co-occurrence pair counts from an ALREADY df-capped
    * postings-list frame (`docs` array column of doc ids) — the shared
    * back half of [[postingsPairCounts]], factored out (r14) so the
    * stored-postings index ([[NgramIndex]]) feeds the identical pair
    * machinery without re-tokenizing anything: key identity, packing
    * fast path and pair orientation are THE SAME CODE on the ad-hoc
    * and indexed paths, so the two cannot diverge. */
  private[ml] def pairCountsFromCapped(postings: DataFrame)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, ShortType}
    val idType = postings.schema("docs").dataType match {
      case ArrayType(et, _) => et
      case other => throw new IllegalArgumentException(
        s"postings.docs must be an array of doc ids, got $other")
    }
    val packIds = idType match {
      case IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val sizes = postings.select(explode(col("docs")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // materialize the sorted list BEFORE the pair lambda references it
    // (no CSE inside lambda bodies — see tokTable); singleton lists
    // are dropped with a cheap size filter, and explode_outer avoids
    // the inferred size>0 filter re-evaluating the whole pair
    // expression (the shingleTable trap again)
    val sorted = col("docs_s")
    val expanded = postings
      .filter(size(col("docs")) >= 2)
      .select(array_sort(col("docs")).as("docs_s"))
    val pairs =
      if (packIds)
        expanded
          .select(explode_outer(flatten(transform(sorted, (a, i) =>
            transform(slice(sorted, i + lit(2), size(sorted)), b =>
              shiftleft(a.cast("long"), 32)
                .bitwiseOR(b.cast("long").bitwiseAND(lit(0xFFFFFFFFL))))))).as("pk"))
          .groupBy(col("pk"))
          .agg(count(lit(1)).as("shared"))
          // unpack: both halves sign-extended via shifts (in-int-range
          // before the cast, so ANSI-safe), a < b preserved from the
          // sorted expansion; cast to the ORIGINAL doc_id type so the
          // packed and struct branches emit the same schema
          .select(shiftright(col("pk"), 32).cast(idType).as("doc_a"),
            shiftright(shiftleft(col("pk"), 32), 32).cast(idType).as("doc_b"),
            col("shared"))
      else
        expanded
          .select(explode_outer(flatten(transform(sorted, (a, i) =>
            transform(slice(sorted, i + lit(2), size(sorted)),
              b => struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
          .select(col("p.doc_a"), col("p.doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("shared"))
    (pairs, sizes)
  }

  /** Asymmetric near-containment pairs: shared / min(|A|, |B|) — the
    * measure that catches a short document substantially CONTAINED in a
    * longer one (quote reuse, boilerplate wrapping, partial mirrors),
    * which size-symmetric Jaccard structurally under-scores: a 50-gram
    * doc fully inside a 1000-gram doc has containment 1.0 but Jaccard
    * 0.05. Same inverted-index cost model as [[jaccardPairsPostings]]
    * (candidates only for docs sharing a rare shingle, hot shingles
    * df-capped, never all-pairs); output (doc_a, doc_b, shared,
    * containment) with doc_a < doc_b, containment >= threshold.
    * Reference behavior spec: blq-cli's near-dup screens are symmetric
    * only; this is the standard RefinedWeb/CCNet-style complement.
    * n_a/n_b (each side's rare-gram count) are part of the output so a
    * consumer can identify the CONTAINED (smaller) side without a
    * second sizes join — [[CorpusPipeline.containmentDedup]] drops it. */
  def containmentPairsPostings(docs: DataFrame, n: Int, threshold: Double,
      dfCap: Int = 50): DataFrame = {
    val (pairs, sizes) = postingsPairCounts(docs, n, dfCap)
    finalizeContainment(pairs, sizes, threshold)
  }

  /** The ONE containment finalize (mirrors [[finalizeJaccard]]): both
    * variants emit through here so the measure cannot silently
    * diverge between them. */
  private[ml] def finalizeContainment(pairs: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame =
    attachSizes(pairs, sizes)
      .withColumn("containment",
        round(col("shared") / least(col("n_a"), col("n_b")), 4))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("shared"), col("containment"),
        col("n_a"), col("n_b"))

  /** Incremental containment: only pairs TOUCHING the new batch are
    * expanded — the daily-ingest shape (mirrors
    * [[minhashLshPairsIncremental]] for the LSH family). The corpus
    * side still contributes postings and sizes (a new doc can be
    * contained in an old one and vice versa), but corpus×corpus pairs
    * are filtered out inside the posting-list expansion BEFORE the
    * pair shuffle, so steady-state cost tracks the batch, not the
    * corpus². Output is identical to [[containmentPairsPostings]]
    * restricted to pairs with at least one new side (MlSpec pins the
    * differential).
    *
    * Persist hazard (same as [[minhashLshPairs]]): this convenience
    * form pins a corpus-sized postings persist per CALL, reclaimed by
    * the ContextCleaner only when the result frame is unreachable. A
    * caller invoking it PER INGEST BATCH in a long-lived session —
    * its stated purpose — must instead build postings once with
    * [[containmentPostings]], manage that frame's persist lifetime
    * itself, and call [[containmentPairsIncrementalFromPostings]]
    * per batch (the FromDigests pattern). */
  def containmentPairsIncremental(docs: DataFrame, isNew: Column, n: Int,
      threshold: Double, dfCap: Int = 50): DataFrame = {
    val postings = containmentPostings(docs, isNew, n, dfCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    containmentPairsIncrementalFromPostings(postings, threshold)
  }

  /** Flagged df-capped postings index: (shingle, docs: array<(doc_id,
    * is_new)>). Build ONCE per corpus snapshot, persist under caller
    * control, and feed to [[containmentPairsIncrementalFromPostings]]
    * per batch. */
  def containmentPostings(docs: DataFrame, isNew: Column, n: Int,
      dfCap: Int): DataFrame =
    shingleKeyTable(docs, n)
      .join(docs.select(col("doc_id"), isNew.as("is_new")), Seq("doc_id"))
      .groupBy(col("shingle"))
      .agg(collect_list(struct(col("doc_id"), col("is_new"))).as("docs"))
      .filter(size(col("docs")) <= dfCap)

  /** Pair expansion + finalize over a prebuilt [[containmentPostings]]
    * frame (persist it first — it feeds both the sizes and the pair
    * branch). r9: when doc_id is int-or-narrower, corpus-only pairs
    * are dropped INSIDE the expansion lambda (filter, not a struct
    * flag carried through the shuffle) and the surviving pairs emit as
    * one packed long — the same co-occurrence-groupBy packing that
    * bought the full variant 40% on its pair stage
    * ([[postingsPairCounts]]); long doc_ids keep the struct form. */
  def containmentPairsIncrementalFromPostings(postings: DataFrame,
      threshold: Double): DataFrame = {
    val (pairs, sizes) = incrementalPairCounts(postings)
    finalizeContainment(pairs, sizes, threshold)
  }

  /** Incremental (batch-touching) Jaccard pairs from a prebuilt
    * [[containmentPostings]] frame — the sample×corpus exact-truth
    * side of the sampled recall monitor ([[lshRecallProbeSampled]]),
    * and the Jaccard twin of
    * [[containmentPairsIncrementalFromPostings]]: the SAME
    * [[incrementalPairCounts]] expansion (corpus-only pairs dropped
    * inside the posting-list lambda, before any shuffle), finalized
    * with the Jaccard rule instead of containment. */
  def jaccardPairsIncrementalFromPostings(postings: DataFrame,
      threshold: Double): DataFrame = {
    val (pairs, sizes) = incrementalPairCounts(postings)
    finalizeJaccard(pairs, sizes, threshold)
  }

  /** The shared incremental pair machinery: (pairs(doc_a, doc_b,
    * shared), sizes(doc_id, n_sh)) from a flagged postings frame,
    * keeping only pairs with at least one `is_new` member. Factored
    * (r16) so the containment and Jaccard incremental forms cannot
    * diverge — the [[pairCountsFromCapped]] discipline applied to the
    * batch-touching variant. */
  private[ml] def incrementalPairCounts(postings: DataFrame)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.{ArrayType, ByteType, IntegerType, ShortType, StructType}
    val docIdType = postings.schema("docs").dataType match {
      case ArrayType(st: StructType, _) => Some(st("doc_id").dataType)
      case _ => None
    }
    val packIds = docIdType.exists {
      case IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val sizes = postings.select(explode(col("docs")).as("d"))
      .groupBy(col("d.doc_id").as("doc_id")).agg(count(lit(1)).as("n_sh"))
    // struct array sorts by its first field (doc_id), preserving the
    // a < b pair orientation of the full variant
    val sorted = col("docs_s")
    val expanded = postings
      .filter(size(col("docs")) >= 2 &&
        exists(col("docs"), d => d.getField("is_new")))
      .select(array_sort(col("docs")).as("docs_s"))
    val pairs =
      if (packIds)
        expanded
          .select(explode_outer(flatten(transform(sorted, (a, i) =>
            filter(transform(slice(sorted, i + lit(2), size(sorted)), b =>
              when(a.getField("is_new") || b.getField("is_new"),
                shiftleft(a.getField("doc_id").cast("long"), 32)
                  .bitwiseOR(b.getField("doc_id").cast("long")
                    .bitwiseAND(lit(0xFFFFFFFFL))))),
              pk => pk.isNotNull)))).as("pk"))
          .filter(col("pk").isNotNull)
          .groupBy(col("pk"))
          .agg(count(lit(1)).as("shared"))
          // unpack to the ORIGINAL doc_id type so both branches emit
          // the same schema for the same logical input
          .select(shiftright(col("pk"), 32).cast(docIdType.get).as("doc_a"),
            shiftright(shiftleft(col("pk"), 32), 32).cast(docIdType.get).as("doc_b"),
            col("shared"))
      else
        expanded
          .select(explode_outer(flatten(transform(sorted, (a, i) =>
            transform(slice(sorted, i + lit(2), size(sorted)), b =>
              struct(a.getField("doc_id").as("doc_a"),
                b.getField("doc_id").as("doc_b"),
                (a.getField("is_new") || b.getField("is_new"))
                  .as("touches_new")))))).as("p"))
          .filter(col("p.touches_new"))
          .select(col("p.doc_a"), col("p.doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("shared"))
    (pairs, sizes)
  }

  /** Attach both docs' rare-shingle set sizes to (doc_a, doc_b, shared)
    * pairs as n_a/n_b — the ONE copy of the size-attach scaffolding
    * every pair measure (jaccard, containment) finalizes from, so the
    * implementations cannot silently diverge. */
  private def attachSizes(pairs: DataFrame, sizes: DataFrame): DataFrame =
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))

  /** Shared tail of both jaccard forms: attach per-doc set sizes,
    * compute the ratio, apply the threshold. */
  private[ml] def finalizeJaccard(pairs: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame =
    attachSizes(pairs, sizes)
      .withColumn("jaccard",
        round(col("shared") / (col("n_a") + col("n_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  /** Pairwise n-gram Jaccard via inverted index with stop-shingle cap.
    * Output: (doc_a, doc_b, jaccard) for jaccard >= threshold, a < b.
    * Shingles with document frequency > dfCap are dropped on BOTH the
    * index and the set-size side, so the ratio stays a true Jaccard
    * over the rare-shingle subspace.
    *
    * Plan shape: the co-occurrence groupBy on the pair stream IS both
    * the dedup and the |A∩B| computation — one shuffle does double
    * duty (an explicit distinct + array verify measured strictly
    * slower). The df filter is a window count, not a groupBy+join, so
    * the shingle index shuffles by shingle exactly once before the
    * self-join. */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      dfCap: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = shingleKeyTable(docs, n)
    val rareSh = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      .filter(col("df") <= dfCap)
      .drop("df")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sizes is doc-cardinality — never force-broadcast it (billions of
    // rows at full scale); AQE broadcasts when it measures small and
    // shuffle-joins otherwise.
    val sizes = rareSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = rareSh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = rareSh.select(col("doc_id").as("doc_b"), col("shingle"))
    val pairs = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared"))
    finalizeJaccard(pairs, sizes, threshold)
  }

  /** Permutation constants for [[minhashSignatures]]: small odd
    * multipliers (< 2^18) derived deterministically from the slot
    * index, mirrored verbatim in the q32 oracle SQL generator so both
    * engines compute the identical signature. */
  def permA(j: Int): Long = ((j + 1) * 40503L % 65213) * 2 + 1
  def permB(j: Int): Long = ((j + 1) * 104729L % 65213) * 2 + 1
  val minhashP = 2147483647L // 2^31 - 1

  /** Portable min-hash from ONE md5 per shingle (the previous form
    * salted and re-hashed per slot — k=12 full digests per shingle,
    * the measured q32 hot path). Each shingle's digest is parsed once
    * into two 32-bit halves h1/h2 (hex → long), and slot j's value is
    * the universal-hash combination (h1·A_j + h2·B_j + j) mod p with
    * p = 2^31-1 — each slot is an independent-enough pseudo-permutation
    * of shingle space, and the per-slot work drops from an md5 to two
    * multiplies. Minima are 8-byte longs, so signature columns, band
    * keys, and every downstream comparison run on fixed-width integers
    * instead of 32-char digests. All arithmetic stays below 2^50 (no
    * overflow) and is expressible identically in DuckDB
    * (CAST('0x'||substr(md5(s),…) AS BIGINT)), preserving the
    * exact-oracle contract. Input: shingleSets frame (doc_id, sh).
    * Returns doc_id, mh0..mh{k-1} LONG. */
  def minhashSignatures(sets: DataFrame, k: Int): DataFrame =
    minhashSignaturesFromDigests(shingleDigests(sets), k)

  /** [[minhashSignatures]] over a pre-built [[shingleDigests]] frame —
    * so pipelines that also need the verify keys md5 each shingle
    * exactly once across both consumers. */
  def minhashSignaturesFromDigests(withDig: DataFrame, k: Int): DataFrame = {
    // h1 and h2 each reference the digest array, and an inline md5
    // would run twice (no CSE across the two transforms — see tokTable).
    val base = withDig.select(col("doc_id"),
      transform(col("dig"), d => conv(substring(d, 1, 8), 16, 10).cast("long")).as("h1"),
      transform(col("dig"), d => conv(substring(d, 9, 8), 16, 10).cast("long")).as("h2"))
    val mhs = (0 until k).map { j =>
      array_min(zip_with(col("h1"), col("h2"), (a, b) =>
        (a * lit(permA(j)) + b * lit(permB(j)) + lit(j.toLong)) % lit(minhashP)))
        .as(s"mh$j")
    }
    base.select(col("doc_id") +: mhs: _*)
  }

  /** LSH band keys: `bands` groups of `rowsPerBand` signature slots,
    * key = '|'-joined slot values (longs render identically in any
    * engine; the join hashes the key anyway, so an extra md5 here buys
    * nothing). Output (doc_id, band, key). */
  def lshBands(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand)
        .map(r => col(s"mh${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), concat_ws("|", slots: _*).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** (doc_id, sig ARRAY<LONG>, band, key) — each doc exploded to its
    * `bands` LSH bucket keys with the full signature riding along (so
    * downstream slot-agreement estimates never join back). Shared by
    * the batch pipelines below and the streaming checker
    * ([[graft.streaming.StreamingDedup]]); pure per-row expressions,
    * zero shuffle. */
  def bandKeyTable(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    val bandStructs = (0 until bands).map { b =>
      val slots = (0 until rowsPerBand)
        .map(r => col(s"mh${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), concat_ws("|", slots: _*).as("key"))
    }
    sig.select(col("doc_id"),
        array((0 until k).map(j => col(s"mh$j")): _*).as("sig"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Slot-agreement count between two k-slot signature arrays — the
    * in-row Jaccard estimate (E[agree/k] = j). */
  def sigAgreement(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (p, q) => p === q), hit => hit))

  /** MinHash+LSH near-duplicate detection: candidates = docs sharing any
    * band bucket; verified with true Jaccard on the shingle table.
    * Output: (doc_a, doc_b, jaccard) with jaccard >= threshold, a < b.
    *
    * k/bands/rowsPerBand tune the recall curve: P(candidate) =
    * 1-(1-j^rows)^bands. Verification cost is bounded by candidate
    * count, never the cross product.
    *
    * `minAgree` > 0 adds the standard signature-estimate pre-filter:
    * a candidate pair's minhash slot agreement is an unbiased Jaccard
    * estimate (E[agree/k] = j), already computed — the signatures ride
    * along through the band join as one array column per side — so
    * pairs whose estimate falls below minAgree/k are dropped BEFORE the
    * candidate distinct and the array_intersect verify join ever see
    * them. On a clustered corpus the band join's output is dominated by
    * low-similarity coincidental collisions; the estimate kills ~90% of
    * them with per-row integer math while keeping P(drop a true
    * j >= 0.45 pair) < 2% at k=12/minAgree=5 (binomial tail; pairs
    * near the 0.3 threshold are kept with ~80%+ probability since
    * sharing a band already pins rowsPerBand slots equal). This is a
    * deliberate, tunable recall trade (classic LSH practice) and the
    * oracle mirrors the identical filter — minAgree = 0 restores the
    * verify-everything behavior. */
  def minhashLshPairs(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, minAgree: Int = 0): DataFrame = {
    // The digest frame is the shared upstream of BOTH consumers
    // (signatures, verify keys): one md5 per shingle, persisted once.
    // The verify join then shuffles/intersects 8-byte key arrays, not
    // ~20-char shingle strings — same set algebra, several× less
    // payload (the r4-measured q32 gap was exactly this join).
    // Persist lifetime: registered until the session clears it (Bench
    // clears between queries; ContextCleaner reclaims once the result
    // frame is unreachable). A caller invoking this PER MICRO-BATCH
    // must use [[minhashLshPairsFromDigests]] with its own managed
    // digest frame instead, or each batch leaks one pinned cache
    // entry (see streaming.StreamingDedup.checkBatch).
    val withDig = shingleDigests(shingleSets(docs, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    minhashLshPairsFromDigests(withDig, k, bands, threshold, minAgree)
  }

  /** [[minhashLshPairs]] over a caller-managed [[shingleDigests]]
    * frame — the caller controls persist/unpersist (mandatory for
    * per-micro-batch use, where an internal persist would pin one
    * cache entry per batch forever). */
  def minhashLshPairsFromDigests(withDig: DataFrame, k: Int, bands: Int,
      threshold: Double, minAgree: Int): DataFrame = {
    require(bands * (k / bands) == k, "k must divide into bands evenly")
    // Measured alternative (r6, tools/AbBench q32_joinback): carry only
    // doc_ids through the band shuffle and join signatures back onto
    // the candidate pairs for the agreement estimate. ~10% faster at
    // sf0.1 (0.85 vs 0.98 s min, interleaved) — but it joins the
    // corpus-cardinality signature table TWICE after the distinct,
    // which at 100 TB shuffles the whole sig table per join; the
    // riding form pays bands×k longs per doc in ONE shuffle instead.
    // Kept as-is: the toy-scale delta is stage-floor noise, the scale
    // shape difference is structural.
    // Signatures and band keys are per-row array math (no shuffle);
    // the only shuffles in the whole pipeline are the groupBy hiding in
    // the band self-join (docs·bands rows) and the candidate distinct.
    val sig = minhashSignaturesFromDigests(withDig, k)
    // Band keys AND the full signature array in one projection — the
    // estimate must not cost a join back to the signature frame.
    val bk = bandKeyTable(sig, k, bands)
    // Bucket-list candidate generation: ONE shuffle (groupBy band+key)
    // instead of a self-join's write + two reads. Buckets are collected
    // as (doc_id, sig) struct lists — array_sort on the struct sorts by
    // doc_id (first field), so the triangular expansion emits each pair
    // once with a < b — and the agreement estimate is computed in-row
    // during expansion, so sub-minAgree pairs never even reach the
    // distinct. Bucket sizes bound the fan-out exactly as in the join
    // form (B²/2 per bucket).
    val ds2 = col("ds2")
    val pairs = bk
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(array_sort(col("ds")).as("ds2"))
      .select(explode_outer(flatten(transform(ds2, (a, i) =>
        transform(slice(ds2, i + lit(2), size(ds2)), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            sigAgreement(a.getField("sig"), b.getField("sig")).as("agree")))))).as("p"))
      .filter(col("p.agree") >= lit(minAgree))
      .select(col("p.doc_a"), col("p.doc_b"))
    val candidates = pairs.distinct()
    verifyJaccard(candidates, keySetsFromDigests(withDig), threshold)
  }

  /** Measured recall of the MinHash-LSH screen against the exact
    * Jaccard truth, at caller-chosen slot-agreement operating points —
    * the dedup-family analog of [[IvfIndex.recallProbe]] (q116): the
    * screen's quality half, answering "how many true near-dup pairs
    * does the banding + minAgree prefilter lose?" before anyone
    * tightens minAgree for speed. One row per operating point:
    * (min_agree, n_exact, n_found, recall).
    *
    * Cost contract: the exact side is the postings Jaccard at
    * `exactDfCap` (effectively uncapped on gate corpora — max shingle
    * df is 25 at sf0.1); like q116's exact pass this is a
    * monitoring-CADENCE job to run on a bounded sample at 100 TB,
    * never the serving path. One LSH run at the LOOSEST point carries
    * its slot-agreement per pair (agreement is a function of the two
    * signatures, so tighter points are derived by filtering — the
    * candidate/verify work is never repeated per point). */
  def lshRecallProbe(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, agreePoints: Seq[Int],
      exactDfCap: Int = 1000000): DataFrame = {
    require(agreePoints.nonEmpty, "need at least one operating point")
    require(bands * (k / bands) == k, "k must divide into bands evenly")
    val exact = jaccardPairsPostings(docs, n, threshold, exactDfCap)
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"))
    val withDig = shingleDigests(shingleSets(docs, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val loosest = agreePoints.min
    val sig = minhashSignaturesFromDigests(withDig, k)
    val bk = bandKeyTable(sig, k, bands)
    val ds2 = col("ds2")
    // the minhashLshPairsFromDigests expansion with agree KEPT on the
    // pair (same-pair buckets carry the same agree, so distinct
    // collapses them)
    val candAgree = bk
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("sig"))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(array_sort(col("ds")).as("ds2"))
      .select(explode_outer(flatten(transform(ds2, (a, i) =>
        transform(slice(ds2, i + lit(2), size(ds2)), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            sigAgreement(a.getField("sig"), b.getField("sig"))
              .as("agree")))))).as("p"))
      .filter(col("p.agree") >= lit(loosest))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.agree").as("agree"))
      .distinct()
    val found = verifyJaccard(candAgree.select(col("doc_a"), col("doc_b")),
        keySetsFromDigests(withDig), threshold)
      .join(candAgree, Seq("doc_a", "doc_b"))
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"), col("agree"))
    recallByPoint(exact, found, agreePoints)
  }

  /** One recall row per operating point from an exact-truth pair set
    * and an agree-carrying found set — the shared tail of both recall
    * probes (q71 integer-target emission on the ratio). */
  private def recallByPoint(exact: DataFrame, found: DataFrame,
      agreePoints: Seq[Int]): DataFrame =
    agreePoints.distinct.sorted.map { ap =>
      exact
        .join(found.filter(col("agree") >= ap)
          .select(col("doc_a"), col("doc_b"), lit(1L).as("f")),
          Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          coalesce(sum(col("f")), lit(0L)).as("n_found"))
        .select(lit(ap).as("min_agree"), col("n_exact"), col("n_found"),
          (round(col("n_found").cast("double") / col("n_exact") * 10000, 0)
            .cast("long") / lit(10000.0)).as("recall"))
    }.reduce(_ unionByName _)

  /** Sample-bounded recall of the MinHash-LSH screen — the form that
    * actually runs at monitoring cadence on a large corpus, closing
    * the r15 gap where [[lshRecallProbe]]'s exact side was the one
    * shipped corpus²-ish job: recall is measured over the pair
    * population TOUCHING a caller-chosen document sample, so the
    * exact-truth side is sample×corpus (the q116 ANN-recall
    * contract), built with the SAME flagged-postings expansion the
    * incremental dedup paths use ([[incrementalPairCounts]] — corpus-
    * only pairs are dropped inside the posting-list lambda, before
    * any shuffle). The LSH side stays O(docs·bands) (linear) and its
    * candidate expansion short-circuits corpus-only buckets exactly
    * like [[minhashLshPairsIncremental]].
    *
    * Cost envelope (r16 AbBench interleaved, sf0.1 min-of-5): the
    * exact side alone is 1.23 s of the 2.57 total — dominated by the
    * UNCAPPED postings expansion, not tokenization (sharing the LSH
    * side's digest pass measured a wash, 2.43 vs 2.57 with a worse
    * median — experiment recorded in AbBench). Monitoring-cadence
    * cost by contract; tighten `exactDfCap`/shrink the sample before
    * tightening the screen itself.
    *
    * `isSample` must be a deterministic predicate over `docs` columns
    * (a hash-bucket split, an id residue) so the monitor is
    * reproducible run-over-run. Unbiasedness: pair (a,b) is observed
    * iff a or b lands in the sample; both recall numerator and
    * denominator restrict to the same observed population, so the
    * estimate is exact ON that population and converges to corpus
    * recall as the sample grows (standard capture sampling). Output
    * schema matches [[lshRecallProbe]]: (min_agree, n_exact, n_found,
    * recall). */
  def lshRecallProbeSampled(docs: DataFrame, isSample: Column, n: Int,
      k: Int, bands: Int, threshold: Double, agreePoints: Seq[Int],
      exactDfCap: Int = 1000000): DataFrame = {
    require(agreePoints.nonEmpty, "need at least one operating point")
    require(bands * (k / bands) == k, "k must divide into bands evenly")
    // exact truth over sample-touching pairs: flagged postings +
    // incremental expansion + jaccard finalize
    val postings = containmentPostings(docs, isSample, n, exactDfCap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = jaccardPairsIncrementalFromPostings(postings, threshold)
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"))
    val withDig = shingleDigests(shingleSets(docs, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val loosest = agreePoints.min
    val sig = minhashSignaturesFromDigests(withDig, k)
    val bk = bandKeyTable(sig, k, bands)
      .join(docs.select(col("doc_id"), isSample.as("is_new")), Seq("doc_id"))
    val ds2 = col("ds2")
    val candAgree = bk
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("sig"), col("is_new"))).as("ds"))
      .filter(size(col("ds")) >= 2 &&
        exists(col("ds"), d => d.getField("is_new")))
      .select(array_sort(col("ds")).as("ds2"))
      .select(explode_outer(flatten(transform(ds2, (a, i) =>
        transform(slice(ds2, i + lit(2), size(ds2)), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            (a.getField("is_new") || b.getField("is_new")).as("touches_new"),
            sigAgreement(a.getField("sig"), b.getField("sig"))
              .as("agree")))))).as("p"))
      .filter(col("p.touches_new") && col("p.agree") >= lit(loosest))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.agree").as("agree"))
      .distinct()
    val found = verifyJaccard(candAgree.select(col("doc_a"), col("doc_b")),
        keySetsFromDigests(withDig), threshold)
      .join(candAgree, Seq("doc_a", "doc_b"))
      .select(col("doc_a").cast("long").as("doc_a"),
        col("doc_b").cast("long").as("doc_b"), col("agree"))
    recallByPoint(exact, found, agreePoints)
  }

  /** Incremental MinHash+LSH near-dup detection: pairs between a NEW
    * batch and the EXISTING corpus (plus within the new batch), never
    * corpus × corpus — the shape a continuously-ingesting pipeline
    * actually runs. A 100 TB corpus is deduped ONCE; every subsequent
    * ingest only needs its new documents checked against the corpus's
    * (stored) band table and against each other. Candidate generation
    * is identical to [[minhashLshPairs]] — bucket-list groupBy on
    * (band, key) — but the triangular expansion keeps only pairs with
    * at least one new member, so the corpus side contributes rows ONLY
    * to buckets a new document also lands in; corpus-only buckets
    * short-circuit to zero pairs. At scale the corpus band table is
    * bucketed by (band, key) on disk and this probe is a co-located
    * join; the quadratic corpus-self-pairing term is gone entirely.
    *
    * `isNew` marks the new batch (e.g. `col("ingest_ts") > watermark`
    * or an id range). Output: (doc_a, doc_b, jaccard), a < b, at least
    * one side new, same verify + minAgree semantics as
    * [[minhashLshPairs]]. */
  def minhashLshPairsIncremental(docs: DataFrame, isNew: Column, n: Int,
      k: Int, bands: Int, threshold: Double, minAgree: Int = 0): DataFrame =
    minhashLshPairsIncrementalImpl(docs, isNew, n, k, bands, threshold,
      minAgree, forceJoinFlag = false)

  /** [[minhashLshPairsIncremental]] with the pre-r19 join-attached
    * flag forced — the AbBench A/B lever; identical output. */
  private[graft] def minhashLshPairsIncrementalImpl(docs: DataFrame,
      isNew: Column, n: Int, k: Int, bands: Int, threshold: Double,
      minAgree: Int, forceJoinFlag: Boolean): DataFrame = {
    require(bands * (k / bands) == k, "k must divide into bands evenly")
    // same one-md5-pass digest sharing as minhashLshPairs
    val withDig = shingleDigests(shingleSets(docs, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = minhashSignaturesFromDigests(withDig, k)
    // attach the new-batch flag. r19 (opt): when the predicate only
    // references doc_id it evaluates INLINE on the band table — the
    // band rows carry docs' own doc_id attribute through the
    // projection chain, so the expression resolves there directly
    // (by exprId for pre-resolved Columns, by name for col("…")
    // ones). The join form attached a docs-cardinality two-column
    // frame onto the docs×bands band table: broadcast-sized at bench
    // scale but corpus-sized at 100 TB, where it would force either
    // a corpus broadcast or a full band-table shuffle — a flag
    // evaluation is free at every scale. Predicates over other
    // columns (an ingest_ts watermark) keep the join fallback.
    // Column↔Expression bridges are private in Spark 4 (the
    // BitHamming registry note) — read the predicate's referenced
    // attributes off an analyzed one-column projection instead
    // (driver-only, no job).
    val isNewAnalyzed = docs.select(isNew.as("is_new")).queryExecution.analyzed
    val isNewRefs = isNewAnalyzed.references.map(_.name).toSet
    // determinism required for the inline path (r19 advice): the join
    // form evaluates the predicate once per DOC, the inline form once
    // per BAND ROW — a non-deterministic predicate (rand()-based, with
    // an EMPTY reference set that would pass the refs check) could
    // give a doc's bands disagreeing is_new values and diverge the
    // pair set. Deterministic + doc_id-only ⇒ per-row ≡ per-doc.
    val isNewDeterministic = isNewAnalyzed.expressions.forall(_.deterministic)
    val bkBase = bandKeyTable(sig, k, bands)
    val bk =
      if (!forceJoinFlag && isNewDeterministic &&
          isNewRefs.subsetOf(Set("doc_id")))
        bkBase.withColumn("is_new", isNew)
      else
        bkBase.join(docs.select(col("doc_id"), isNew.as("is_new")), Seq("doc_id"))
    val ds2 = col("ds2")
    val pairs = bk
      .groupBy(col("band"), col("key"))
      .agg(collect_list(struct(col("doc_id"), col("sig"), col("is_new"))).as("ds"))
      // corpus-only buckets can never produce a qualifying pair
      .filter(size(col("ds")) >= 2 &&
        exists(col("ds"), d => d.getField("is_new")))
      .select(array_sort(col("ds")).as("ds2"))
      .select(explode_outer(flatten(transform(ds2, (a, i) =>
        transform(slice(ds2, i + lit(2), size(ds2)), b =>
          struct(a.getField("doc_id").as("doc_a"),
            b.getField("doc_id").as("doc_b"),
            (a.getField("is_new") || b.getField("is_new")).as("touches_new"),
            sigAgreement(a.getField("sig"), b.getField("sig")).as("agree")))))).as("p"))
      .filter(col("p.touches_new") && col("p.agree") >= lit(minAgree))
      .select(col("p.doc_a"), col("p.doc_b"))
    verifyJaccard(pairs.distinct(), keySetsFromDigests(withDig), threshold)
  }

  /** 32-bit SimHash signature as a '0'/'1' bit string (packed-long-free
    * so the exact same computation is expressible in any SQL engine).
    * Bit i of md5(token): hex char i/4, bit (i%4) of its value; per-doc
    * bit = majority vote over tokens (with multiplicity). */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val withDigits = (0 until 8).foldLeft(toks) { (df, c) =>
      df.withColumn(s"d$c",
        (instr(lit("0123456789abcdef"), substring(col("h"), c + 1, 1)) - 1))
    }
    val sums = (0 until 32).map { i =>
      val c = i / 4; val k = i % 4
      sum(shiftright(col(s"d$c"), k) % 2 * 2 - 1).as(s"s$i")
    }
    val agg = withDigits.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val bits = (0 until 32).map(i => when(col(s"s$i") > 0, "1").otherwise("0"))
    agg.select(col("doc_id"), concat(bits: _*).as("simhash"))
  }

  /** SimHash near-dup pairs: bucket on the first `prefixBits` of the
    * signature, pair within bucket, keep hamming <= maxHamming. */
  def simhashPairs(docs: DataFrame, prefixBits: Int, maxHamming: Int): DataFrame = {
    // The signature frame feeds both self-join sides — persist, or the
    // whole token-explode aggregation runs twice. Tiny: one row/doc.
    val sig = simhashSignatures(docs)
      .withColumn("bucket", substring(col("simhash"), 1, prefixBits))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = sig.select(col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = sig.select(col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    // bit_hamming is a native codegen'd expression (graft.plans.
    // BitHamming): one byte-compare loop per pair instead of the
    // 32-term substring-comparison chain a pure-Column form needs.
    a.join(b, Seq("bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", graft.plans.BitHamming(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
