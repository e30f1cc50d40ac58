package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring: Jensen-Shannon divergence between a
  * reference slice and a current slice of a corpus, over any set of
  * categorical dimensions, in ONE scan.
  *
  * Reference behavior frame: blq-cli's run-diff / summary surface
  * (cross-run distribution comparison over stored events,
  * /root/reference/src/blq/query.py run_diff) — generalized from
  * count deltas to a proper bounded divergence, the number an ingest
  * pipeline alerts on when a crawl's source/language/length mix
  * shifts under it.
  *
  * Why JS and not KL: KL is infinite the moment the current batch
  * contains a category the reference lacks — exactly the event a
  * drift monitor most needs to report as a FINITE, comparable score.
  * JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M) with M = ½(P+Q) is symmetric,
  * bounded by ln 2, and zero iff the mixes agree.
  *
  * Scale shape: each input row explodes to one (dim, value) pair per
  * dimension — a map-only widening by |dims| (bounded, typically ≤ 5)
  * — then ONE aggregation by (dim, value, side) whose output
  * cardinality is the sum of the dimensions' category counts, bounded
  * and tiny by construction (sources, languages, byte-size buckets —
  * never free text). Everything after the first agg is arithmetic on
  * that bounded frame: per-dim totals ride a second tiny agg, never a
  * window over the corpus. At 100 TB this is one corpus scan + two
  * kilobyte-scale shuffles.
  *
  * Float contract: probabilities are exact-integer ratios
  * (count/total); the ln terms follow the repo's established
  * transcendental-emission precedent (q82/q85 — libm ln agrees across
  * engines to well below the 1e-4 emission grid) and the final score
  * is emitted integer-scaled (`round(js*1e4, 0)` → long → /1e4, the
  * q127/q128 contract) so the gate never samples a round-half point.
  */
object Drift {

  /** Per-dimension JS divergence between the `isCur` slice and the
    * rest. `dims` maps dimension name → categorical expression (must
    * be deterministic and bounded-cardinality). Output: (dim, n_ref,
    * n_cur, js) ordered by dim, js integer-scaled to 4 dp. */
  def jsDivergence(df: DataFrame, isCur: Column,
      dims: Seq[(String, Column)]): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    val pairs = array(dims.map { case (name, expr) =>
      struct(lit(name).as("dim"), expr.cast("string").as("val"))
    }: _*)
    val counts = df
      .select(explode(pairs).as("p"), isCur.cast("boolean").as("cur"))
      .groupBy(col("p.dim").as("dim"), col("p.val").as("val"))
      .agg(sum(when(col("cur"), 0L).otherwise(1L)).as("ref_n"),
        sum(when(col("cur"), 1L).otherwise(0L)).as("cur_n"))
    jsFromCounts(counts)
  }

  /** Persist a corpus's categorical mix as the drift REFERENCE — the
    * deployable monitoring shape: the corpus is scanned ONCE when the
    * reference is (re)built, and every subsequent ingest batch
    * compares against the stored bounded table, never the corpus.
    * Layout: (dim, val, cnt) — one row per category per dimension,
    * bounded by construction. */
  def writeReference(df: DataFrame, dims: Seq[(String, Column)],
      refDir: String): Unit = {
    require(dims.nonEmpty, "need at least one dimension")
    val pairs = array(dims.map { case (name, expr) =>
      struct(lit(name).as("dim"), expr.cast("string").as("val"))
    }: _*)
    df.select(explode(pairs).as("p"))
      .groupBy(col("p.dim").as("dim"), col("p.val").as("val"))
      .agg(count(lit(1)).as("cnt"))
      .coalesce(1)
      .write.mode("overwrite").parquet(refDir)
  }

  /** JS divergence of a batch against a stored reference mix — the
    * per-batch cost is the batch's own scan plus a kilobyte-scale
    * join against the stored counts. Same dims, same output schema
    * and arithmetic as [[jsDivergence]] (differential-tested: probing
    * a batch against a reference built from the rest of the corpus
    * equals the one-frame form exactly). */
  def probeReference(spark: org.apache.spark.sql.SparkSession,
      refDir: String, batch: DataFrame,
      dims: Seq[(String, Column)]): DataFrame = {
    require(dims.nonEmpty, "need at least one dimension")
    val pairs = array(dims.map { case (name, expr) =>
      struct(lit(name).as("dim"), expr.cast("string").as("val"))
    }: _*)
    val curCounts = batch.select(explode(pairs).as("p"))
      .groupBy(col("p.dim").as("dim"), col("p.val").as("val"))
      .agg(count(lit(1)).as("cur_n"))
    val refCounts = spark.read.parquet(refDir)
      .select(col("dim"), col("val"), col("cnt").as("ref_n"))
    val counts = refCounts.join(curCounts, Seq("dim", "val"), "full_outer")
      .select(col("dim"), col("val"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    jsFromCounts(counts)
  }

  /** Shared JS arithmetic over a (dim, val, ref_n, cur_n) counts frame
    * — factored so the one-frame and stored-reference forms cannot
    * diverge (the incrementalPairCounts discipline). Totals ride a
    * WINDOW over the counts frame, not a join back to it: counts
    * derives from the corpus scan, and a self-join would recompute
    * that scan for the totals branch (the PlanAuditSpec q141 pin —
    * two FileScans); the window's |dims|-partition exchange is
    * harmless because its input is the already-bounded counts
    * aggregate, never the corpus. */
  private def jsFromCounts(counts: DataFrame): DataFrame = {
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("dim"))
    val totals = counts
      .withColumn("ref_t", sum(col("ref_n")).over(wd))
      .withColumn("cur_t", sum(col("cur_n")).over(wd))
    // an empty slice degenerates to the zero distribution (js = ln 2
    // against any non-empty other side) rather than NaN-poisoning m
    val p = when(col("ref_t") > 0,
      col("ref_n").cast("double") / col("ref_t")).otherwise(lit(0.0))
    val q = when(col("cur_t") > 0,
      col("cur_n").cast("double") / col("cur_t")).otherwise(lit(0.0))
    val m = (p + q) / 2
    // zero-count categories contribute 0 to their own side's KL term
    val term =
      when(col("ref_n") > 0, p * log(p / m) / 2).otherwise(lit(0.0)) +
        when(col("cur_n") > 0, q * log(q / m) / 2).otherwise(lit(0.0))
    totals
      .groupBy(col("dim"))
      .agg(first(col("ref_t")).as("n_ref"), first(col("cur_t")).as("n_cur"),
        (round(sum(term) * 10000, 0).cast("long") / lit(10000.0)).as("js"))
      .orderBy(col("dim"))
  }

  /** Embedding-space drift: per label, the cosine between the current
    * slice's centroid and the reference slice's centroid — the vector
    * companion of [[jsDivergence]] (a crawl whose source/lang mix
    * looks stable can still drift semantically; the centroid cosine
    * catches that with one bounded number per label).
    *
    * Exactness follows the q85 centroid recipe to the letter:
    * centroids are 6-dp-rounded per-position averages (the rounding
    * exists so summation ORDER — engine, partitioning, driver —
    * cannot reach a gate), assembled pos-sorted, and the dot/norm
    * folds are sequential left-to-right on both engines
    * ([[graft.plans.VectorOps]] / DuckDB list_dot_product); the score
    * emits integer-scaled (the q127/q128 contract).
    *
    * Scale shape: one scan widened by posexplode (rows × dims — the
    * same widening every centroid pass in the repo pays), one
    * (label, pos)-keyed agg whose output is bounded by
    * |labels| × dims, then arithmetic on that bounded frame. Output:
    * (label, n_ref, n_cur, cos). */
  def embeddingDrift(embs: DataFrame, isCur: Column): DataFrame = {
    val sideCent = embs
      .select(col("label"), isCur.cast("boolean").as("cur"),
        posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(when(col("cur"), col("x"))), 6).as("cc"),
        round(avg(when(!col("cur"), col("x"))), 6).as("rc"),
        sum(when(col("cur"), 1L).otherwise(0L)).as("nc"),
        sum(when(!col("cur"), 1L).otherwise(0L)).as("nr"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("cc"), col("rc"))))
          .as("pc"),
        min(col("nc")).as("nc_min"), max(col("nc")).as("n_cur"),
        min(col("nr")).as("nr_min"), max(col("nr")).as("n_ref"))
      // ragged embedding dims fail LOUDLY (r16 advice): with
      // variable-length arrays the per-position counts differ across
      // pos — first(n) would be nondeterministic and high positions
      // would average over fewer rows, silently skewing centroids.
      // The agg output is bounded (|labels| rows), so the guard is
      // one expression on a tiny frame.
      .select(col("label"), col("pc"),
        when(col("nc_min") =!= col("n_cur") || col("nr_min") =!= col("n_ref"),
          raise_error(concat(
            lit("embeddingDrift: ragged embedding dimensions for label "),
            col("label"))))
          .otherwise(col("n_cur")).cast("long").as("n_cur"),
        col("n_ref"))
      .select(col("label"), col("n_ref"), col("n_cur"),
        transform(col("pc"), e => e.getField("rc")).as("ref_c"),
        transform(col("pc"), e => e.getField("cc")).as("cur_c"))
    sideCent
      .select(col("label"), col("n_ref"), col("n_cur"),
        (round(Similarity.dot(col("ref_c"), col("cur_c")) /
            (Similarity.l2Norm(col("ref_c")) * Similarity.l2Norm(col("cur_c")))
          * 10000, 0).cast("long") / lit(10000.0)).as("cos"))
      .orderBy(col("label"))
  }
}
