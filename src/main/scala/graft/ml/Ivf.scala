package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) ANN index: k-means cells over the embedding
  * space; queries probe only the `nprobe` nearest cells. The upgrade
  * path from [[Similarity.lshTopK]]'s sign buckets — same query shape
  * (equi-join on a cell key), but data-adaptive cells give much better
  * recall/cost at the same fan-out.
  *
  * Training is Lloyd's algorithm as DataFrame ops: the k centroids are
  * collected (k rows — bounded by construction) and inlined as an array
  * literal, so assignment is a pure per-row argmin over that array —
  * no join, no window, ZERO shuffle of the corpus. Deterministic:
  * centroids init from the k lowest vec_ids, ties in argmin break on
  * cell id. At 100 TB you train on a sample and assign the full corpus
  * in one narrow map stage.
  */
object Ivf {

  /** Squared L2 distance between two double arrays — native one-pass
    * expression (graft.plans.L2Squared), accumulation order identical
    * to the `aggregate(zip_with(...))` fold it replaces (bit-exact vs
    * the DuckDB ldp(diff, diff) oracle). */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.plans.VectorOps.l2sqCol(a, b)

  /** The centroid table inlined as a literal array<struct<cell_id,c>> —
    * the "broadcast" that needs no broadcast join: k rows by contract
    * (collect-safe), evaluated once per input row as plain expression
    * code inside whole-stage codegen. */
  private[graft] def centroidArray(centroids: DataFrame): org.apache.spark.sql.Column = {
    val rows = centroids.select(col("cell_id").cast("int"), col("centroid"))
      .collect().sortBy(_.getInt(0))
    require(rows.nonEmpty, "centroid table is empty")
    array(rows.toSeq.map { r =>
      struct(lit(r.getInt(0)).as("cell_id"),
        array(r.getSeq[Double](1).map(lit): _*).as("c"))
    }: _*)
  }

  /** Per-row (d2, cell_id) structs sorted ascending. Struct natural
    * order == (d2 ASC, cell_id ASC) — the identical tie-break the
    * previous window form used, now as per-row array math. */
  private[graft] def rankedCells(cents: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_sort(transform(cents, c =>
      struct(dist2(v, c.getField("c")).as("d2"),
        c.getField("cell_id").as("cell_id"))))

  /** Assign each vector to its nearest centroid.
    * Input: prepared embeddings (vec_id, v, nrm), centroids (cell_id,
    * centroid). Output: input + cell_id. Plan shape: scan → project —
    * no Exchange anywhere (PlanAuditSpec gates this). */
  def assign(prepared: DataFrame, centroids: DataFrame): DataFrame =
    assignWith(prepared, centroidArray(centroids))

  private def assignWith(prepared: DataFrame,
      cents: org.apache.spark.sql.Column): DataFrame =
    prepared.withColumn("cell_id",
      element_at(rankedCells(cents, col("v")), 1).getField("cell_id"))

  /** Train k cells with `iters` Lloyd iterations. Returns (cell_id,
    * centroid) — k rows, collect-safe at any corpus size. */
  def train(prepared: DataFrame, k: Int, iters: Int): DataFrame = {
    // the dim probe is only needed to build the update-step aggs —
    // skip the extra driver action entirely for iters = 0
    lazy val dim = prepared.select(size(col("v"))).first().getInt(0)
    var centroids = prepared
      .orderBy(col("vec_id")).limit(k)
      .select((row_number().over(Window.orderBy(col("vec_id"))) - 1).as("cell_id"),
        col("v").as("centroid"))
    for (_ <- 0 until iters) {
      val assigned = assign(prepared, centroids)
      val sums = (0 until dim).map(i =>
        avg(element_at(col("v"), i + 1)).as(s"c$i"))
      centroids = assigned.groupBy(col("cell_id"))
        .agg(sums.head, sums.tail: _*)
        .select(col("cell_id"), array((0 until dim).map(i => col(s"c$i")): _*).as("centroid"))
    }
    centroids
  }

  /** Top-k cosine neighbors probing the `nprobe` nearest cells per
    * query. Candidates join on cell_id — shuffle-partitionable, the
    * corpus is never cross-joined. */
  def topK(embs: DataFrame, isQuery: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      k: Int, cells: Int, nprobe: Int, iters: Int = 2): DataFrame = {
    val p = Similarity.prepared(embs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = train(p, cells, iters)
    // ONE k-row collect feeds both the corpus assignment and the query
    // cell probe — the only driver action in the whole index build.
    val cents = centroidArray(centroids)
    val indexed = assignWith(p, cents)
    // nprobe nearest cells per query vector — same per-row ranked-cells
    // math as assign (slice instead of head), again shuffle-free.
    val queryCells = p.filter(isQuery(col("vec_id")))
      .withColumn("cell_id", explode(transform(
        slice(rankedCells(cents, col("v")), 1, nprobe),
        s => s.getField("cell_id"))))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell_id"))
    val cands = indexed.select(col("cell_id"), col("vec_id").as("cand_id"),
      col("v").as("cv"), col("nrm").as("cn"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("cand_id"))
    probeShaped(queryCells, cands)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** The probe join with the at-scale build-side pick (r11, the lex
    * two-shuffle finding applied to the vector probes): a corpus small
    * enough to auto-broadcast is left to Catalyst (it builds the
    * corpus side and the dots ride the query partitions — measured
    * fastest at sf scale, 0.33 vs 0.38 s). Past the broadcast
    * threshold the un-hinted join degrades to hash(cell_id) — dot
    * parallelism capped at the CELL count regardless of cluster
    * width — so the contract-small query side is broadcast instead:
    * the corpus streams at its input partitioning (full width) and
    * the rank window's exchange is WindowGroupLimit-bounded to
    * top-k per partition per query (measured at 30×: 0.62 vs 0.72 s;
    * at 1000 executors the gap is the difference between
    * cells-way and cluster-wide). */
  private[graft] def probeShaped(queryCells: DataFrame,
      cands: DataFrame, key: String = "cell_id",
      corpusBytesHint: Option[BigInt] = None): DataFrame = {
    val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    // callers whose candidate frame DECODES a compressed payload pass
    // the post-decode size (plan stats see the stored bytes — an int8
    // table reads 8× under its in-join width, which kept the
    // collapsing broadcast-corpus plan alive 4× longer in the r11
    // sweep: int8 probe 0.80 s at 30× vs the float path's flat 0.50)
    val corpusBytes = corpusBytesHint.getOrElse(
      cands.queryExecution.optimizedPlan.stats.sizeInBytes)
    // the hint is only valid when the query side is itself small: a
    // caller passing a corpus-scale "query" set (every other vector,
    // say) must degrade to the shuffle join, not a driver-OOM
    // broadcast build — the contract-small assumption is enforced,
    // not assumed (r11 review finding)
    val qBytes = queryCells.queryExecution.optimizedPlan.stats.sizeInBytes
    val qside =
      if (thr >= 0 && corpusBytes > BigInt(thr) && qBytes <= BigInt(thr))
        org.apache.spark.sql.functions.broadcast(queryCells)
      else queryCells
    qside.join(cands, Seq(key))
  }
}
