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
  * Training is Lloyd's algorithm as DataFrame ops: assignment is a
  * broadcast join against the (tiny) centroid table + argmin window;
  * update is a per-cell average. Deterministic: centroids init from
  * the k lowest vec_ids, ties in argmin break on cell id. At 100 TB
  * you train on a sample and assign the full corpus in one pass —
  * assignment is a narrow broadcast stage, never a shuffle of the
  * corpus.
  */
object Ivf {

  /** Squared L2 distance between two double arrays. */
  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Assign each vector to its nearest centroid.
    * Input: prepared embeddings (vec_id, v, nrm), centroids (cell_id,
    * centroid). Output: input + cell_id. */
  def assign(prepared: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("d2").asc, col("cell_id").asc)
    prepared.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("v"), col("centroid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("d2", "rn", "centroid")
  }

  /** Train k cells with `iters` Lloyd iterations. Returns (cell_id,
    * centroid) — k rows, collect-safe at any corpus size. */
  def train(prepared: DataFrame, k: Int, iters: Int): DataFrame = {
    val dim = prepared.select(size(col("v"))).first().getInt(0)
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
    val indexed = assign(p, centroids)
    // nprobe nearest cells per query vector
    val wq = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cell_id").asc)
    val queryCells = p.filter(isQuery(col("vec_id")))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(col("v"), col("centroid")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("cell_id"))
    val cands = indexed.select(col("cell_id"), col("vec_id").as("cand_id"),
      col("v").as("cv"), col("nrm").as("cn"))
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("cand_id"))
    queryCells.join(cands, Seq("cell_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }
}
