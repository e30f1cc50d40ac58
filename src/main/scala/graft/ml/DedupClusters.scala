package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup cluster assignment: connected components over the near-dup
  * pair graph, then one canonical (minimum-id) keeper per cluster —
  * the step that turns pair lists into an actual deletion set.
  *
  * Algorithm: iterative min-label propagation. Every doc starts
  * labeled with itself; each round, a doc adopts the minimum label in
  * its neighborhood (including its own). Converges in O(diameter)
  * rounds; near-dup clusters are tiny and dense (diameter ≤ ~3), so a
  * fixed small round count suffices and each round is one join + one
  * aggregation — the standard large-graph CC pattern when a graph
  * library is unavailable. Deterministic: min over doc ids.
  */
object DedupClusters {

  /** pairs: (doc_a, doc_b) undirected edges. docs: frame with doc_id.
    * Output: (doc_id, cluster_id, keep) — cluster_id = min doc id in
    * the component; keep = doc_id == cluster_id. */
  def assign(docs: DataFrame, pairs: DataFrame, rounds: Int = 4): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Only docs that appear in an edge can change label — propagate
    // over that (much smaller) set and re-attach singletons at the
    // end. localCheckpoint truncates the per-round lineage; without it
    // each iteration's plan nests the previous one and optimization
    // time grows exponentially with rounds.
    val edgeDocs = edges.select(col("src").as("doc_id")).distinct()
    var labels = edgeDocs.select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint(true)
    for (_ <- 0 until rounds) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("label", "dst_label"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("dst_label")).as("nbr_label"))
      labels = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(true)
    }
    val singletons = docs.select(col("doc_id"))
      .join(edgeDocs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("label"))
    labels.unionByName(singletons)
      .select(col("doc_id"), col("label").as("cluster_id"),
        (col("doc_id") === col("label")).as("keep"))
  }
}
