package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup cluster assignment: connected components over the near-dup
  * pair graph, then one canonical (minimum-id) keeper per cluster —
  * the step that turns pair lists into an actual deletion set.
  *
  * Algorithm: min-label propagation with pointer doubling. Every doc
  * starts labeled with itself; each round a doc adopts the minimum of
  * (its label, its neighbors' labels, its label's label). The
  * label-of-label join is the pointer-doubling step: effective reach
  * roughly doubles per round, so convergence is O(log diameter) rounds
  * instead of O(diameter) — at 100 TB a single long near-duplicate
  * chain (crawl mirrors of mirrors) no longer dictates the round
  * count. Rounds run until an explicit fixpoint (zero labels changed),
  * capped defensively; a silent cap would mean silently-split
  * clusters, so hitting it logs loudly. Deterministic: min over doc
  * ids.
  */
object DedupClusters {

  /** pairs: (doc_a, doc_b) undirected edges. docs: frame with doc_id.
    * Output: (doc_id, cluster_id, keep) — cluster_id = min doc id in
    * the component; keep = doc_id == cluster_id.
    *
    * @param maxRounds safety cap; with pointer doubling this covers
    *   component diameters ~2^(maxRounds−2) (measured: a 100k-node
    *   CHAIN — pure worst-case diameter — converges in 19 rounds; a
    *   500k-node power-law giant component with an extreme-degree hub
    *   converges in 6, see SCALING.md's giant-component sweep). The
    *   default covers diameters into the millions; converged rounds
    *   stop early, so a generous cap costs nothing on real graphs.
    *   Hitting it indicates a pathological graph and logs a warning
    *   rather than failing the job. */
  def assign(docs: DataFrame, pairs: DataFrame, maxRounds: Int = 24): DataFrame =
    assignWithStats(docs, pairs, maxRounds).labels

  /** [[assign]] plus the convergence facts the scale experiments need
    * (SCALING.md's giant-component sweep): how many propagation
    * rounds actually ran, and whether a fixpoint was reached. */
  final case class Assignment(labels: DataFrame, rounds: Int, converged: Boolean)

  def assignWithStats(docs: DataFrame, pairs: DataFrame,
      maxRounds: Int = 24): Assignment = {
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
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst")
          .withColumnRenamed("label", "dst_label"), Seq("dst"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("dst_label")).as("nbr_label"))
      // Pointer doubling: every label value is itself an edge-doc id
      // (initial labels are edge docs; min() keeps it in the set), so
      // each doc can look up its label's current label.
      val labelOfLabel = labels
        .select(col("doc_id").as("label"), col("label").as("ll"))
      val stepped = labels
        .join(neighborMin, Seq("doc_id"), "left")
        .join(labelOfLabel, Seq("label"), "left")
        .select(col("doc_id"), col("label").as("old_label"),
          least(col("label"),
            coalesce(col("nbr_label"), col("label")),
            coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(true)
      // Fixpoint check on the materialized checkpoint: cheap (one pass
      // over the label frame, which holds only edge docs).
      converged = stepped.filter(col("label") =!= col("old_label")).isEmpty
      labels = stepped.select(col("doc_id"), col("label"))
      round += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"DedupClusters.assign hit maxRounds=$maxRounds without converging; " +
          "cluster labels may be split — raise maxRounds")
    val singletons = docs.select(col("doc_id"))
      .join(edgeDocs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("label"))
    val out = labels.unionByName(singletons)
      .select(col("doc_id"), col("label").as("cluster_id"),
        (col("doc_id") === col("label")).as("keep"))
    Assignment(out, round, converged)
  }
}
