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
    *   rather than failing the job.
    * @param smallGraphEdgeBound edge count at or below which the
    *   component labeling runs as driver-side union-find over ONE
    *   bounded collect (r9): the verified near-dup pair list is orders
    *   of magnitude smaller than the corpus (that is the point of
    *   dedup candidate generation), and the iterative distributed loop
    *   pays ~3 job launches per round for what is then sub-megabyte
    *   state — measured 1.2-1.5 s of pure scheduling floor at sf0.1's
    *   few-hundred-edge graphs. The default (2^20 edges collected as a
    *   typed Dataset of (Long, Long) — specialized tuples, ~32 B/edge
    *   ⇒ ~32 MB driver heap worst case) is the same bounded-collect
    *   contract class as the IVF centroid and LexIndex query-set
    *   collects; pass 0 to force the distributed path (the scale
    *   experiments do). The fast path only engages for integral doc_id
    *   types and bounds below Int.MaxValue — non-numeric ids or an
    *   effectively-unbounded bound fall through to the distributed
    *   loop rather than mislabeling. Labels are IDENTICAL on both
    *   paths (min doc id per component; differential in MlSpec). */
  def assign(docs: DataFrame, pairs: DataFrame, maxRounds: Int = 24,
      smallGraphEdgeBound: Long = 1L << 20): DataFrame =
    assignWithStats(docs, pairs, maxRounds, smallGraphEdgeBound).labels

  /** [[assign]] plus the convergence facts the scale experiments need
    * (SCALING.md's giant-component sweep): how many propagation
    * rounds actually ran, and whether a fixpoint was reached. */
  final case class Assignment(labels: DataFrame, rounds: Int, converged: Boolean)

  /** Driver-side component labeling: union-find with path compression
    * and min-id roots. Attaching the larger root under the smaller
    * keeps every tree's root equal to its component's minimum id (both
    * roots are their trees' minima by induction), which is exactly the
    * distributed pointer-doubling algorithm's fixpoint label. Returns
    * node → min-id-of-component for every node touched by an edge.
    * Pure (no Spark); property-tested against brute-force BFS labeling
    * in PropertySpec. */
  private[graft] def unionFindLabels(
      edges: Iterator[(Long, Long)]): Map[Long, Long] = {
    val parent = new java.util.HashMap[Long, Long]()
    val nodes = scala.collection.mutable.ArrayBuffer[Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x
      while (c != r) { val n = parent.getOrDefault(c, c); parent.put(c, r); c = n }
      r
    }
    edges.foreach { case (a, b) =>
      if (!parent.containsKey(a)) { parent.put(a, a); nodes += a }
      if (!parent.containsKey(b)) { parent.put(b, b); nodes += b }
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  def assignWithStats(docs: DataFrame, pairs: DataFrame,
      maxRounds: Int = 24, smallGraphEdgeBound: Long = 1L << 20): Assignment = {
    val spark = docs.sparkSession
    import spark.implicits._
    val idType = docs.schema("doc_id").dataType
    val integralId = idType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // Small-graph fast path: ONE bounded collect (limit bound+1, so
    // the gate and the data come from a single execution of the —
    // typically expensive — upstream pair pipeline; a separate count()
    // would run that pipeline twice) replaces the whole iterative
    // loop (see the assign() scaladoc). An oversized graph spills to
    // the distributed path below, paying the probe as its first
    // materialization. Eligibility is decided ONCE and gates both the
    // probe and the fast path — an empty probe from an ineligible
    // bound must not masquerade as an empty edge set.
    val fastEligible = integralId && smallGraphEdgeBound > 0 &&
      smallGraphEdgeBound < Int.MaxValue
    val probe: Array[(Long, Long)] =
      if (fastEligible)
        pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
          .limit(smallGraphEdgeBound.toInt + 1).as[(Long, Long)].collect()
      else Array.empty
    if (fastEligible && probe.length <= smallGraphEdgeBound) {
      val labelOf = unionFindLabels(probe.iterator)
      val labels = labelOf.toSeq.toDF("doc_id", "label")
        .select(col("doc_id").cast(idType).as("doc_id"),
          col("label").cast(idType).as("label"))
      val singletons = docs.select(col("doc_id"))
        .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("label"))
      val out = labels.unionByName(singletons)
        .select(col("doc_id"), col("label").as("cluster_id"),
          (col("doc_id") === col("label")).as("keep"))
      return Assignment(out, 0, converged = true)
    }
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

  /** Leakage-safe (cluster-aware) split assignment: every member of a
    * near-dup cluster lands in the SAME train/val/test split, or
    * held-out eval documents leak into training through their
    * near-copies — the standard contamination hazard a per-document
    * hash split (q61) cannot prevent by construction. The split is
    * drawn at CLUSTER granularity with the q61 deterministic-md5
    * contract: bucket = first 8 md5 hex digits of the cluster id's
    * decimal string, mod 10000; split thresholds are integer
    * permyriad cut points (no float boundaries — the q71 discipline),
    * so the assignment is reproducible across runs AND engines.
    *
    * `labels` is [[assign]]'s output (doc_id, cluster_id, keep);
    * singletons carry their own id as cluster_id, so they draw
    * independently exactly like a plain q61 split — only true
    * near-dup groups move together. Map-only over the labels frame:
    * the cluster graph work was already paid by assign.
    *
    * `splits`: (name, permyriad) in order; must sum to 10000. */
  def leakageSafeSplit(labels: DataFrame,
      splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    require(splits.map(_._2).sum == 10000,
      s"split permyriads must sum to 10000, got ${splits.map(_._2).sum}")
    val bucket = (conv(substring(md5(col("cluster_id").cast("string")), 1, 8),
      16, 10).cast("long") % 10000).as("bucket")
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val assignExpr = splits.zip(cuts).init.reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(col("bucket") < hi, lit(name)).otherwise(acc)
      }
    labels
      .select(col("doc_id"), col("cluster_id"), bucket)
      .withColumn("split", assignExpr)
  }
}
