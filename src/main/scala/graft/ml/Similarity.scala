package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path
  * is sign-bucketed LSH (axis hyperplanes) — candidates only within a
  * bucket, so the per-query candidate set shrinks ~2^bits× and the
  * bucket key is a shuffle-friendly short string. An IVF upgrade (learn
  * centroids, probe nearest cells) keeps the same query shape: replace
  * `signBucket` with an assigned centroid id.
  *
  * All arithmetic is float→double widening then sequential fold, which
  * matches DuckDB's `list_dot_product` over `::DOUBLE[]` exactly
  * (element order is list order in both engines), so results have exact
  * SQL oracles. Ranking ties are broken on rounded cosine + id so both
  * engines agree at the top-k boundary.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays — the native
    * codegen'd expression (graft.plans.DotProduct): bit-identical to
    * the `aggregate(zip_with(...))` fold it replaces, without the
    * per-pair zipped-array allocation that fold materializes (the
    * measured hot path of all-pairs/bucketed scoring). */
  def dot(a: Column, b: Column): Column = graft.plans.VectorOps.dotCol(a, b)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** vec frame with the embedding widened to double + its norm.
    * Repartitioned: embedding tables often arrive as a handful of input
    * splits, and everything downstream (pair scoring) is CPU-bound —
    * parallelism must be established here. */
  def prepared(embs: DataFrame): DataFrame =
    embs.repartition(embs.sparkSession.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))

  /** Per-vector cosine against its own label's centroid — the
    * embedding QUALITY SCREEN a pipeline runs before indexing
    * (mislabeled or corrupt vectors sit far from their cluster's
    * center; prune them before they poison ANN cells or centroid
    * training). Centroid = positionwise mean over the label, rounded
    * to 6 dp so cross-engine float-summation drift can never reach a
    * comparison gate downstream. Scale shape: the centroid aggregation
    * is one posexplode pass reduced to (labels × dims) rows —
    * map-side partial aggregation bounds the shuffle by that
    * cardinality, not the corpus — and the per-row cosine joins the
    * tiny centroid table back via broadcast. Output: (vec_id, label,
    * cos). */
  def centroidCosine(embs: DataFrame): DataFrame = {
    val p = prepared(embs)
    val cent = p
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 6).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"),
        transform(col("pc"), e => e.getField("c")).as("centroid"))
      .withColumn("cnrm", l2Norm(col("centroid")))
    p.join(broadcast(cent), Seq("label"))
      .select(col("vec_id"), col("label"),
        (dot(col("v"), col("centroid")) / (col("nrm") * col("cnrm"))).as("cos"))
  }

  /** [[centroidCosine]] with the centroid table collapsed to LITERAL
    * maps (r8, the q85 decomposition): the (label, pos) centroid rows
    * collect once to the driver — bounded by labels × dims, a
    * categorical label set's contract (the IVF-centroid k-row collect
    * precedent) — and scoring becomes a single scan-and-project job
    * with zero joins: `element_at` on a map literal replaces the
    * broadcast attach, so the centroid-agg exchanges, the broadcast
    * build, and their stage launches all leave the per-call path.
    * Values are identical to [[centroidCosine]]: same 6-dp-rounded
    * centroids (the round exists exactly so summation ORDER — engine,
    * partitioning, or driver — cannot reach a gate), same
    * left-to-right norm/dot accumulation driver-side as
    * [[graft.plans.VectorOps]] generates. Differential in
    * SimilaritySpec. */
  def centroidCosineLitmap(embs: DataFrame): DataFrame = {
    val rows = embs
      .select(col("label"),
        posexplode(transform(col("embedding"), x => x.cast("double")))
          .as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x")), 6).as("c"))
      .collect()
    val cents: Seq[(Int, Seq[Double])] = rows
      .groupBy(_.getInt(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      .toSeq.sortBy(_._1)
    def nrmOf(c: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      math.sqrt(acc)
    }
    // empty corpus: map() types as map<void,void>; cast keeps the
    // projection resolvable (zero rows flow through it anyway)
    val centMap =
      if (cents.isEmpty) map().cast("map<int,array<double>>")
      else map(cents.flatMap { case (l, c) => Seq(lit(l), typedLit(c)) }: _*)
    val nrmMap =
      if (cents.isEmpty) map().cast("map<int,double>")
      else map(cents.flatMap { case (l, c) => Seq(lit(l), lit(nrmOf(c))) }: _*)
    prepared(embs).select(col("vec_id"), col("label"),
      (dot(col("v"), element_at(centMap, col("label"))) /
        (col("nrm") * element_at(nrmMap, col("label")))).as("cos"))
  }

  /** Brute-force cosine top-k: every query row against every candidate
    * row. The candidate side is broadcast when small; at scale this is
    * the quality baseline you sample, not the serving path. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Axis-hyperplane sign bucket over the first `bits` dimensions: a
    * crude but deterministic LSH family (random-hyperplane LSH with
    * fixed basis vectors). */
  def signBucket(v: Column, bits: Int): Column =
    concat((0 until bits).map(i =>
      when(element_at(v, i + 1) >= 0, "1").otherwise("0")): _*)

  /** LSH-bucketed ANN: queries only score candidates in their own sign
    * bucket. Recall < 1 by construction; the scale win is that the join
    * is an equi-join on the bucket key (shuffle-partitionable) instead
    * of a cross join. */
  def lshTopK(embs: DataFrame, queryIds: Column => Column, k: Int, bits: Int): DataFrame = {
    val p = prepared(embs).withColumn("bucket", signBucket(col("v"), bits))
    val q = p.filter(queryIds(col("vec_id")))
      .select(col("bucket"), col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = p.select(col("bucket"), col("vec_id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn"))
    // build-side pick per Ivf.probeShaped (r11): past the broadcast
    // threshold the candidate side would otherwise shuffle on the
    // bucket key — parallelism capped at 2^bits — so the contract-
    // small query side broadcasts and candidates stream at full width
    val scored = Ivf.probeShaped(q, c, key = "bucket")
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 6).desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine >=
    * threshold). Uses sign-bucket blocking when `bucketBits > 0`
    * (scale path), or all-pairs when 0 (exact baseline). */
  def cosineNearDupPairs(embs: DataFrame, threshold: Double, bucketBits: Int = 0): DataFrame = {
    val p = prepared(embs)
    val joined =
      if (bucketBits > 0) {
        // Scale path: equi-join on the bucket key. The plain form
        // collapses parallelism to 2^bits partitions (a self-join's
        // exchange clusters on the bucket key — 16 buckets cap a
        // 32-core box at half width, and a 1000-executor cluster at
        // 1.6%), so the join is SHAPED like Ivf.probeShaped (r12,
        // AbBench q53_cur/bcast/salted at sf1: 1.88/1.15/1.44 s min):
        //  - corpus under the broadcast threshold: broadcast the build
        //    side and round-robin the stream side to full width — the
        //    Σ|bucket|² scoring rides cluster-wide partitions with no
        //    keyed exchange at all;
        //  - past the threshold: salt the key — stream rows take
        //    hash(vec_id)%S, build rows replicate ×S — multiplying
        //    join parallelism to 2^bits·S for S× build-row (not pair)
        //    duplication. Each qualifying pair still meets exactly
        //    once (one matching (bucket, salt) replica), so output is
        //    bit-identical either way.
        val pb = p.withColumn("bucket", signBucket(col("v"), bucketBits))
        val a = pb.select(col("bucket"), col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
        val b = pb.select(col("bucket"), col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
        shapedSelfJoin(a, b, "bucket", 1 << bucketBits, "vec_a")
      } else {
        // Exact baseline: broadcast-nested-loop cross join — every
        // partition streams against the broadcast side, keeping all
        // cores busy (a constant-key equi-join would shuffle the whole
        // pair space onto one partition).
        val a = p.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
        val b = p.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
        a.crossJoin(broadcast(b))
      }
    joined
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(round(col("cos"), 6) >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
  }

  /** Self-join on a LOW-cardinality blocking key without the
    * parallelism collapse (r12, AbBench q53 at sf1: plain 1.88 s /
    * broadcast 1.15 / salted 1.44 min): a keyed exchange on 2^bits
    * buckets or k cells caps the Σ|block|² scoring at the KEY COUNT
    * of partitions — half a 32-core box, 1.6% of a 1000-executor
    * cluster. Under the broadcast threshold (plan-stats decided, the
    * Ivf.probeShaped idiom) the build side broadcasts and the stream
    * side round-robins to full width — no keyed exchange at all; past
    * it the key is SALTED: stream rows take hash(id)%S, build rows
    * replicate ×S, multiplying parallelism to keyCard·S for S× build
    * ROW (not pair) duplication. Each qualifying pair still meets
    * exactly once — one matching (key, salt) replica — so output is
    * bit-identical on either path. */
  private def shapedSelfJoin(left: DataFrame, right: DataFrame,
      key: String, keyCard: Int, leftIdCol: String): DataFrame = {
    val spark = left.sparkSession
    val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    val bytes = right.queryExecution.optimizedPlan.stats.sizeInBytes
    val width = spark.sparkContext.defaultParallelism
    if (thr >= 0 && bytes <= BigInt(thr))
      left.repartition(width).join(broadcast(right), Seq(key))
    else {
      val s = math.max(1, 4 * width / math.max(1, keyCard))
      left.withColumn("__salt", pmod(hash(col(leftIdCol)), lit(s)))
        .join(right.withColumn("__salt",
          explode(sequence(lit(0), lit(s - 1)))), Seq(key, "__salt"))
        .drop("__salt")
    }
  }

  /** SemDeDup-style semantic deduplication (the published recipe:
    * k-means-cluster the embeddings, then prune high-cosine pairs
    * WITHIN each cluster — clustering bounds the candidate sets so the
    * corpus is never all-pairs). Per vector: assign to its nearest of
    * `cells` centroids (deterministic first-k init when iters = 0 —
    * the q54 oracle-able contract), then DROP it if some same-cell
    * neighbor with cosine ≥ `threshold` is better — closer to the
    * shared centroid, ties to the lower vec_id. The keep rule is
    * local (pairwise, not transitive-closure), so it is one self-join
    * plus an aggregation — the transitive variant is
    * [[DedupClusters.assign]] over the emitted pairs.
    *
    * Returns (vec_id, cell_id, keep 1/0) for every input vector.
    * Scale shape: the self-join keys on cell_id, so candidate volume
    * is Σ|cell|² not n² — the published method's point; the d2 and
    * cosine folds are the sequential [[graft.plans.VectorOps]]
    * expressions, bit-identical to the DuckDB oracle's
    * list_dot_product (the q54 precedent). */
  def semanticDedup(embs: DataFrame, cells: Int, threshold: Double,
      iters: Int = 0): DataFrame = {
    // No persist: the centroids collect to literals below, and the
    // only repeated work without a cache is the map-only prepared()
    // projection in the two self-join branches (the
    // cosineNearDupPairs precedent). A corpus-sized persist with no
    // unpersist path would pin storage for the result's lifetime
    // (r11 review finding).
    val p = prepared(embs)
    val cents = Ivf.centroidArray(Ivf.train(p, cells, iters))
    val assigned = p
      .withColumn("best", element_at(Ivf.rankedCells(cents, col("v")), 1))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("best").getField("cell_id").as("cell_id"),
        col("best").getField("d2").as("d2"))
    val other = assigned.select(col("cell_id"),
      col("vec_id").as("o_id"), col("v").as("ov"),
      col("nrm").as("on"), col("d2").as("od2"))
    // shapedSelfJoin (r12): k cells would otherwise cap the within-
    // cell pair scoring at k partitions — see the helper's scaladoc
    val dropped = shapedSelfJoin(assigned, other, "cell_id", cells, "vec_id")
      .filter(col("vec_id") =!= col("o_id"))
      .withColumn("cos", dot(col("v"), col("ov")) / (col("nrm") * col("on")))
      .filter(round(col("cos"), 6) >= threshold)
      .filter(col("od2") < col("d2") ||
        (col("od2") === col("d2") && col("o_id") < col("vec_id")))
      .select(col("vec_id")).distinct()
      .withColumn("is_dropped", lit(1L))
    assigned.select(col("vec_id"), col("cell_id"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id").cast("int").as("cell_id"),
        when(col("is_dropped").isNull, 1L).otherwise(0L).as("keep"))
  }
}
