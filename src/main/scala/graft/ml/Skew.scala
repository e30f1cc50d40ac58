package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (hot fingerprints, boilerplate shingles, celebrity users). AQE's
  * skew-join handles sort-merge cases at runtime; this utility is for
  * the planned form — salting — when a key is so hot one task would
  * otherwise process most of the data.
  *
  * `saltedJoin(bigLeft, smallRight, key, salts)`: the big side gets a
  * deterministic per-row salt in [0, salts); the small side is exploded
  * `salts`× so every (key, salt) pair finds its match. Equi-join on
  * (key, salt) spreads each hot key over `salts` tasks. Correctness is
  * unchanged (inner/left joins on equi keys); cost is `salts`× the
  * small side, which is why the small side must be the replicated one.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Salt from row position, not content (same rationale as
    // saltedCountSum below): the hot-key pathology is millions of
    // IDENTICAL rows, which a content hash would funnel into ONE salt
    // bucket — recreating the skew the salt exists to break.
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-stage (salted) count+sum aggregation for pathologically
    * low-cardinality keys. A plain groupBy on a 3-value key hashes the
    * whole table onto 3 reducers; salting first aggregates on
    * (key, salt) — `salts`× the reducers, each seeing ~1/salts of the
    * hot key — then combines the partials with a second, tiny groupBy.
    * Exact for algebraic aggregates (count/sum/min/max); this helper
    * does count + sum, the common pair. Note Spark's map-side partial
    * aggregation already mitigates this shape when upstream
    * partitioning is uniform; explicit salting is for when it isn't
    * (e.g. the table arrives clustered by the hot key). */
  def saltedCountSum(df: DataFrame, key: String, value: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Salt from the row's position, NOT its content: the canonical
    // hot-key scenario is millions of IDENTICAL rows, and a
    // content-derived salt would put all of them in one bucket,
    // defeating the whole construction. Per-row ids spread uniformly;
    // if a lost partition is recomputed its rows may land in different
    // salt buckets, which is fine — each row is still aggregated
    // exactly once and the final combine is salt-agnostic.
    val partial = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(value)).as("__sum"))
    partial.groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__sum")).as("total"))
  }

  /** Projected reducer loads: rows per shuffle bucket if `df` were
    * hash-partitioned on `keys` into `parts` reducers — the same
    * murmur3 key hash Spark's HashPartitioning applies. This is the
    * planning diagnostic behind [[saltedJoin]]: compare the max load
    * on (key) vs (key, salt) to see what salting buys BEFORE running
    * the join (task wall time is proportional to reducer records at
    * fixed per-record work, and unlike measured task times this is
    * deterministic — no machine noise, no AQE coalescing of the
    * test-scale partitions). */
  def reducerLoads(df: DataFrame, keys: Seq[String], parts: Int): DataFrame = {
    require(parts > 0, "parts must be positive")
    df.groupBy(pmod(hash(keys.map(col): _*), lit(parts)).as("bucket"))
      .agg(count(lit(1)).as("rows"))
  }

  /** Key histogram — find the keys that need salting (or filtering):
    * top `n` keys by row count with their share of the table. */
  def hotKeys(df: DataFrame, key: String, n: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
      .withColumn("share", round(col("rows") / lit(total.toDouble), 4))
      .orderBy(col("rows").desc)
      .limit(n)
  }
}
