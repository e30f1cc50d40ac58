package graft.ml

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** Benchmark decontamination at 100 TB: the exact inverted-index join
  * (q64) shuffles EVERY train gram to meet the eval grams — correct,
  * but the shuffle payload is the whole training corpus's gram stream
  * even though >99.9% of it can't possibly match. This variant
  * bloom-screens the train side first:
  *
  *  1. build a Bloom filter over the eval set's distinct gram keys —
  *     a distributed aggregation (partial filters per partition,
  *     OR-merged), eval sets are benchmark-sized so the resulting
  *     bitset is a few MB;
  *  2. broadcast the filter bytes as a literal into a per-row
  *     `might_contain` predicate on the train gram stream — a pure
  *     map-side filter, ZERO shuffle of the train side, that passes
  *     only true matches plus an fpp-bounded trickle of false
  *     positives;
  *  3. the exact join then runs only on the screened remnant, so its
  *     result is IDENTICAL to the exact path (Bloom filters have no
  *     false negatives; the join discards the false positives).
  *
  * This is the standard big-data semi-join reduction (Spark's own
  * InjectRuntimeFilter applies the same construction automatically to
  * selective equi-joins; here it is explicit because the "join" is a
  * gram-level containment screen, not a row join the optimizer can
  * see). The screen reuses Spark's native sketch machinery —
  * `DataFrameStatFunctions.bloomFilter` to build,
  * `BloomFilterMightContain` (the runtime-filter predicate expression)
  * to probe — so the hot path stays inside whole-stage codegen; no row
  * UDF, no closure.
  *
  * Differential contract (DecontaminateSpec): output equals the exact
  * inverted-index decontamination verbatim on any corpus/fpp.
  */
object Decontaminate {

  /** Serialized Bloom filter over the DISTINCT values of `keyCol`
    * (LongType) in `keys`. Built distributed (per-partition partials,
    * merged), returned as the `BloomFilter.writeTo` byte image that
    * [[mightContain]] probes. */
  def bloomOf(keys: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    // stat.bloomFilter NPEs on an empty input (its internal aggregate
    // yields null); an empty eval set legitimately means "nothing is
    // contaminated", so hand back an empty filter that rejects all.
    // expectedItems is clamped to 1: the natural sizing for an empty
    // set is 0, and BloomFilter.create requires a positive count —
    // the guard added for emptiness must not itself throw on it.
    val n = math.max(1L, expectedItems)
    val bf =
      if (keys.isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(n, fpp)
      else keys.stat.bloomFilter(keyCol, n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  private val info = new ExpressionInfo(
    classOf[BloomFilterMightContain].getName, null, "bloom_might_contain",
    "_FUNC_(bloom, value) - true if the serialized bloom filter might contain the long value.",
    "", "", "", "predicate_funcs", "1.0.0", "", "built-in")

  private def builder(args: Seq[Expression]): BloomFilterMightContain = args match {
    case Seq(b, v) => BloomFilterMightContain(b, v)
    case _ => throw new IllegalArgumentException(
      s"bloom_might_contain takes 2 arguments, got ${args.length}")
  }

  /** `might_contain(bloom, value)` over a LongType key column. The
    * filter bytes travel as a foldable binary literal (required by the
    * expression's constant-bloom contract) — i.e. broadcast once per
    * task via the serialized plan, deserialized once per partition.
    * Registered through the function registry, the supported
    * Column↔Expression bridge in Spark 4 (see plans.BitHamming). */
  def mightContain(bloom: Array[Byte], value: Column): Column = {
    SparkSession.active.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("bloom_might_contain"), info, builder _)
    call_udf("bloom_might_contain", lit(bloom), value)
  }

  /** Bloom-screened decontamination, differentially identical to the
    * exact form: per train doc, the count of distinct n-gram keys (and
    * distinct eval docs) it shares with the eval set.
    *
    * `isEval` marks eval-set membership. `expectedEvalGrams` sizes the
    * filter (overestimate freely — bits are cheap; underestimating
    * degrades fpp, never correctness). */
  def screened(docs: DataFrame, isEval: Column, n: Int,
      expectedEvalGrams: Long, fpp: Double = 0.01): DataFrame = {
    val sh = TextDedup.shingleKeyTable(docs, n)
      .join(docs.select(col("doc_id"), isEval.as("is_eval")), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val evalSh = sh.filter(col("is_eval"))
      .select(col("shingle"), col("doc_id").as("eval_id"))
    val bloom = bloomOf(evalSh.select(col("shingle")).distinct(), "shingle",
      expectedEvalGrams, fpp)
    // The screen: map-side, codegen'd, no shuffle. Only grams the
    // bloom admits (true hits + fpp trickle) reach the exact join.
    val screenedTrain = sh.filter(!col("is_eval"))
      .select(col("shingle"), col("doc_id").as("train_id"))
      .filter(mightContain(bloom, col("shingle")))
    screenedTrain.join(evalSh, Seq("shingle"))
      .groupBy(col("train_id"))
      .agg(countDistinct(col("shingle")).as("shared_grams"),
        countDistinct(col("eval_id")).as("eval_docs"))
  }

  /** Precomputed eval side for continuous ingestion: the serialized
    * Bloom filter plus the exact gram table it screens for. Built ONCE
    * from the eval/benchmark set; every arriving batch probes it.
    * `grams` is benchmark-sized — persist it (or let AQE broadcast it
    * into each batch's verify join). */
  final case class EvalIndex(bloom: Array[Byte], grams: DataFrame)

  def indexEval(evalDocs: DataFrame, n: Int, expectedGrams: Long,
      fpp: Double = 0.01): EvalIndex = {
    val grams = TextDedup.shingleKeyTable(evalDocs, n)
      .select(col("shingle"), col("doc_id").as("eval_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    EvalIndex(bloomOf(grams.select(col("shingle")).distinct(), "shingle",
      expectedGrams, fpp), grams)
  }

  /** Screen ONE batch of arriving documents (doc_id, text) against a
    * prebuilt [[EvalIndex]] — [[screened]]'s tail without rebuilding
    * the eval side: per-row gram keys, map-side bloom screen, exact
    * join on the admitted remnant. Output (doc_id, shared_grams,
    * eval_docs); clean documents produce no row. Usable directly on a
    * static frame or inside foreachBatch. */
  def screenBatch(newDocs: DataFrame, index: EvalIndex, n: Int): DataFrame =
    TextDedup.shingleKeyTable(newDocs, n)
      .filter(mightContain(index.bloom, col("shingle")))
      .join(index.grams, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("shingle")).as("shared_grams"),
        countDistinct(col("eval_id")).as("eval_docs"))

  /** Wire a streaming documents frame (doc_id, text) through
    * [[screenBatch]]; `onFlagged(batchId, flagged)` receives each
    * micro-batch's contaminated documents. The screen is stateless
    * (per-row predicate + stream-static join within the batch), so
    * state never accumulates across batches — a pipeline can run this
    * on its ingest stream indefinitely. */
  def runStream(stream: DataFrame, index: EvalIndex, n: Int)(
      onFlagged: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        onFlagged(batchId, screenBatch(batch, index, n))
      }
      .start()

  /** The exact inverted-index form (q64's shape) over the same inputs —
    * the differential oracle for [[screened]]. */
  def exact(docs: DataFrame, isEval: Column, n: Int): DataFrame = {
    val sh = TextDedup.shingleKeyTable(docs, n)
      .join(docs.select(col("doc_id"), isEval.as("is_eval")), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.filter(!col("is_eval"))
      .select(col("shingle"), col("doc_id").as("train_id"))
      .join(sh.filter(col("is_eval"))
        .select(col("shingle"), col("doc_id").as("eval_id")), Seq("shingle"))
      .groupBy(col("train_id"))
      .agg(countDistinct(col("shingle")).as("shared_grams"),
        countDistinct(col("eval_id")).as("eval_docs"))
  }
}
