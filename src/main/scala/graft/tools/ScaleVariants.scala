package graft.tools

import org.apache.spark.sql.SparkSession

/** Parameter-variant timings for the SCALING.md scale experiments —
  * operator configurations that are NOT part of the oracle-gated
  * SparkEntry surface (those run through graft.Bench) but demonstrate
  * how an operator's tuning knob must move with corpus size.
  *
  * Currently: q53's sign-LSH blocking at increasing `bucketBits`. A
  * FIXED bit width means a fixed bucket count, so per-bucket pair
  * expansion grows quadratically with the corpus — the 10× run shows
  * exactly that (6.7× wall time for 10× rows at bits=4). Growing bits
  * with log2(corpus) keeps expected per-bucket occupancy constant and
  * restores ~linear scaling; the recall cost per extra bit is the
  * standard SRP-LSH trade (a cos≈0.99 pair agrees on an axis sign with
  * p≈0.97, so 8 bits keep ~0.78 of near-dup pairs per band — banding /
  * multi-probe recovers the rest at constant extra cost; see
  * SCALING.md).
  *
  * The same experiment exists for q34 (simhash pairs): a FIXED
  * `prefixBits` is a fixed bucket count, so per-bucket pair expansion
  * grows with (n/2^bits)²; growing bits with log2(corpus) keeps
  * occupancy flat. The recall trade per added prefix bit is the same
  * SRP argument (prefix agreement is band agreement).
  *
  * Usage: runMain graft.tools.ScaleVariants <sfDir> [bitsCsv] [simhashBitsCsv]
  * Prints one JSON line: {"sf":..., "q53_bits4":sec, ..., "q34_prefix8":sec, ...}
  */
object ScaleVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // non-numeric tokens (e.g. "none") skip a family entirely
    def bits(i: Int, dflt: String) =
      (if (args.length > i) args(i) else dflt)
        .split(",").toSeq.map(_.trim).filter(_.matches("\\d+")).map(_.toInt)
    val bitsList = bits(1, "4,8,10")
    val simhashBits = bits(2, "")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val embs = graft.Tables.t(spark, sfDir, "embeddings")
    // untimed warmup (codegen + scan)
    try { embs.count(); () } catch { case _: Throwable => }
    val results = bitsList.map { bits =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.ml.Similarity.cosineNearDupPairs(embs, threshold = 0.45,
          bucketBits = bits).count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = math.min(once(), once())
      spark.catalog.clearCache()
      s""""q53_bits$bits":${math.rint(best * 1e4) / 1e4}"""
    }
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val simResults = simhashBits.map { bits =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.ml.TextDedup.simhashPairs(docs, prefixBits = bits, maxHamming = 8)
          .count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = math.min(once(), once())
      spark.catalog.clearCache()
      s""""q34_prefix$bits":${math.rint(best * 1e4) / 1e4}"""
    }
    println(s"""{"sf":"$sfDir",${(results ++ simResults).mkString(",")}}""")
    spark.stop()
  }
}
