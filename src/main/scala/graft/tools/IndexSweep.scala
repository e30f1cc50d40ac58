package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Growth sweeps for the two STORED indexes (SCALING.md r8): how
  * build, incremental-append, and probe costs move as the corpus (or
  * the probe batch) grows — the evidence behind the 100 TB
  * amortization claims in ml/LexIndex and ml/BandIndex scaladoc.
  *
  * Per run (one scale dir):
  *  - `lex_build_full`: LexIndex from-scratch build over all docs.
  *  - `lex_build_90`: build over the 90% seed (doc_id % 10 != 0).
  *  - `lex_append_10`: appendBatch of the remaining 10% into the seed
  *    index — the daily-ingest shape; compare against lex_build_full
  *    (what a fingerprint-drift rebuild used to cost at that scale).
  *  - `lex_probe_cold` / `lex_probe_warm`: first probeIndexed call
  *    (pays the one-time query-set collect) vs the cached path.
  *  - `band_write`: bucketed band-table write over the 90% corpus
  *    (grows with scale).
  *  - `band_probe_fixed_batch`: probe a FIXED ~500-doc batch against
  *    that growing index — the "index grows, batch stays daily-sized"
  *    axis.
  *  - `band_probe_grow_batch`: probe the scale's full 10% batch
  *    (grows with corpus) against a FIXED scale1-sized index
  *    (doc_id < 5000) — the "burst ingest" axis.
  *
  * Usage: runMain graft.tools.IndexSweep <sfDir> <label>
  * Prints one JSON line. Batches/corpora split on doc_id arithmetic so
  * every scale dir (ScaleGen ids are dense from 0) slices identically.
  */
object IndexSweep {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def min2(f: => Unit): Double = math.min(time(f), time(f))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val label = if (args.length > 1) args(1) else "x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ml.{BandIndex, LexIndex}

    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count() // warmup: scan + codegen

    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    // a previous sweep's managed-table dirs survive in spark-warehouse
    // but not in this session's in-memory catalog, and saveAsTable
    // (even Overwrite) refuses a location the catalog doesn't own —
    // clear both before writing
    def fresh(table: String): String = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table)
      wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(wh, true)
      table
    }
    val r = collection.mutable.LinkedHashMap[String, Double]()

    // --- LexIndex ---
    val fullDir = tmp("sweep_lex_full")
    r("lex_build_full") = time(LexIndex.build(docs, fullDir))
    val seed = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val seedDir = tmp("sweep_lex_seed")
    r("lex_build_90") = time(LexIndex.build(seed, seedDir))
    r("lex_append_10") = time(LexIndex.appendBatch(spark, seedDir, batch))
    r("lex_probe_cold") = time(
      LexIndex.probeIndexed(spark, fullDir, col("doc_id") < 5, 5).count())
    r("lex_probe_warm") = min2(
      LexIndex.probeIndexed(spark, fullDir, col("doc_id") < 5, 5).count())

    // --- BandIndex: growing index, fixed ~500-doc batch ---
    val batchFixed = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") < 5000)
    val growTable = fresh(s"sweep_band_grow_$label")
    fresh(BandIndex.keysTable(growTable))
    r("band_write") = time(
      BandIndex.write(seed, growTable, n = 3, k = 12, bands = 4, buckets = 16))
    r("band_probe_fixed_batch") = min2(
      BandIndex.probe(spark, growTable, batchFixed,
        n = 3, k = 12, bands = 4, threshold = 0.3).count())

    // --- BandIndex: fixed scale1-sized index, growing batch ---
    val corpusFixed = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") < 5000)
    val fixedTable = fresh(s"sweep_band_fixed_$label")
    fresh(BandIndex.keysTable(fixedTable))
    BandIndex.write(corpusFixed, fixedTable, n = 3, k = 12, bands = 4,
      buckets = 16) // untimed: identical at every scale
    r("band_probe_grow_batch") = min2(
      BandIndex.probe(spark, fixedTable, batch,
        n = 3, k = 12, bands = 4, threshold = 0.3).count())

    // --- IvfIndex (r10): 90% corpus written, 10% appended, fixed
    // 5-query probe against the grown index — float and int8 payloads
    val vecs = graft.Tables.t(spark, sfDir, "embeddings")
    val vseed = vecs.filter(col("vec_id") % 10 =!= 0)
    val vbatch = vecs.filter(col("vec_id") % 10 === 0)
    val vprobe = vecs.filter(col("vec_id") % 10 === 1 && col("vec_id") < 50)
    val ivfT = fresh(s"sweep_ivf_$label"); fresh(s"sweep_ivf_${label}_centroids")
    fresh(s"sweep_ivf_${label}_stats")
    r("ivf_write") = time(
      graft.ml.IvfIndex.write(vseed, ivfT, cells = 16, iters = 2, buckets = 8))
    r("ivf_append_10") = time(graft.ml.IvfIndex.append(spark, ivfT, vbatch))
    r("ivf_probe") = min2(
      graft.ml.IvfIndex.probe(spark, ivfT, vprobe, k = 5, nprobe = 3).count())
    val ivfQ = fresh(s"sweep_ivfq_$label"); fresh(s"sweep_ivfq_${label}_centroids")
    fresh(s"sweep_ivfq_${label}_stats")
    graft.ml.IvfIndex.write(vseed, ivfQ, cells = 16, iters = 2, buckets = 8,
      quantized = true) // untimed: write cost ≈ float's + one map stage
    r("ivf_probe_int8") = min2(
      graft.ml.IvfIndex.probe(spark, ivfQ, vprobe, k = 5, nprobe = 3).count())

    val parts = r.map { case (k, v) =>
      s""""$k":${math.rint(v * 1e4) / 1e4}""" }.mkString(",")
    println(s"""{"sf":"$sfDir","label":"$label",$parts}""")
    spark.stop()
  }
}
