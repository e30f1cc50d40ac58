package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q115 (Dsir.hashedBigramWeights): where does the
  * gap between the 0.2 s component sum and the measured full-call
  * time live? */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    docs.count()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (rep <- 1 to 3) {
      t(s"rep$rep full")(
        graft.ml.Dsir.hashedBigramWeights(docs, col("lang") === "en", 256).count())
      spark.catalog.clearCache()
      // instance-form phase isolates (the shipped r11 shape)
      val toksI = split(col("text"), " ")
      val gramsI = slice(
        zip_with(toksI, slice(concat(toksI, array(lit(null).cast("string"))),
          lit(2), size(toksI)),
          (a, b) => concat_ws(" ", a, b)),
        lit(1), size(toksI) - 1)
      val inst = docs
        .select(col("doc_id"), (col("lang") === "en").as("is_t"), gramsI.as("grams"))
        .filter(size(col("grams")) >= 1)
        .select(col("doc_id"), col("is_t"), explode(col("grams")).as("gram"))
        .select(col("doc_id"), col("is_t"),
          (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 256).as("f"))
      var istats: Array[(Long, Long, Long)] = null
      t(s"rep$rep inst_stats") {
        istats = inst.groupBy(col("f"))
          .agg(count(lit(1)).as("ns"),
            sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      val ist = istats.map(_._2).sum.toDouble
      val itt = istats.map(_._3).sum.toDouble
      val ibyF = istats.map(x => x._1 -> x).toMap
      val ilrArr = array((0 until 256).map { f =>
        val (ns, nt) = ibyF.get(f.toLong).map(x => (x._2, x._3)).getOrElse((0L, 0L))
        lit(math.log((nt + 1) / (itt + 256)) - math.log((ns + 1) / (ist + 256)))
      }: _*)
      t(s"rep$rep inst_score")(
        inst.groupBy(col("doc_id"))
          .agg(round(sum(element_at(ilrArr, col("f").cast("int") + 1)), 4).as("logw"))
          .count())
      // in-pass cost split: same groupBy(f) but f without md5 —
      // isolates the hash cost from explode+shuffle
      t(s"rep$rep inst_stats_nomd5")(
        docs.select(col("doc_id"), (col("lang") === "en").as("is_t"), gramsI.as("grams"))
          .filter(size(col("grams")) >= 1)
          .select(col("doc_id"), col("is_t"), explode(col("grams")).as("gram"))
          .select(col("doc_id"), col("is_t"), (length(col("gram")) % 256).as("f"))
          .groupBy(col("f"))
          .agg(count(lit(1)).as("ns"),
            sum(when(col("is_t"), 1L).otherwise(0L)).as("nt"))
          .collect())
      // phase isolates
      val toks = split(col("text"), " ")
      val grams = slice(
        zip_with(toks, slice(concat(toks, array(lit(null).cast("string"))),
          lit(2), size(toks)),
          (a, b) => concat_ws(" ", a, b)),
        lit(1), size(toks) - 1)
      val feats = docs
        .select(col("doc_id"), (col("lang") === "en").as("is_t"), grams.as("grams"))
        .filter(size(col("grams")) >= 1)
        .select(col("doc_id"), col("is_t"), explode(col("grams")).as("gram"))
        .select(col("doc_id"), col("is_t"),
          (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 256).as("f"))
        .groupBy(col("doc_id"), col("is_t"), col("f"))
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var stats: Array[(Long, Long, Long)] = null
      t(s"rep$rep stats_collect") {
        stats = feats.groupBy(col("f"))
          .agg(sum(col("tf")).as("ns"),
            sum(when(col("is_t"), col("tf")).otherwise(0L)).as("nt"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      }
      val st = stats.map(_._2).sum.toDouble
      val tt = stats.map(_._3).sum.toDouble
      val lrMap = map(stats.flatMap { case (f, ns, nt) =>
        Seq(lit(f), lit(math.log((nt + 1) / (tt + 256)) -
          math.log((ns + 1) / (st + 256))))
      }.toSeq: _*)
      t(s"rep$rep score_warm")(
        feats.groupBy(col("doc_id"))
          .agg(round(sum(col("tf") * element_at(lrMap, col("f"))), 4).as("logw"))
          .count())
      // dense array literal: O(1) positional lookup vs the map's O(n)
      val byF = stats.map(s => s._1 -> s).toMap
      val lrArr = array((0 until 256).map { f =>
        val (ns, nt) = byF.get(f.toLong).map(s => (s._2, s._3)).getOrElse((0L, 0L))
        lit(math.log((nt + 1) / (tt + 256)) - math.log((ns + 1) / (st + 256)))
      }: _*)
      t(s"rep$rep score_warm_arr")(
        feats.groupBy(col("doc_id"))
          .agg(round(sum(col("tf") * element_at(lrArr, col("f").cast("int") + 1)), 4)
            .as("logw"))
          .count())
      feats.unpersist(false)
      spark.catalog.clearCache()
      // persist-cost isolates
      val featsNoP = docs
        .select(col("doc_id"), (col("lang") === "en").as("is_t"), grams.as("grams"))
        .filter(size(col("grams")) >= 1)
        .select(col("doc_id"), col("is_t"), explode(col("grams")).as("gram"))
        .select(col("doc_id"), col("is_t"),
          (conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long") % 256).as("f"))
        .groupBy(col("doc_id"), col("is_t"), col("f"))
        .agg(count(lit(1)).as("tf"))
      t(s"rep$rep stats_nopersist")(
        featsNoP.groupBy(col("f"))
          .agg(sum(col("tf")).as("ns"),
            sum(when(col("is_t"), col("tf")).otherwise(0L)).as("nt"))
          .collect())
      val fp = featsNoP.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t(s"rep$rep persist_count")(fp.count())
      t(s"rep$rep stats_warm")(
        fp.groupBy(col("f"))
          .agg(sum(col("tf")).as("ns"),
            sum(when(col("is_t"), col("tf")).otherwise(0L)).as("nt"))
          .collect())
      fp.unpersist(false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
