package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-project parquet root scan (S2, SURVEY.md §2.1; reference
  * query.py:616-667): one DataFrame over many stores laid out as
  * `root/hostname=H/namespace=N/project=P/<table>/date=.../...`.
  * The table-name path segment between `project=` and `date=` breaks
  * Spark's hive partition inference, so the scan is an explicit union
  * of per-project reads with the path fields as literal columns — a
  * filter like `project = 'alpha'` constant-folds to false on every
  * other branch and Catalyst prunes those scans entirely, which is the
  * same pruning the hive layout would give.
  */
object MultiProjectStore {

  private def projectDirs(spark: SparkSession, root: String): Seq[(String, String, String, String)] = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def kids(p: org.apache.hadoop.fs.Path, prefix: String) =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath).filter(_.getName.startsWith(prefix))
    for {
      h <- kids(new org.apache.hadoop.fs.Path(root), "hostname=")
      n <- kids(h, "namespace=")
      p <- kids(n, "project=")
    } yield (h.getName.stripPrefix("hostname="),
      n.getName.stripPrefix("namespace="),
      p.getName.stripPrefix("project="), p.toString)
  }

  /** Read `table` across every project under `root`, with
    * hostname/namespace/project attached as columns. */
  def readAll(spark: SparkSession, root: String, table: String): DataFrame = {
    val parts = projectDirs(spark, root).flatMap { case (h, n, p, dir) =>
      val path = new org.apache.hadoop.fs.Path(s"$dir/$table")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) None
      else Some(spark.read.option("mergeSchema", "true").parquet(path.toString)
        .withColumn("hostname", lit(h))
        .withColumn("namespace", lit(n))
        .withColumn("project", lit(p)))
    }
    require(parts.nonEmpty, s"no $table tables under $root")
    parts.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Per-project event counts — the reference's cross-project summary
    * shape. */
  def projectSummary(spark: SparkSession, root: String): DataFrame =
    readAll(spark, root, "events")
      .groupBy(col("hostname"), col("namespace"), col("project"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("severity") === "error", 1)).as("errors"))
      .orderBy(col("hostname"), col("namespace"), col("project"))

  /** An EventStore view of one project under a multi-project root. */
  def project(spark: SparkSession, root: String, hostname: String,
      namespace: String, proj: String): EventStore =
    new EventStore(spark,
      s"$root/hostname=$hostname/namespace=$namespace/project=$proj")
}
