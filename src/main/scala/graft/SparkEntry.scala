package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named
  * query over the TESTDATA tables, with a DuckDB oracle for the driver's
  * differential correctness gate. Query implementations live in
  * [[graft.queries]]; engine library code in graft.{model,store,parse,
  * api,functions,analytics,ml,streaming}.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The J1 flat-view join chain with broadcast dimensions. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ScalarQueries.queries ++ PipelineQueries.queries ++
      WindowQueries.queries ++ CorpusQueries.queries ++ CorpusQueries.queries2 ++
      RunnerQueries.queries ++ ShapeQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ ScalarQueries.oracles ++ PipelineQueries.oracles ++
      WindowQueries.oracles ++ CorpusQueries.oracles ++ RunnerQueries.oracles ++
      ShapeQueries.oracles
}
