package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation rules over a table — the admission
  * gate a 100 TB training pipeline runs BEFORE the expensive stages
  * (dedup, decontamination, indexing) so malformed ingest batches are
  * quarantined by report instead of silently polluting the corpus.
  * Reference behavior frame: blq-cli validates every parsed event
  * against its typed schema at insert time (src/blq/schema.py's typed
  * event model + the parser registry's per-format contracts); this
  * generalizes that per-row admission check to declarative,
  * corpus-scale rule suites with a violation REPORT as the output.
  *
  * Scale design — the evaluation cost model is the point:
  *
  *  - ROW-LOCAL rules (not-null, range, accepted-set, regex) all
  *    FUSE into ONE aggregate pass: each rule is a
  *    `sum(when(violated, 1))` column in a single global aggregate,
  *    so a 40-rule suite over 100 TB costs exactly one scan with
  *    map-side partials and a 1-row combine — no shuffle of data
  *    rows, no per-rule jobs. Adding a rule adds a codegen'd
  *    expression, not a pass.
  *  - UNIQUE rules need key cardinality: one `groupBy(keys)` each —
  *    the unavoidable shuffle is bounded by the distinct-key count,
  *    and excess = n_rows − n_distinct needs no second pass.
  *  - REFERENTIAL rules are anti-join counts: the dim side is
  *    broadcast when small (Catalyst's call — dims here are nation/
  *    region-sized), the fact side never shuffles.
  *
  * Emission contract: counts are exact longs (`checked`,
  * `violations`) — no floats anywhere, so the report hash-matches
  * any engine (the q71 exactness discipline).
  */
object DataQuality {

  /** One validation rule. `name` keys the report row; `target` names
    * the column(s) under check for the reader. */
  sealed trait Rule { def name: String; def target: String }

  /** `col` must not be NULL. */
  final case class NotNull(col: String) extends Rule {
    val name = s"not_null($col)"; val target = col
  }
  /** `col` must lie in [lo, hi] (inclusive); NULLs don't violate —
    * pair with [[NotNull]] when they should. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($col,$lo,$hi)"; val target = col
  }
  /** `col` must be one of `values` (NULLs don't violate). */
  final case class Accepted(col: String, values: Seq[String]) extends Rule {
    val name = s"accepted($col)"; val target = col
  }
  /** `col` must match `regex` entirely (NULLs don't violate). */
  final case class Matches(col: String, regex: String) extends Rule {
    val name = s"matches($col)"; val target = col
  }
  /** The row set must be unique on `cols`; violations = excess rows
    * beyond one per distinct key. Rows with a NULL in any key column
    * are NOT checked (r13 advice — SQL COUNT(DISTINCT) semantics on
    * both engines, so the oracle form `count(key) − count(DISTINCT
    * key)` is the definition, not an approximation of it); pair with
    * [[NotNull]] on the key columns when NULL keys should themselves
    * be violations. */
  final case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique(${cols.mkString(",")})"; val target = cols.mkString(",")
  }
  /** Every non-NULL `col` value must exist in `dimCol` of `dim` —
    * referential integrity, violations = orphan row count. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String,
      dimName: String) extends Rule {
    val name = s"ref_integrity($col->$dimName.$dimCol)"; val target = col
  }

  private def violatedExpr(r: Rule): Column = r match {
    case NotNull(c) => col(c).isNull
    case InRange(c, lo, hi) =>
      col(c).isNotNull && (col(c) < lo || col(c) > hi)
    case Accepted(c, vs) => col(c).isNotNull && !col(c).isin(vs: _*)
    case Matches(c, re) => col(c).isNotNull && !col(c).rlike("^(?:" + re + ")$")
    case r => throw new IllegalArgumentException(s"not row-local: $r")
  }

  /** Evaluate `rules` over `table` → one report row per rule:
    * (rule, target, checked, violations, pass). Row-local rules cost
    * one fused scan total; each Unique one bounded groupBy; each
    * RefIntegrity ONE left-join pass (checked and orphan counts from
    * the same aggregate — not a count + anti-join pair). The
    * independent jobs run CONCURRENTLY (driver-side futures — Spark's
    * scheduler interleaves their stages across the cluster), so a
    * multi-family suite's wall clock is its slowest pass, not the sum
    * of 8-10 sequential job floors (the first form measured 1.26 s at
    * sf0.1 where the data work itself is ~0.3 s). */
  def check(table: DataFrame, rules: Seq[Rule]): DataFrame =
    checkAll(Seq(table -> rules))

  /** Multi-table suite — every table's independent rule jobs launch in
    * ONE concurrent wave (a 4-table admission report is one scheduling
    * round, not four sequential [[check]] waits). Report rows follow
    * call order: tables in suite order, rules in each table's order —
    * POSITIONAL, so duplicate rule names keep their own rows (r13
    * verdict: the name-keyed sort collapsed identical rules). */
  def checkAll(suites: Seq[(DataFrame, Seq[Rule])]): DataFrame = {
    require(suites.nonEmpty && suites.forall(_._2.nonEmpty),
      "empty rule suite")
    val spark = suites.head._1.sparkSession
    import spark.implicits._
    // one task per independent Spark job, tagged (suiteIdx, ruleIdx)
    val tasks: Seq[() => Seq[((Int, Int), (String, String, Long, Long))]] =
      suites.zipWithIndex.flatMap { case ((t, rs), si) =>
        evaluateTasks(t, rs).map(task =>
          () => task().map { case (ri, row) => ((si, ri), row) })
      }
    runWave(tasks).flatten.sortBy(_._1).map(_._2)
      .toDF("rule", "target", "checked", "violations")
      .withColumn("pass", (col("violations") === 0L).cast("int"))
  }

  /** Run every task of one wave concurrently on a DEDICATED pool
    * sized to the wave (capped at [[WavePoolCap]]) — NOT the global
    * fork-join pool (r13 verdict: blocking Spark actions on the
    * CPU-count global pool silently serialize any suite wider than
    * the core count and starve the pool's other driver-side users).
    * The threads only block on job results, so a wave-sized pool
    * costs idle waiters, not CPU; past the cap the tail queues —
    * by then the Spark scheduler itself is the limiter. */
  private[graft] val WavePoolCap = 64
  private[graft] def runWave[A](tasks: Seq[() => A]): Seq[A] =
    if (tasks.isEmpty) Seq.empty
    else if (tasks.lengthCompare(1) == 0) Seq(tasks.head())
    else {
      import scala.concurrent.{Await, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(tasks.length, WavePoolCap))
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try Await.result(
        Future.sequence(tasks.map(t => Future(t())(ec)))(
          implicitly, ec),
        scala.concurrent.duration.Duration.Inf)
      finally { pool.shutdown(); () }
    }

  /** One table's independent jobs as thunks, each returning its rows
    * tagged with the POSITION of the rule in the caller's list. All
    * row-local rules share one fused-scan thunk; each Unique /
    * RefIntegrity is its own thunk. */
  private def evaluateTasks(table: DataFrame, rules: Seq[Rule])
      : Seq[() => Seq[(Int, (String, String, Long, Long))]] = {
    val indexed = rules.zipWithIndex
    val rowLocal = indexed.filter {
      case (_: NotNull | _: InRange | _: Accepted | _: Matches, _) => true
      case _ => false
    }
    val localTask: Seq[() => Seq[(Int, (String, String, Long, Long))]] =
      if (rowLocal.isEmpty) Seq.empty
      else Seq(() => {
        val aggs = count(lit(1)).as("_checked") +:
          rowLocal.zipWithIndex.map { case ((r, _), i) =>
            sum(when(violatedExpr(r), 1L).otherwise(0L)).as(s"_v$i") }
        val row = table.agg(aggs.head, aggs.tail: _*).head()
        val checked = row.getLong(0)
        rowLocal.zipWithIndex.map { case ((r, ri), i) =>
          (ri, (r.name, r.target, checked,
            if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)))
        }
      })
    val keyedTasks = indexed.collect {
      case (r @ Unique(cols), ri) => () => {
        // NULL-keyed rows are excluded on BOTH sides of the count —
        // the COUNT(DISTINCT) oracle definition (see Unique's doc)
        val row = table
          .filter(cols.map(col(_).isNotNull).reduce(_ && _))
          .groupBy(cols.map(col): _*).count()
          .agg(coalesce(sum(col("count")), lit(0L)).as("n"),
            count(lit(1)).as("k")).head()
        Seq((ri, (r.name, r.target, row.getLong(0),
          row.getLong(0) - row.getLong(1))))
      }
      case (r @ RefIntegrity(c, dim, dimCol, _), ri) => () => {
        val row = table.select(col(c)).filter(col(c).isNotNull)
          .join(dim.select(col(dimCol).as(c)).distinct()
            .withColumn("__dq_m", lit(1)), Seq(c), "left")
          .agg(count(lit(1)).as("n"),
            sum(when(col("__dq_m").isNull, 1L).otherwise(0L)).as("o"))
          .head()
        Seq((ri, (r.name, r.target, row.getLong(0),
          if (row.isNullAt(1)) 0L else row.getLong(1))))
      }
    }
    localTask ++ keyedTasks
  }

  /** The actionable half of [[check]]: per-row violation flags for
    * routing rows into a quarantine store instead of (or before) a
    * corpus append. Appends two columns to the input: `violations`
    * (the violated rule names, suite order) and `quarantine`
    * (1 when any rule fired). Row-local rules stay MAP-ONLY — the
    * flags are codegen'd expressions, the table never shuffles;
    * [[RefIntegrity]] rules compose as one left join each against the
    * dim's distinct keys (broadcast when the dim is small — the same
    * plan a manual orphan check would build). [[Unique]] is
    * deliberately NOT supported here: duplicate-row quarantine
    * requires choosing a keeper, which is the dedup family's job
    * ([[graft.ml.TextDedup]], canonical selection), not a per-row
    * predicate. */
  def flagRows(table: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(!rules.exists(_.isInstanceOf[Unique]),
      "Unique is not row-local: route duplicates through the dedup " +
        "operators (keeper selection), not quarantine flags")
    // each RefIntegrity joins a marker for key presence; violation =
    // non-null value with no marker
    val (joined, flags) = rules.zipWithIndex.foldLeft(
        (table, Seq.empty[Column])) {
      case ((acc, fs), (r @ RefIntegrity(c, dim, dimCol, _), i)) =>
        val m = s"__dq_m$i"
        val withM = acc.join(
          dim.select(col(dimCol).as(c)).distinct().withColumn(m, lit(1)),
          Seq(c), "left")
        (withM, fs :+ when(col(c).isNotNull && col(m).isNull, lit(r.name)))
      case ((acc, fs), (r, _)) =>
        (acc, fs :+ when(violatedExpr(r), lit(r.name)))
    }
    joined
      .withColumn("violations",
        filter(array(flags: _*), x => x.isNotNull))
      .withColumn("quarantine", (size(col("violations")) > 0).cast("int"))
      .drop(joined.columns.filter(_.startsWith("__dq_m")).toSeq: _*)
  }
}
