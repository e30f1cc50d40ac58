package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Session-extension entry point: enables the graft SQL surface on any
  * cluster with zero code changes —
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  * Injects the `parse_log` generator (and is the hook where a custom
  * pruning `Rule[LogicalPlan]` or strategy would be registered if the
  * engine ever needs one; see SURVEY.md §4 — Catalyst covers the rest).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("parse_log"), ParseLog.info, ParseLog.builder))
    ext.injectFunction(
      (FunctionIdentifier("bit_hamming"), BitHamming.info, BitHamming.builder))
    VectorOps.injectInto(ext)
    // partition-prune invocation-scoped SQL through the invocations dim
    ext.injectOptimizerRule(_ => InvocationDatePruning)
  }
}
