package graft.api

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.GraftEngine

/** MCP prompt templates (reference serve.py:3825-4016): data-grounded
  * instruction documents — each prompt RUNS the relevant analytics and
  * interpolates the results into a workflow template, so the agent
  * receiving it starts with the actual errors/history/diff in hand
  * rather than a bare instruction to go query them.
  *
  * Same four prompts as the reference: fix-errors, analyze-regression,
  * summarize-run, investigate-flaky. All interpolation inputs are
  * small bounded frames (limits ≤ 20) — driver-side markdown assembly
  * is the job here, exactly like Formatters.
  */
object Prompts {

  final case class Arg(name: String, description: String, required: Boolean)
  final case class PromptSpec(name: String, description: String, args: Seq[Arg])

  val specs: Seq[PromptSpec] = Seq(
    PromptSpec("fix-errors",
      "Guide through fixing build errors systematically.",
      Seq(Arg("limit", "Max errors to include (default 20)", required = false))),
    PromptSpec("analyze-regression",
      "Help identify why a build started failing between two runs.",
      Seq(Arg("good_run", "Known-good run_serial (default: last OK run)", required = false),
        Arg("bad_run", "Failing run_serial (default: newest run)", required = false))),
    PromptSpec("summarize-run",
      "Generate a concise summary of a build/test run.",
      Seq(Arg("run_id", "run_serial to summarize (default: newest)", required = false))),
    PromptSpec("investigate-flaky",
      "Help investigate intermittently failing tests.",
      Seq(Arg("lookback", "How many recent runs to examine (default 10)", required = false))))

  /** Render prompt `name`; None when the name is unknown. */
  def get(engine: GraftEngine, name: String,
      args: Map[String, String]): Option[String] = name match {
    case "fix-errors" => Some(fixErrors(engine, intArg(args, "limit", 20)))
    case "analyze-regression" =>
      Some(analyzeRegression(engine,
        args.get("good_run").map(_.toLong), args.get("bad_run").map(_.toLong)))
    case "summarize-run" =>
      Some(summarizeRun(engine, args.get("run_id").map(_.toLong)))
    case "investigate-flaky" =>
      Some(investigateFlaky(engine, intArg(args, "lookback", 10)))
    case _ => None
  }

  private def intArg(args: Map[String, String], k: String, dflt: Int): Int =
    args.get(k).map(_.toInt).getOrElse(dflt)

  private def loc(r: Row): String = {
    val f = Option(r.getAs[String]("ref_file")).getOrElse("?")
    val l = Option(r.getAs[Any]("ref_line")).map(_.toString).getOrElse("?")
    s"$f:$l"
  }

  private def fixErrors(engine: GraftEngine, limit: Int): String = {
    val status = engine.status()
      .select("source_name", "status", "errors", "warnings")
      .collect()
    val statusTable =
      ("| Source | Status | Errors | Warnings |" ::
        "|--------|--------|--------|----------|" ::
        status.toList.map(r => s"| ${r.getString(0)} | ${r.getString(1)} | " +
          s"${r.getLong(2)} | ${r.getLong(3)} |")).mkString("\n")
    val errs = engine.errors(limit)
      .select("ref", "ref_file", "ref_line", "message").collect()
    val errorList =
      if (errs.isEmpty) "No errors found."
      else errs.zipWithIndex.map { case (r, i) =>
        s"${i + 1}. **ref: ${r.getAs[String]("ref")}** `${loc(r)}`\n   ```\n   " +
          s"${Option(r.getAs[String]("message")).getOrElse("")}\n   ```"
      }.mkString("\n\n")
    s"""You are helping fix build errors in a software project.
       |
       |## Current Status
       |
       |$statusTable
       |
       |## Errors to Fix
       |
       |$errorList
       |
       |## Instructions
       |
       |1. Read each error and understand the root cause
       |2. Use `event(ref="...")` for full context if the message is unclear
       |3. Use `source_context(ref="...")` to see the surrounding source
       |4. Fix errors in dependency order:
       |   - Missing includes/declarations first
       |   - Then type errors
       |   - Then syntax errors
       |5. After fixing, run `run(command="...")` to verify
       |6. Repeat until the build passes
       |
       |Focus on fixing the root cause, not just suppressing warnings.""".stripMargin
  }

  private def analyzeRegression(engine: GraftEngine, goodArg: Option[Long],
      badArg: Option[Long]): String = {
    val runs = engine.history(10)
      .select("run_serial", "status_badge", "errors").collect()
    if (runs.isEmpty)
      return "No runs found. Run a build first with `run(command=\"...\")`."
    val bad = badArg.getOrElse(runs.head.getLong(0))
    val good = goodArg.getOrElse {
      runs.drop(1).find(_.getString(1) == "[ OK ]").map(_.getLong(0))
        .getOrElse(math.max(1L, bad - 1))
    }
    val deltas = engine.diff(good, bad)
      .select("tool_name", "category", "errors_1", "errors_2", "delta").collect()
    val deltaTable =
      ("| Tool | Category | Run " + good + " | Run " + bad + " | Delta |" ::
        "|------|----------|-----|-----|-------|" ::
        deltas.toList.map(r => s"| ${r.getString(0)} | ${r.getString(1)} | " +
          s"${r.getLong(2)} | ${r.getLong(3)} | ${r.getLong(4)} |")).mkString("\n")
    val newErrs = engine.analytics.newErrors(bad)
      .select("ref", "ref_file", "ref_line", "message").limit(20).collect()
    val newList =
      if (newErrs.isEmpty) "None"
      else newErrs.map(r => s"- **ref: ${r.getAs[String]("ref")}** `${loc(r)}`\n  " +
        s"${Option(r.getAs[String]("message")).getOrElse("")}").mkString("\n")
    s"""You are analyzing why a build started failing.
       |
       |## Error Deltas (run $good -> run $bad)
       |
       |$deltaTable
       |
       |## New Errors (fingerprints never seen before run $bad)
       |
       |$newList
       |
       |## Instructions
       |
       |1. Review the new errors that appeared
       |2. Look for patterns (same file, same error type)
       |3. Use `event(ref="...")` for full error context
       |4. Identify the root cause
       |5. Suggest the minimal fix to restore the build""".stripMargin
  }

  private def summarizeRun(engine: GraftEngine, runArg: Option[Long]): String = {
    val runs = engine.history(20)
      .select("run_serial", "run_ref", "status_badge", "errors", "warnings").collect()
    if (runs.isEmpty)
      return "No runs found. Run a build first with `run(command=\"...\")`."
    val run = runArg.flatMap(id => runs.find(_.getLong(0) == id)).getOrElse(runs.head)
    val serial = run.getLong(0)
    val errs = engine.analytics.eventsForRun(serial)
      .filter(col("severity") === "error")
      .select("ref_file", "ref_line", "message").limit(10).collect()
    val errorDetails =
      if (errs.isEmpty) "No errors"
      else errs.map(r => s"- `${loc(r)}` - " +
        s"${Option(r.getAs[String]("message")).getOrElse("").take(80)}").mkString("\n")
    s"""Summarize this build/test run.
       |
       |## Run Details
       |
       |- **Run:** ${run.getString(1)}
       |- **Status:** ${run.getString(2)}
       |- **Errors:** ${run.getLong(3)}
       |- **Warnings:** ${run.getLong(4)}
       |
       |## Error Details
       |
       |$errorDetails
       |
       |## Instructions
       |
       |Generate a summary suitable for a GitHub PR comment:
       |- Lead with pass/fail status
       |- List the key errors (not all warnings)
       |- Suggest what might have caused the failure
       |- Keep it concise""".stripMargin
  }

  private def investigateFlaky(engine: GraftEngine, lookback: Int): String = {
    val runs = engine.history(lookback)
      .select("run_ref", "status_badge", "errors").collect()
    if (runs.isEmpty)
      return "No runs found. Run tests first with `run(command=\"...\")`."
    val table =
      ("| Run | Status | Errors |" :: "|-----|--------|--------|" ::
        runs.toList.map(r =>
          s"| ${r.getString(0)} | ${r.getString(1)} | ${r.getLong(2)} |")).mkString("\n")
    s"""You are investigating flaky (intermittently failing) tests.
       |
       |## Test History (last $lookback runs)
       |
       |$table
       |
       |## Instructions
       |
       |1. Look for patterns in failures
       |2. Use `events(ref="...")` to see errors for specific runs
       |3. Use `event(ref="...")` for detailed failure output
       |4. Look for:
       |   - Race conditions (concurrent, parallel, thread)
       |   - Timing issues (timeout, sleep, wait)
       |   - Resource contention (connection, file, lock)
       |5. Suggest fixes to make tests more deterministic""".stripMargin
  }
}
