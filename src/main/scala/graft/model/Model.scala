package graft.model

import java.sql.{Date, Timestamp}

/** The blq data model re-expressed as Spark `Dataset[T]` case classes.
  *
  * A small star schema over append-only event streams (SURVEY.md §1):
  * sessions spawn attempts; an attempt gains at most one outcome
  * (absence ⇒ pending, NULL exit_code ⇒ orphaned); a completed attempt
  * is mirrored as a denormalized invocation ("run"); each run owns
  * parsed diagnostic events.
  *
  * Schemas mirror /root/reference/src/blq/bird_schema.sql:40-241 and the
  * parquet writer schema at src/blq/commands/core.py:1876-1923, with
  * Spark-native type substitutions (UUID→36-char string, JSON→string,
  * MAP(VARCHAR,VARCHAR)→Map[String,String]; SURVEY.md §1.2).
  *
  * `date` is ALWAYS the physical partition column — every table is
  * written `partitionBy("date")` so recency predicates prune partitions
  * at any scale.
  */

/** Command start record, written before the outcome is known
  * (bird_schema.sql:66-107). */
case class Attempt(
    id: String,
    session_id: String,
    timestamp: Timestamp,
    cwd: Option[String],
    command: Option[String],
    executable: Option[String],
    pid: Option[Int],
    format_hint: Option[String],
    hostname: Option[String],
    username: Option[String],
    tag: Option[String],
    source_name: Option[String],
    source_type: String,
    git_commit: Option[String],
    git_branch: Option[String],
    git_dirty: Option[Boolean],
    environment: Option[Map[String, String]],
    ci: Option[Map[String, String]],
    date: Date)

/** Command completion record, 1:1 with Attempt (bird_schema.sql:112-127).
  * Absent ⇒ attempt pending; exit_code NULL ⇒ orphaned. */
case class Outcome(
    attempt_id: String,
    completed_at: Timestamp,
    duration_ms: Option[Long],
    exit_code: Option[Int],
    signal: Option[Int],
    timeout: Boolean,
    date: Date)

/** Completed command execution with denormalized context
  * (bird_schema.sql:130-175). `run_serial` is assigned at WRITE time
  * (single-writer discipline, like the reference's get_next_run_number,
  * bird.py:824-837) so reads never need a global window at scale. */
case class Invocation(
    id: String,
    run_serial: Long,
    session_id: String,
    source_name: Option[String],
    source_type: String,
    tag: Option[String],
    command: Option[String],
    cwd: Option[String],
    executable_path: Option[String],
    started_at: Timestamp,
    duration_ms: Option[Long],
    exit_code: Option[Int],
    hostname: Option[String],
    platform: Option[String],
    arch: Option[String],
    git_commit: Option[String],
    git_branch: Option[String],
    git_dirty: Option[Boolean],
    environment: Option[Map[String, String]],
    ci: Option[Map[String, String]],
    metadata: Option[String],
    date: Date)

/** One parsed diagnostic (bird_schema.sql:202-241). */
case class Event(
    id: String,
    invocation_id: String,
    event_index: Long,
    timestamp: Timestamp,
    severity: String,
    message: Option[String],
    raw_text: Option[String],
    tool_name: Option[String],
    category: Option[String],
    code: Option[String],
    rule: Option[String],
    test_name: Option[String],
    ref_file: Option[String],
    ref_line: Option[Int],
    ref_column: Option[Int],
    fingerprint: Option[String],
    log_line_start: Option[Int],
    log_line_end: Option[Int],
    context: Option[String],
    metadata: Option[String],
    date: Date)

/** Captured output metadata; content lives inline (data: URI, <4 KB) or
  * in the content-addressed blob store (bird_schema.sql:178-199). */
case class Output(
    id: String,
    invocation_id: String,
    stream: String,
    content_hash: Option[String],
    byte_length: Long,
    storage_type: String, // inline | blob
    storage_ref: String,
    content_type: Option[String],
    date: Date)

object Severity {
  val Error = "error"
  val Warning = "warning"
  val Info = "info"
  val Note = "note"
  val TestPass = "test_pass"
  val TestFail = "test_fail"
  val All: Seq[String] = Seq(Error, Warning, Info, Note, TestPass, TestFail)
}

object SourceType {
  val Run = "run"
  val Exec = "exec"
  val Import = "import"
  val Capture = "capture"
  val Watch = "watch"
}
