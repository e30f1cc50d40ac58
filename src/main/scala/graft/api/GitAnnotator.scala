package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.exec.ExecContext
import graft.store.EventStore

/** Git blame / file-history enrichment (reference git.py:150-208 and
  * the `blq info` surface): for an event's `ref_file:ref_line`, who
  * last touched that line, in which commit, and the file's recent
  * history.
  *
  * Blame is inherently a per-location subprocess (the reference shells
  * out per file too), so this is a LATE annotator in the framework's
  * eager/lazy split (see [[Annotators]]): a driver-side maintenance
  * job builds a bounded side table of (event_id, annotation_json) —
  * one blame per DISTINCT location, never per event — and the read
  * path attaches it with [[Annotators.annotateFromSide]]'s broadcast
  * join. Scale shape: the subprocess count is bounded by
  * `maxLocations` (the collect is k-row by construction), the join
  * side is always small, and the events frame itself never leaves
  * Spark.
  */
object GitAnnotator {

  final case class Blame(commit: String, author: String, authorTime: Long)
  final case class Commit(hash: String, author: String, time: Long, message: String)

  /** `git blame -L line,line --porcelain` → last commit/author/time for
    * that line; None on any failure (missing file, line past EOF,
    * non-repo). Porcelain header: `<sha> <orig> <final> [count]`
    * followed by `author <name>` / `author-time <epoch>` lines. */
  def blame(repo: String, path: String, line: Int,
      timeoutMs: Long = 5000): Option[Blame] =
    ExecContext.runGit(Some(repo), timeoutMs,
      "blame", "-L", s"$line,$line", "--porcelain", "--", path).flatMap { out =>
      val lines = out.linesIterator.toSeq
      for {
        head <- lines.headOption
        sha <- head.split(" ").headOption.filter(_.matches("[0-9a-f]{40}"))
        author <- lines.collectFirst { case l if l.startsWith("author ") => l.drop(7) }
        time <- lines.collectFirst { case l if l.startsWith("author-time ") =>
          l.drop(12).trim }.flatMap(_.toLongOption)
      } yield Blame(sha, author, time)
    }

  /** Recent commits touching `path` (reference get_file_history,
    * git.py:190-208 behavior): `git log -n limit --format=%h|%an|%at|%s
    * -- path`. */
  def fileHistory(repo: String, path: String, limit: Int = 5,
      timeoutMs: Long = 5000): Seq[Commit] =
    ExecContext.runGit(Some(repo), timeoutMs,
      "log", "-n", limit.toString, "--format=%h|%an|%at|%s", "--", path)
      .map(_.linesIterator.flatMap { l =>
        l.split("\\|", 4) match {
          case Array(h, a, t, m) => t.toLongOption.map(Commit(h, a, _, m))
          case _ => None
        }
      }.toSeq).getOrElse(Nil)

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Build the late-annotation side table for a store: the bounded set
    * of distinct (ref_file, ref_line) locations among error/warning
    * events is blamed ONCE each driver-side, and every event at that
    * location gets the same annotation row. Returns (event_id,
    * annotation_json) ready for [[Annotators.annotateFromSide]];
    * locations outside the repo (or gone from the tree) simply yield
    * no row, like the reference's None blame. */
  def sideTable(store: EventStore, repoRoot: String,
      historyLimit: Int = 3, maxLocations: Int = 1000): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    // distinct locations, bounded: the ONLY data that reaches the driver
    val locs = store.events
      .filter(col("severity").isin("error", "warning") &&
        col("ref_file").isNotNull && col("ref_line").isNotNull)
      .select(col("ref_file"), col("ref_line"))
      .distinct()
      .limit(maxLocations)
      .as[(String, Int)].collect()
    val annotated = locs.toSeq.flatMap { case (file, line) =>
      blame(repoRoot, file, line).map { b =>
        val hist = fileHistory(repoRoot, file, historyLimit)
          .map(c => s"""{"hash":${jstr(c.hash)},"author":${jstr(c.author)},""" +
            s""""time":${c.time},"message":${jstr(c.message)}}""")
          .mkString("[", ",", "]")
        (file, line,
          s"""{"annotator":"git_blame","last_commit":${jstr(b.commit)},""" +
            s""""last_author":${jstr(b.author)},"last_modified":${b.authorTime},""" +
            s""""recent_commits":$hist}""")
      }
    }
    if (annotated.isEmpty)
      // empty frame with the contract schema, so callers can join it
      // unconditionally
      return spark.emptyDataset[(String, String)]
        .toDF("event_id", "annotation_json")
    val side = annotated.toDF("ref_file", "ref_line", "annotation_json")
    // fan the per-location annotation back out to event ids in Spark —
    // events never reach the driver
    store.events
      .filter(col("severity").isin("error", "warning"))
      .select(col("id").as("event_id"), col("ref_file"), col("ref_line"))
      .join(broadcast(side), Seq("ref_file", "ref_line"))
      .select(col("event_id"), col("annotation_json"))
  }
}
