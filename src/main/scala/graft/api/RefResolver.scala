package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Run/event reference parsing + resolution, mirroring the reference's
  * ref grammar (/root/reference/src/blq/services/refs.py:66-196,
  * behavior only):
  *
  *  - `"5"`        bare run serial
  *  - `"build:3"`  tag:serial
  *  - `"test:5:2"` tag:serial:event
  *  - `"5:2"`      serial:event (first part numeric ⇒ serial)
  *  - `"~1"`       relative: most recent run (`~2` second-most-recent)
  *  - `"test:~2"`  relative within tag/source
  *  - `"test:~2:4"`relative with event index
  *  - UUID         invocation id lookup
  *  - bare word    source-name fallback (latest run of that source)
  */
object RefResolver {

  final case class ParsedRef(
      uuid: Option[String] = None,
      tag: Option[String] = None,
      runSerial: Option[Long] = None,
      relative: Option[Int] = None,
      eventId: Option[Long] = None)

  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  private def relOf(s: String): Option[Int] =
    if (s.startsWith("~") && s.drop(1).nonEmpty && s.drop(1).forall(_.isDigit))
      Some(s.drop(1).toInt)
    else None

  private def longOf(s: String): Option[Long] = s.toLongOption

  def parse(ref: String): ParsedRef = {
    val r = ref.trim
    require(r.nonEmpty, "Empty ref")
    if (UuidRe.matches(r)) return ParsedRef(uuid = Some(r))
    r.split(":", -1).toSeq match {
      case Seq(one) =>
        relOf(one).map(n => ParsedRef(relative = Some(n)))
          .orElse(longOf(one).map(n => ParsedRef(runSerial = Some(n))))
          .getOrElse(ParsedRef(tag = Some(one)))
      case Seq(first, second) =>
        relOf(first).map(n => ParsedRef(relative = Some(n), eventId = Some(second.toLong)))
          .orElse(longOf(first).flatMap(s => longOf(second).map(e =>
            ParsedRef(runSerial = Some(s), eventId = Some(e)))))
          .orElse(relOf(second).map(n => ParsedRef(tag = Some(first), relative = Some(n))))
          .orElse(longOf(second).map(s => ParsedRef(tag = Some(first), runSerial = Some(s))))
          .getOrElse(throw new IllegalArgumentException(s"Invalid ref: $r"))
      case Seq(first, second, third) =>
        val e = third.toLong
        relOf(second).map(n => ParsedRef(tag = Some(first), relative = Some(n), eventId = Some(e)))
          .orElse(longOf(second).map(s => ParsedRef(tag = Some(first), runSerial = Some(s), eventId = Some(e))))
          .getOrElse(throw new IllegalArgumentException(s"Invalid ref: $r"))
      case _ => throw new IllegalArgumentException(s"Invalid ref: $r")
    }
  }

  /** Resolve a ref against a runs frame (Views.runs shape) → the single
    * matching run row as a 1-row DataFrame (empty when unmatched).
    * Relative resolution is an orderBy+limit+offset-style plan — a
    * TakeOrdered at any scale, never a full sort. */
  def resolveRun(runs: DataFrame, ref: String): DataFrame = {
    val p = parse(ref)
    p match {
      case ParsedRef(Some(uuid), _, _, _, _) =>
        runs.filter(col("invocation_id") === uuid)
      case ParsedRef(_, tagOpt, _, Some(rel), _) =>
        val base = tagOpt.map(t =>
          runs.filter(col("source_name") === t || col("tag") === t)).getOrElse(runs)
        base.orderBy(col("started_at").desc, col("invocation_id").desc)
          .limit(rel)
          .orderBy(col("started_at").asc, col("invocation_id").asc)
          .limit(1)
      case ParsedRef(_, tagOpt, Some(serial), _, _) =>
        val base = runs.filter(col("run_serial") === serial)
        tagOpt.map { t =>
          // prefer the tag/source match; fall back to an UNTAGGED run
          // with that serial (the old lit(t).isNull fallback compared
          // a non-null literal — constant false, dead branch — and
          // union+limit(1) had no preference order anyway)
          val tagged = base.filter(col("tag") === t || col("source_name") === t)
            .withColumn("__pref", lit(0))
          val untagged = base.filter(col("tag").isNull && col("source_name").isNull)
            .withColumn("__pref", lit(1))
          tagged.unionByName(untagged)
            .orderBy(col("__pref")).limit(1).drop("__pref")
        }.getOrElse(base)
      case ParsedRef(_, Some(tag), _, _, _) =>
        runs.filter(col("source_name") === tag || col("tag") === tag)
          .orderBy(col("started_at").desc, col("invocation_id").desc)
          .limit(1)
      case _ => runs.limit(0)
    }
  }
}
