package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-enrichment stage (F5, SURVEY.md §2.10): the reference's
  * annotator plugins append entries to `metadata.annotations` on stored
  * events (ext/annotator.py:25-224). Plain parquet has no UPDATE, so
  * the Spark-native design is:
  *
  *  - eager annotators run as `withColumn` transforms on the events
  *    frame BEFORE the append write (this object);
  *  - lazy/late annotations land in a side table keyed by event id,
  *    joined back at read ([[annotateFromSide]]).
  *
  * An annotation is a Column producing a JSON object string (or null =
  * no annotation); [[apply]] appends non-null results to the
  * `metadata.annotations` JSON array, preserving other metadata keys.
  */
object Annotators {

  /** One enrichment rule: name + a Column over the events frame that
    * evaluates to a JSON-object string or null. */
  final case class Annotator(name: String, annotation: org.apache.spark.sql.Column)

  /** Built-in example annotators mirroring the reference's samples. */
  val severityEscalator: Annotator = Annotator("severity_escalator",
    when(col("message").rlike("(?i)(fatal|panic|segfault|abort)"),
      lit("""{"annotator":"severity_escalator","escalate":"critical"}""")))

  val flakyTestTagger: Annotator = Annotator("flaky_test_tagger",
    when(col("test_name").isNotNull && col("message").rlike("(?i)(timeout|retry|flaky)"),
      lit("""{"annotator":"flaky_test_tagger","flaky":true}""")))

  /** Run annotators over an events frame: each non-null annotation is
    * appended to the metadata JSON's `annotations` array. A prior
    * `annotations` array is preserved; other top-level metadata keys
    * are not (annotation-bearing events are rebuilt with an
    * annotations-only metadata object — acceptable because the write
    * path keeps `metadata` exclusively for annotations; arbitrary-key
    * merge would need a JSON UDF, which this stage deliberately
    * avoids). Pure column expressions — stays inside codegen. */
  def apply(events: DataFrame, annotators: Seq[Annotator]): DataFrame = {
    val arr = array(annotators.map(_.annotation): _*)
    val additions = filter(arr, a => a.isNotNull)
    events.withColumn("metadata",
      when(size(additions) === 0, col("metadata"))
        .otherwise(
          // merge into existing {"annotations": [...]} or start fresh
          concat(
            lit("""{"annotations":["""),
            concat_ws(",",
              // pre-existing NON-EMPTY annotations array content: an
              // existing `[]` strips to "" and concat_ws skips only
              // NULLs, so the empty case must map to null or the
              // rebuilt JSON gets a leading comma (malformed)
              when(length(regexp_replace(
                  get_json_object(col("metadata"), "$.annotations"),
                  "^\\[|\\]$", "")) > 0,
                regexp_replace(get_json_object(col("metadata"), "$.annotations"),
                  "^\\[|\\]$", "")),
              concat_ws(",", additions)),
            lit("]}"))))
  }

  /** Late annotations from a side table (event_id, annotation_json):
    * the read-path join replacing the reference's UPDATE. Broadcast —
    * the side table is always small relative to events. */
  def annotateFromSide(events: DataFrame, side: DataFrame): DataFrame =
    events.join(broadcast(side.withColumnRenamed("event_id", "id")
        .withColumnRenamed("annotation_json", "late_annotation")),
      Seq("id"), "left")
}
