package graft.exec

import org.apache.spark.sql.functions._
import graft.analytics.Analytics

/** CI regression gate (reference ci_cmd.py:161-178 behavior): compare a
  * candidate run against a baseline run by fingerprint set algebra and
  * decide pass/fail. New errors (fingerprints absent from baseline)
  * fail the gate; fixed ones are reported. All set math runs as
  * anti/semi joins — nothing is collected except the verdict counts
  * and bounded samples.
  */
object CiGate {
  final case class Verdict(
      pass: Boolean,
      newErrors: Long,
      fixedErrors: Long,
      unchangedErrors: Long,
      newSamples: Seq[String])
}

final class CiGate(analytics: Analytics) {
  import CiGate.Verdict

  def check(baselineSerial: Long, candidateSerial: Long,
      maxSamples: Int = 5): Verdict = {
    // persisted: the verdict counts AND the sample join both consume
    // this three-join graph — uncached it would execute twice
    val diff = analytics.fingerprintDiff(baselineSerial, candidateSerial)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fd = diff
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = fd.getOrElse("new", 0L)
    // Samples come from the SAME "new" fingerprint set the verdict
    // counts (vs baseline only) — newErrors() anti-joins against ALL
    // earlier runs, which can report a non-zero count with empty or
    // mismatched samples when a regressed fingerprint existed in some
    // older non-baseline run.
    val samples =
      if (fresh == 0) Seq.empty
      else analytics.eventsForRun(candidateSerial)
        .filter(col("severity") === "error")
        .join(diff.filter(col("status") === "new").select(col("fingerprint")),
          Seq("fingerprint"), "left_semi")
        .select(col("message")).limit(maxSamples)
        .collect().map(r => Option(r.getString(0)).getOrElse("")).toSeq
    diff.unpersist()
    Verdict(
      pass = fresh == 0,
      newErrors = fresh,
      fixedErrors = fd.getOrElse("fixed", 0L),
      unchangedErrors = fd.getOrElse("unchanged", 0L),
      newSamples = samples)
  }
}
