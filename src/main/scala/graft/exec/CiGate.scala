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
    val fd = analytics.fingerprintDiff(baselineSerial, candidateSerial)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fresh = fd.getOrElse("new", 0L)
    val samples =
      if (fresh == 0) Seq.empty
      else analytics.newErrors(candidateSerial)
        .select(col("message")).limit(maxSamples)
        .collect().map(r => Option(r.getString(0)).getOrElse("")).toSeq
    Verdict(
      pass = fresh == 0,
      newErrors = fresh,
      fixedErrors = fd.getOrElse("fixed", 0L),
      unchangedErrors = fd.getOrElse("unchanged", 0L),
      newSamples = samples)
  }
}
