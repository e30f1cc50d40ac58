package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: per group, the k largest (score, id) pairs,
  * score-descending with id tiebreak.
  *
  * Why this exists when a rank-window does the same thing: the window
  * form shuffles EVERY row of the group to one reducer and sorts it;
  * an Aggregator participates in partial aggregation, so each map task
  * reduces its slice to ≤ k pairs before the shuffle — per-group
  * network cost is k·partitions rows instead of the whole group. At
  * 100 TB with heavy groups that is the difference between a skewed
  * sort and a bounded combine. (Same logic as Spark's own
  * TakeOrderedAndProject, but per-group instead of global.)
  *
  * The buffer is a sorted Seq bounded at k — insertion is O(k) per
  * row, fine for the k ≤ ~100 this is meant for.
  */
final case class ScoredId(score: Double, id: Long)

final class TopK(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  private def ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.lengthCompare(k) >= 0 && ord.gteq(a, buf.last)) buf
    else ((buf :+ a).sorted(ord)).take(k)

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** Column form for Dataset.groupByKey(...).agg(TopK.topK(5)). */
  def topK(k: Int): TypedColumn[ScoredId, Seq[ScoredId]] =
    new TopK(k).toColumn
}
