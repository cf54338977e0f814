package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate row. */
final case class ScoredId(id: Long, score: Double)

/** Bounded top-k typed aggregator: keeps the k best (score desc, id asc)
  * rows per group with map-side partial aggregation.
  *
  * Why this exists next to the window formulation: a
  * `row_number().over(partitionBy(qid).orderBy(score))` plan shuffles
  * and sorts EVERY scored row. An Aggregator participates in Spark's
  * two-phase aggregation, so each map task forwards at most k rows per
  * group into the shuffle — at 100 TB the exchange carries
  * O(partitions x groups x k) instead of O(rows). Results are identical
  * (same ordering, same tie-break on id).
  */
final class TopKByScore(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKByScore {
  /** Scala Encoders for callers without spark.implicits in scope. */
  val scoredIdEncoder: Encoder[ScoredId] = Encoders.product[ScoredId]
}
