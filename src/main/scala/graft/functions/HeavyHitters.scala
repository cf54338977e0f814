package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One tracked term: observed count plus the over-count bound (`err`):
  * the true frequency f satisfies `count - err <= f <= count`. */
final case class TermCount(term: String, count: Long, err: Long)

/** SpaceSaving heavy hitters (Metwally, Agrawal, El Abbadi 2005,
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams") as a typed Spark Aggregator: the frequent-terms profile of
  * a 100 TB corpus with `capacity` counters of state per task instead
  * of a full term shuffle.
  *
  * Why not `groupBy(term).count.orderBy.limit(k)`? That plan shuffles
  * every distinct term (a web-scale corpus has billions) to get back the
  * top 100. SpaceSaving keeps a capped counter map per map task —
  * eviction replaces the minimum counter and inherits its count as the
  * new term's error bound — then merges summaries associatively: the
  * exchange carries O(tasks × capacity) rows, corpus-size-independent.
  *
  * Cost honesty: once a task's buffer saturates, each NOVEL term pays
  * an O(capacity) min-scan for eviction (the canonical Stream-Summary
  * structure makes that O(1); this Map-backed buffer trades that for
  * encoder simplicity). Terms already tracked update in O(1), so on the
  * skewed distributions heavy-hitter profiling targets — where the hot
  * head dominates arrivals — the amortized cost stays near O(1)/token.
  *
  * Exactness contract (what the DuckDB oracle checks): while the number
  * of distinct terms seen by every task stays <= capacity, no eviction
  * happens, every err is 0, and the summary IS the exact term count —
  * so the `corpus_top_terms` query (capacity >> vocabulary) is
  * hash-checked, and the approximation behavior (capacity bound, err
  * accounting, guaranteed-heavy detection) is pinned in
  * HeavyHittersSpec.
  *
  * Merge (the mergeable-summaries construction, Agarwal et al. 2012):
  * a term absent from a FULL summary may have been evicted there, so
  * its contribution from that side is bounded by that summary's minimum
  * count (absent from a non-full summary = genuinely unseen = 0); sum
  * the per-side bounds, then keep the `capacity` largest. Both
  * invariants survive: `count` stays an upper bound on the true
  * frequency and `count - err` a lower bound.
  */
final class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[TermCount]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(buf: Map[String, (Long, Long)], term: String): Map[String, (Long, Long)] =
    buf.get(term) match {
      case Some((c, e)) => buf.updated(term, (c + 1, e))
      case None if buf.size < capacity => buf.updated(term, (1L, 0L))
      case None =>
        // SpaceSaving eviction: replace the minimum counter; the new
        // term inherits min as both count-offset and error bound
        val (minTerm, (minC, _)) = buf.minBy { case (t, (c, _)) => (c, t) }
        (buf - minTerm).updated(term, (minC + 1, minC))
    }

  override def merge(b1: Map[String, (Long, Long)], b2: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    val min1 = if (b1.size < capacity) 0L else b1.valuesIterator.map(_._1).min
    val min2 = if (b2.size < capacity) 0L else b2.valuesIterator.map(_._1).min
    val union = (b1.keySet ++ b2.keySet).iterator.map { t =>
      val (c1, e1) = b1.getOrElse(t, (min1, min1))
      val (c2, e2) = b2.getOrElse(t, (min2, min2))
      t -> (c1 + c2, e1 + e2)
    }.toMap
    if (union.size <= capacity) union
    else union.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity).toMap
  }

  override def finish(r: Map[String, (Long, Long)]): Seq[TermCount] =
    r.toSeq.map { case (t, (c, e)) => TermCount(t, c, e) }
      .sortBy(tc => (-tc.count, tc.term))

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder()
}

object HeavyHitters {
  val termCountEncoder: Encoder[TermCount] = Encoders.product[TermCount]
}
