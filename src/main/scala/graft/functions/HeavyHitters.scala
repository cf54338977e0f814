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
  * a 100 TB corpus with bounded counters of state per task instead of a
  * full term shuffle.
  *
  * Why not `groupBy(term).count.orderBy.limit(k)`? That plan shuffles
  * every distinct term (a web-scale corpus has billions) to get back the
  * top 100. This Aggregator keeps a capped counter map per map task,
  * then merges summaries associatively: the exchange carries
  * O(tasks × capacity) rows, corpus-size-independent.
  *
  * Eviction is the lazy-compaction variant: the buffer grows to
  * 2×capacity, then one O(B log B) compaction keeps the `capacity`
  * largest and raises a `floor` offset to the largest dropped count —
  * amortized O(log capacity) per novel term where the textbook
  * evict-the-minimum is O(capacity) with a Map buffer (the canonical
  * Stream-Summary list gets O(1), at the price of a buffer Spark can't
  * encode cheaply). Novel terms enter at `(floor + 1, floor)`: the
  * floor upper-bounds the count any evicted term had when dropped, so
  * `count` stays an upper bound on the true frequency and
  * `count - err` a lower bound — the exact invariants of strict
  * SpaceSaving, just with a slightly looser err.
  *
  * Merge (the mergeable-summaries construction, Agarwal et al. 2012):
  * a term absent from a summary contributes that summary's floor
  * (what an evicted counter could have held; 0 for a never-compacted
  * summary = genuinely unseen); sum the per-side bounds, keep the
  * `capacity` largest, and add the floors.
  *
  * Exactness contract (what the DuckDB oracle checks): while every
  * task's distinct-term count stays <= capacity, no compaction happens,
  * every floor is 0, every err is 0, and the summary IS the exact term
  * count — so the `corpus_top_terms` query (capacity >> vocabulary) is
  * hash-checked, and the approximation regime (compaction, error
  * bounds, guaranteed-heavy detection) is pinned in HeavyHittersSpec.
  */
final class HeavyHitters(capacity: Int)
    extends Aggregator[String, (Map[String, (Long, Long)], Long), Seq[TermCount]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  /** Buffer = (counters, floor): floor upper-bounds every count this
    * summary has ever evicted. */
  type Buf = (Map[String, (Long, Long)], Long)

  override def zero: Buf = (Map.empty, 0L)

  override def reduce(buf: Buf, term: String): Buf = {
    val (m, floor) = buf
    m.get(term) match {
      case Some((c, e)) => (m.updated(term, (c + 1, e)), floor)
      case None =>
        val grown = m.updated(term, (floor + 1, floor))
        if (grown.size <= capacity * 2) (grown, floor)
        else compact(grown, floor)
    }
  }

  /** Keep the `capacity` largest counters; the floor rises to the
    * largest dropped count (every dropped counter upper-bounded its
    * term's true frequency, so the new floor still does). */
  private def compact(m: Map[String, (Long, Long)], floor: Long): Buf = {
    val sorted = m.toSeq.sortBy { case (t, (c, _)) => (-c, t) }
    val dropped = sorted.drop(capacity)
    val newFloor =
      if (dropped.isEmpty) floor
      else math.max(floor, dropped.iterator.map(_._2._1).max)
    (sorted.take(capacity).toMap, newFloor)
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val (m1, f1) = b1
    val (m2, f2) = b2
    val union = (m1.keySet ++ m2.keySet).iterator.map { t =>
      val (c1, e1) = m1.getOrElse(t, (f1, f1))
      val (c2, e2) = m2.getOrElse(t, (f2, f2))
      t -> (c1 + c2, e1 + e2)
    }.toMap
    if (union.size <= capacity) (union, f1 + f2)
    else compact(union, f1 + f2)
  }

  override def finish(r: Buf): Seq[TermCount] = {
    val (m, _) = compact(r._1, r._2)
    m.toSeq.map { case (t, (c, e)) => TermCount(t, c, e) }
      .sortBy(tc => (-tc.count, tc.term))
  }

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TermCount]] = ExpressionEncoder()
}

object HeavyHitters {
  val termCountEncoder: Encoder[TermCount] = Encoders.product[TermCount]
}
