package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join via bucketing.
  *
  * Spark plans a raw `point BETWEEN start AND end` theta-join as a
  * BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons and
  * a broadcast of a whole side, which collapses at scale. Bucketing
  * turns it into an ordinary shuffled equi-join: the range dimension is
  * divided into fixed-width buckets, each interval is replicated to the
  * buckets it touches (ceil(span/width)+1 rows — bounded when width ≈
  * typical span), each point lands in exactly one, and the precise
  * BETWEEN predicate refines the bucket matches. Same pattern as a
  * spatial grid join; at 100 TB this is the difference between a
  * shuffle join and a nested loop.
  */
object RangeJoin {

  /** All (interval ⨝ point) pairs with
    * `startCol <= pointCol <= endCol` (inclusive both ends). The three
    * range columns must be numeric in the same units (cast timestamps
    * with `unix_micros` first); output carries both sides' columns, so
    * their names must not collide. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    i.join(p, Seq("__bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
