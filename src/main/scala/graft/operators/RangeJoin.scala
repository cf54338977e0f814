package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    // Exact floor division via decimal arithmetic: a plain `/` promotes
    // to double, and beyond 2^53 (e.g. nanosecond epochs) a boundary
    // point can round into a bucket its interval never replicated to —
    // a silently dropped match the BETWEEN refine cannot recover.
    def floorDiv(c: Column): Column =
      floor(c.cast("decimal(38,0)") / lit(bucketWidth)).cast("long")
    val p = points.withColumn("__bucket", floorDiv(col(pointCol)))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floorDiv(col(startCol)), floorDiv(col(endCol)))))
    i.join(p, Seq("__bucket"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
