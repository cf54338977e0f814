package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val intervals = Seq(
    (1L, 10L, 20L),   // id, start, end
    (2L, 15L, 35L),   // spans multiple buckets at width 10
    (3L, 40L, 40L))   // degenerate single-point interval
    .toDF("iid", "s", "e")

  private lazy val points = Seq(
    (100L, 10L), (101L, 20L), (102L, 17L), // edges + inside
    (103L, 36L),                            // inside no interval
    (104L, 40L))                            // hits the degenerate one
    .toDF("pid", "p")

  test("inclusive boundaries, multi-bucket intervals, no false matches") {
    val got = RangeJoin.pointInInterval(points, intervals,
        "p", "s", "e", bucketWidth = 10)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 100L), (1L, 101L), (1L, 102L), // 10,20,17 in [10,20]
      (2L, 101L), (2L, 102L),             // 20,17 in [15,35]
      (3L, 104L)))                        // 40 in [40,40]
  }

  test("plans as a shuffled equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        "p", "s", "e", bucketWidth = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bucketing must avoid the nested-loop fallback:\n$plan")
  }

  test("exact bucketing beyond 2^53 (nanosecond-epoch magnitudes)") {
    // base ~1.7e18: double division would misplace boundary buckets
    val base = 1700000000000000000L
    val w = 1000000000L
    val iv = Seq((1L, base, base + w - 1)).toDF("iid", "s", "e")
    val pts = Seq((100L, base), (101L, base + w - 1), (102L, base + w))
      .toDF("pid", "p")
    val got = RangeJoin.pointInInterval(pts, iv, "p", "s", "e", w)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(100L, 101L)) // boundary inclusive, next bucket out
  }

  test("width >> spans still correct (all rows share few buckets)") {
    val got = RangeJoin.pointInInterval(points, intervals,
        "p", "s", "e", bucketWidth = 1000)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    assert(got.size == 6)
  }
}
