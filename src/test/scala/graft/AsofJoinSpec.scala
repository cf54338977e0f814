package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = to_timestamp(lit(s))

  private lazy val quotes = Seq(
    (1L, "2024-01-01 10:00:00", 100L, 9.0),
    (1L, "2024-01-01 10:05:00", 101L, 9.5),
    (1L, "2024-01-01 10:05:00", 102L, 9.7), // same ts: larger id wins
    (2L, "2024-01-01 11:00:00", 200L, 20.0))
    .toDF("key", "ts_s", "qid", "price")
    .select(col("key"), to_timestamp(col("ts_s")).as("qts"), col("qid"), col("price"))

  private lazy val trades = Seq(
    (1L, "2024-01-01 09:59:00", 1000L), // before any quote
    (1L, "2024-01-01 10:05:00", 1001L), // equal ts -> inclusive match
    (1L, "2024-01-01 10:30:00", 1002L), // after all quotes of key 1
    (2L, "2024-01-01 10:59:00", 2000L), // before key 2's only quote
    (3L, "2024-01-01 12:00:00", 3000L)) // key with no quotes at all
    .toDF("key", "ts_s", "tid")
    .select(col("key"), to_timestamp(col("ts_s")).as("tts"), col("tid"))

  test("most recent right row at-or-before, inclusive, tie-broken, null when none") {
    val got = AsofJoin.latestAtOrBefore(trades, quotes,
        leftKey = "key", rightKey = "key", leftTs = "tts", rightTs = "qts",
        payload = Seq("qid", "price"), tieBreak = "qid")
      .select("tid", "qid", "price")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      (1000L, None, None),                  // no quote yet
      (1001L, Some(102L), Some(9.7)),       // equal-ts inclusive + max-qid tie
      (1002L, Some(102L), Some(9.7)),       // latest overall for key 1
      (2000L, None, None),                  // key 2's quote is later
      (3000L, None, None)))                 // unseen key
  }

  test("string keys pass through untyped; null right timestamps never match") {
    val l = Seq(("doc#1", "2024-01-01 10:00:00", 1L),
                ("doc#2", "2024-01-01 10:00:00", 2L))
      .toDF("key", "ts_s", "tid")
      .select(col("key"), to_timestamp(col("ts_s")).as("tts"), col("tid"))
    val r = Seq(("doc#1", Some("2024-01-01 09:00:00"), 10L),
                ("doc#2", None, 20L)) // null ts: must never be carried
      .toDF("key", "ts_s", "qid")
      .select(col("key"), to_timestamp(col("ts_s")).as("qts"), col("qid"))
    val got = AsofJoin.latestAtOrBefore(l, r, "key", "key", "tts", "qts",
        Seq("qid"), "qid")
      .select("tid", "qid")
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSet
    // a long-cast key would have nulled both keys and cross-matched them
    assert(got == Set((1L, Some(10L)), (2L, None)))
  }

  test("one shuffle on the key: no join blowup in the plan") {
    val plan = AsofJoin.latestAtOrBefore(trades, quotes,
        "key", "key", "tts", "qts", Seq("qid"), "qid")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"expected union+window, got:\n$plan")
  }
}
