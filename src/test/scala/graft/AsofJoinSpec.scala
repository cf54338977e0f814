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

  // ----- the custom physical operator (AsofJoinNode/Strategy/Exec) -----

  test("native exec matches the window formulation on every edge case") {
    // same fixture as above: unmatched keys, equal-ts inclusive match,
    // tie-break at equal ts, right rows after all left rows
    val want = AsofJoin.latestAtOrBefore(trades, quotes,
        "key", "key", "tts", "qts", Seq("qid", "price"), "qid")
      .orderBy("tid").collect().map(_.toString).toSeq
    val got = AsofJoin.latestAtOrBeforeNative(trades, quotes,
        "key", "key", "tts", "qts", Seq("qid", "price"), "qid")
      .orderBy("tid").collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("native exec: string keys and null right timestamps match the window form") {
    val l = Seq(("doc#1", "2024-01-01 10:00:00", 1L),
                ("doc#2", "2024-01-01 10:00:00", 2L))
      .toDF("key", "ts_s", "tid")
      .select(col("key"), to_timestamp(col("ts_s")).as("tts"), col("tid"))
    val r = Seq(("doc#1", Some("2024-01-01 09:00:00"), 10L),
                ("doc#2", None, 20L))
      .toDF("key", "ts_s", "qid")
      .select(col("key"), to_timestamp(col("ts_s")).as("qts"), col("qid"))
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
                String, String, String, String, Seq[String], String)
              => org.apache.spark.sql.DataFrame) =
      f(l, r, "key", "key", "tts", "qts", Seq("qid"), "qid")
        .orderBy("tid").collect().map(_.toString).toSeq
    assert(run(AsofJoin.latestAtOrBeforeNative) == run(AsofJoin.latestAtOrBefore))
  }

  test("native exec matches on a larger randomized workload (many keys, dup timestamps)") {
    val rnd = new scala.util.Random(99)
    val lRows = (1 to 400).map { i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong * 1000000L, i.toLong)
    }
    val rRows = (1 to 300).map { i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong * 1000000L, i.toLong,
        rnd.nextDouble())
    }
    val l = lRows.toDF("key", "us", "tid")
      .select(col("key"), timestamp_micros(col("us")).as("tts"), col("tid"))
    val r = rRows.toDF("key", "us", "qid", "price")
      .select(col("key"), timestamp_micros(col("us")).as("qts"), col("qid"), col("price"))
    val want = AsofJoin.latestAtOrBefore(l, r, "key", "key", "tts", "qts",
        Seq("qid", "price"), "qid").orderBy("tid").collect().map(_.toString).toSeq
    val got = AsofJoin.latestAtOrBeforeNative(l, r, "key", "key", "tts", "qts",
        Seq("qid", "price"), "qid").orderBy("tid").collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("native exec plan: AsofJoinExec with two exchanges and sorted children") {
    val df = AsofJoin.latestAtOrBeforeNative(trades, quotes,
        "key", "key", "tts", "qts", Seq("qid"), "qid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
    // EnsureRequirements inserted the co-partitioning exchanges + sorts
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("Sort ["), plan)
    // and the exec output resolves: left columns + nullable payload
    assert(df.columns.toSeq == Seq("key", "tts", "tid", "qid"))
  }

  test("native exec: timestamp type mismatch and unknown columns fail fast") {
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.latestAtOrBeforeNative(
        trades, quotes.withColumn("qts", col("qts").cast("long")),
        "key", "key", "tts", "qts", Seq("qid"), "qid")
    }
    assert(e1.getMessage.contains("types differ"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.latestAtOrBeforeNative(trades, quotes,
        "nope", "key", "tts", "qts", Seq("qid"), "qid")
    }
    assert(e2.getMessage.contains("'nope' not found"))
  }
}
