package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, TermCount}

/** SpaceSaving heavy hitters: exactness when capacity covers the
  * vocabulary, the count/err frequency bounds under eviction, survival
  * of the true heavy term at aggressive capacity, and the bounded-state
  * contract. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed fixture: "hot" appears 300x, "warm" 60x, 40 noise terms 3x
    * each — across multiple partitions so merge() actually runs. */
  private def fixture = {
    val terms =
      Seq.fill(300)("hot") ++ Seq.fill(60)("warm") ++
        (1 to 40).flatMap(i => Seq.fill(3)(f"noise$i%02d"))
    // round-robin repartition interleaves, so every partition sees a mix
    // and the merge path actually runs
    spark.createDataset(terms).repartition(8)
  }

  private def summarize(capacity: Int): Seq[TermCount] = {
    val hh = new HeavyHitters(capacity)
    fixture.select(hh.toColumn).head()
  }

  private lazy val exact: Map[String, Long] =
    fixture.groupBy("value").count().as[(String, Long)].collect().toMap

  test("capacity >= vocabulary: summary is the exact term count, all err zero") {
    val got = summarize(capacity = 1000)
    assert(got.forall(_.err == 0L))
    assert(got.map(tc => tc.term -> tc.count).toMap === exact)
  }

  test("under eviction: count upper-bounds and count-err lower-bounds the true frequency") {
    val got = summarize(capacity = 8)
    assert(got.size <= 8) // bounded state
    for (tc <- got) {
      val f = exact.getOrElse(tc.term, 0L)
      assert(tc.count >= f, s"${tc.term}: count ${tc.count} < true $f")
      assert(tc.count - tc.err <= f, s"${tc.term}: lower bound ${tc.count - tc.err} > true $f")
    }
  }

  test("the dominant term survives aggressive capacity and is guaranteed-heavy") {
    val got = summarize(capacity = 4)
    val hot = got.find(_.term == "hot")
    assert(hot.isDefined, s"hot missing from $got")
    // guaranteed (not just estimated) heavy: its lower bound alone
    // exceeds every other term's upper bound in the summary
    val lb = hot.get.count - hot.get.err
    assert(got.filter(_.term != "hot").forall(_.count < lb))
  }

  test("order insensitivity at full capacity: one partition equals eight") {
    val hh = new HeavyHitters(1000)
    val one = fixture.coalesce(1).select(hh.toColumn).head()
    assert(one.map(tc => tc.term -> tc.count).toMap === exact)
  }

  test("compaction property: bounds hold on a high-cardinality randomized stream") {
    val rnd = new scala.util.Random(7)
    val stream = rnd.shuffle(
      Seq.fill(5000)(s"t${rnd.nextInt(600)}") ++ Seq.fill(800)("hot"))
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = spark.createDataset(stream).repartition(4)
      .select(new HeavyHitters(32).toColumn).head()
    assert(got.size <= 32)
    for (tc <- got) {
      val f = trueCounts.getOrElse(tc.term, 0L)
      assert(tc.count >= f, s"${tc.term}: ${tc.count} < $f")
      assert(tc.count - tc.err <= f, s"${tc.term}: ${tc.count - tc.err} > $f")
    }
    // "hot" (800 arrivals vs ~8 avg for noise) must survive and lead
    assert(got.head.term === "hot")
  }

  test("heavy hitters over a stream: same bounded-state summary, complete mode") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val root = Files.createTempDirectory("graft-shh").toString
    fixture.toDF("term").coalesce(1).write.parquet(s"$root/in/f1")

    val hh = new HeavyHitters(1000)
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$root/in/f1").schema)
      .parquet(s"$root/in/*")
      .as[String]
    val q = stream.select(hh.toColumn).toDF("summary")
      .writeStream.outputMode("complete")
      .format("memory").queryName("shh")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("shh").select(explode(col("summary")).as("tc"))
      .select("tc.term", "tc.count").as[(String, Long)].collect().toMap
    assert(got === exact)
  }
}
