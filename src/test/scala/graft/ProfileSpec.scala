package graft

import org.apache.spark.sql.functions.{col, countDistinct}

import graft.operators.Profile

/** The sketch tier must track the exact tier within its advertised
  * error bounds — checked on real testdata (sf0.001 documents). */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("exact percentiles: interpolated, per-language, ordered") {
    val rows = Profile.exactPercentiles(docs)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    rows.foreach { case (_, n, p50, p95) =>
      assert(n > 0 && p50 <= p95)
    }
  }

  test("sketch profile bounds: HLL within 5%, quantiles rank-correct") {
    val exactDistinct = docs
      .select(col("lang"), graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      .groupBy("lang").agg(countDistinct("fp").as("d"))
      .as[(String, Long)].collect().toMap
    val exactP = Profile.exactPercentiles(docs)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap

    val sketch = Profile.corpusProfile(docs).collect()
    assert(sketch.nonEmpty)
    sketch.foreach { r =>
      val lang = r.getString(0)
      val approx = r.getLong(2)
      val exact = exactDistinct(lang)
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"$lang: HLL $approx vs exact $exact")
      // approximate quantiles are actual data elements within the exact
      // interpolated neighborhood (generous rank tolerance)
      val (e50, e95) = exactP(lang)
      val p50 = r.getLong(3).toDouble
      val p95 = r.getLong(4).toDouble
      assert(p50 <= p95)
      assert(math.abs(p50 - e50) <= math.max(2.0, e50 * 0.05), s"$lang p50 $p50 vs $e50")
      assert(math.abs(p95 - e95) <= math.max(2.0, e95 * 0.05), s"$lang p95 $p95 vs $e95")
    }
  }
}
