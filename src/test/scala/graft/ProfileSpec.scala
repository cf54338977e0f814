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

  test("tokenDivergence: zero for corpus-proportional slices, ln2 for disjoint halves") {
    import spark.implicits._
    // both slices have the corpus distribution → KL exactly 0
    val even = Seq((1L, "aa bb", "s1"), (2L, "aa bb", "s2"))
      .toDF("doc_id", "text", "source")
    val kl0 = Profile.tokenDivergence(even, "source", "text")
      .select("slice", "kl_vs_corpus").as[(String, Double)].collect().toMap
    assert(kl0 == Map("s1" -> 0.0, "s2" -> 0.0))
    // disjoint vocabularies, equal mass: each slice is twice as
    // concentrated as the corpus → KL = ln 2 per slice
    val skew = Seq((1L, "aa aa", "s1"), (2L, "bb bb", "s2"))
      .toDF("doc_id", "text", "source")
    val kl2 = Profile.tokenDivergence(skew, "source", "text")
      .select("slice", "kl_vs_corpus").as[(String, Double)].collect().toMap
    val ln2 = math.round(math.log(2.0) * 1e6) / 1e6
    assert(kl2 == Map("s1" -> ln2, "s2" -> ln2))
  }

  test("tokenDivergence on real docs: non-negative KL, token mass conserved") {
    val out = Profile.tokenDivergence(docs, "source", "text")
      .as[(String, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (s, terms, toks, kl) =>
      assert(kl >= 0.0, s"$s: KL $kl")
      assert(terms > 0 && toks >= terms)
    }
  }

  test("embeddingDrift: single slice drifts zero; hand-computed two-slice axes") {
    // one slice: its centroid IS the corpus centroid
    val one = Seq((1L, "a", Seq(1.0f, 2.0f)), (2L, "a", Seq(3.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
    val z = Profile.embeddingDrift(one, "label", "embedding")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(z == Seq(("a", 2L, 0.0, 1.0)))
    // axis-aligned slices: centroids (1,0) and (0,1), corpus (0.5,0.5);
    // L2 = sqrt(0.5^2 + 0.5^2), cosine = 0.5 / (1 * sqrt(0.5))
    val two = Seq((1L, "a", Seq(1.0f, 0.0f)), (2L, "b", Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val d = Profile.embeddingDrift(two, "label", "embedding")
      .as[(String, Long, Double, Double)].collect()
      .map { case (s, n, l2, cos) => s -> ((n, l2, cos)) }.toMap
    val r6 = (x: Double) => math.round(x * 1e6) / 1e6
    assert(d("a") == ((1L, r6(math.sqrt(0.5 * 0.5 * 2)), r6(0.5 / math.sqrt(0.5)))))
    assert(d("b") == d("a").copy()) // symmetric by construction
  }

  test("sourceScorecard: hand-computed dup pressure and pass rates per source") {
    // T1 passes gopher at minWords=3 (11 words, mean len in range, all
    // alphabetic, zero symbols, 3 stopword hits); the '#' doc fails
    // alpha + symbol + stops
    val t1 = "the quick brown fox and the lazy dog ran far away"
    val t2 = "a small red hen sat on the old stone wall today"
    val t3 = "we walked to the market and bought some fresh bread there"
    val docs = Seq(
      (1L, t1, "en", "A", t1.length.toLong),
      (2L, t1, "en", "A", t1.length.toLong), // exact dup of doc 1
      (3L, "#### #### ####", "en", "A", 14L),
      (4L, t2, "en", "B", t2.length.toLong),
      (5L, t3, "en", "B", t3.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Profile.sourceScorecard(docs, minWords = 3)
      .as[(String, Long, Long, Double, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = rows("A")
    assert(a._2 == 3L && a._5 == 2L && a._6 == 1L) // docs, distinct, dup
    assert(a._7 == math.round(1.0 / 3.0 * 1e6) / 1e6) // dup_rate
    assert(a._8 == math.round(2.0 / 3.0 * 1e6) / 1e6) // pass rate (doc 3 fails)
    assert(a._3 == 2 * t1.length + 14) // total_chars
    val b = rows("B")
    assert(b._2 == 2L && b._5 == 2L && b._6 == 0L && b._7 == 0.0 && b._8 == 1.0)
    // source rollup is ordered
    assert(Profile.sourceScorecard(docs, minWords = 3)
      .select("source").as[String].collect().toSeq == Seq("A", "B"))
  }
}
