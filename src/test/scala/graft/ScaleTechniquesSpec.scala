package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of one hot key + a long tail
  private lazy val skewed = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("key", "v")

  test("salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("key").agg(sum("v").as("total"))
      .as[(String, Double)].collect().toMap
    val salted = Skew.saltedAgg(skewed, Seq("key"), saltFactor = 8,
      partial = sum(col("v")), merge = sum, outName = "total")
      .as[(String, Double)].collect().toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .map(k => (k, s"name_$k")).toDF("key", "name")
    val plain = skewed.join(dim, "key")
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val salted = Skew.saltedJoin(skewed, dim, "key", saltFactor = 8)
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}

/** Bucketing: pre-shuffled table layout so co-located joins plan with no
  * exchange — the storage-side answer to repeated large joins on the
  * same key (SURVEY §7.3's 100 TB posture). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val a = (1L to 2000L).map(i => (i, s"text_$i")).toDF("id", "payload")
    val b = (1L to 2000L).map(i => (i, i * 2.0)).toDF("id", "score")
    spark.sql("DROP TABLE IF EXISTS ba")
    spark.sql("DROP TABLE IF EXISTS bb")
    a.write.bucketBy(8, "id").sortBy("id").saveAsTable("ba")
    b.write.bucketBy(8, "id").sortBy("id").saveAsTable("bb")

    // Shuffles are inserted by EnsureRequirements — visible only in the
    // executed plan, so run the action first. Force sort-merge (a
    // broadcast would bypass bucketing for these tiny tables; at real
    // scale neither side broadcasts).
    val joined = spark.table("ba").hint("merge")
      .join(spark.table("bb").hint("merge"), "id")
    assert(joined.count() == 2000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")

    // contrast: the same sort-merge join on unbucketed data shuffles
    val unbucketed = a.hint("merge").join(b.hint("merge"), "id")
    unbucketed.count()
    assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
  }
}

/** The declarative Bloom filter: never a false negative, sized-FP-rate
  * sanity, and result-identity of the Bloom-gated decontamination. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  import graft.operators.{Bloom, CorpusClean}

  test("no false negatives; false positives within the sized bound") {
    val members = (1 to 200).map(i => s"member_$i").toDF("v")
    val words = Bloom.build(members, "v", mBits = 4096, kHashes = 4)
    assert(words.length == 64)
    val in = members.filter(Bloom.mightContain(col("v"), words)).count()
    assert(in == 200) // every member passes — the structural guarantee
    val nonMembers = (1 to 1000).map(i => s"other_$i").toDF("v")
    val fp = nonMembers.filter(Bloom.mightContain(col("v"), words)).count()
    // theoretical fpr at n=200, m=4096, k=4 is ~0.1%; 5% is generous
    assert(fp <= 50, s"false-positive count $fp out of 1000")
  }

  test("bloom-gated decontamination is result-identical to the exact pass") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    // bench set: halves of some corpus docs (guaranteed overlaps) plus
    // clean text (no overlap)
    val bench = corpus.filter($"doc_id" % 7 === 0)
      .select($"doc_id".as("bid"),
        substring($"text", 1, 120).as("btext"))
      .union(Seq((9999L, "entirely novel benchmark question about nothing"))
        .toDF("bid", "btext"))
    val exact = CorpusClean.decontaminate(
        corpus, "doc_id", "text", bench, "bid", "btext", n = 5)
      .as[(Long, Long)].collect().toMap
    val gated = CorpusClean.decontaminateBloom(
        corpus, "doc_id", "text", bench, "bid", "btext", n = 5,
        mBits = 1 << 16, kHashes = 4)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty)
    assert(gated == exact)
  }
}
