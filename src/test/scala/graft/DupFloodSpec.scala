package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{asDouble, dot, l2Norm}
import graft.operators.{Dedup, Graph, Knn}

/** Equivalence of the duplicate-flood-proof (identical-vector class
  * collapse) formulations against naive id-level references, on a
  * fixture where every third vector is mirrored 5x — the crawl-scale
  * failure mode the collapse exists for. The production operators must
  * return EXACTLY what the id-level plans return (same candidates, same
  * rounded scores, same tie-breaks); only their pair mass differs.
  */
class DupFloodSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** sf0.001 embeddings with every (vec_id % 3 == 0) vector replicated
    * 5x under fresh ids: a mix of hot classes (m=5) and singletons. */
  private lazy val flooded: DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val copies = emb.filter(col("vec_id") % 3 === 0)
      .crossJoin(spark.range(1, 5).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 1000L).as("vec_id"),
        col("embedding"), col("label"))
    emb.union(copies)
  }

  // ---- naive id-level references (the pre-collapse formulations) ----

  private def naiveTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("id").orderBy(desc("score"), col("nb"))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("id", "nb", "rnk", "score")
  }

  private def naiveKnnGraphLsh(emb: DataFrame, k: Int, dims: Int,
                               bits: Int, tables: Int): DataFrame = {
    val base = emb.select(col("vec_id").cast("long").as("id"),
      asDouble(col("embedding")).as("v"))
      .where(col("id").isNotNull && col("v").isNotNull &&
        dot(col("v"), col("v")) > 0)
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val candidates = (0 until tables).map { t =>
      val keyed = base.select(col("id"),
        Knn.signLshKey(col("v"), dims, bits, seed = 1000L + t).as("bkt"))
      keyed.join(keyed.select(col("id").as("nb"), col("bkt")), "bkt")
        .filter(col("id") =!= col("nb"))
        .select("id", "nb")
    }.reduce(_ union _).dropDuplicates("id", "nb")
    val scored = candidates
      .join(base.select(col("id"), col("v").as("va"), col("n").as("na")), "id")
      .join(base.select(col("id").as("nb"), col("v").as("vb"),
        col("n").as("nb_n")), "nb")
      .select(col("id"), col("nb"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb_n")), 6)
          .as("score"))
    naiveTopK(scored, k)
  }

  private def naiveLshPairs(emb: DataFrame, dims: Int, bits: Int,
                            minCosine: Double): DataFrame = {
    val keyed = emb.select(col("vec_id").as("id"),
      asDouble(col("embedding")).as("v"),
      Knn.signLshKey(col("embedding"), dims, bits).as("bucket"))
      .withColumn("n", l2Norm(col("v")))
    val a = keyed.select(col("bucket"), col("id").as("id_a"),
      col("v").as("v_a"), col("n").as("n_a"))
    val b = keyed.select(col("bucket"), col("id").as("id_b"),
      col("v").as("v_b"), col("n").as("n_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6)
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  private def naiveTopPairs(emb: DataFrame, topN: Int): DataFrame = {
    val a = emb.select(col("label").as("blk"), col("vec_id").as("id_a"),
      asDouble(col("embedding")).as("v_a"))
      .withColumn("n_a", l2Norm(col("v_a")))
    val b = emb.select(col("label").as("blk"), col("vec_id").as("id_b"),
      asDouble(col("embedding")).as("v_b"))
      .withColumn("n_b", l2Norm(col("v_b")))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")), 6)
          .as("cosine"))
      .orderBy(desc("cosine"), col("id_a"), col("id_b"))
      .limit(topN)
  }

  private def naiveHardNegatives(anchors: DataFrame, cands: DataFrame,
                                 k: Int, blk: Option[String]): DataFrame = {
    def prep(df: DataFrame, sfx: String) =
      df.select(col("vec_id").cast("long").as(s"id$sfx"),
        col("label").as(s"lbl$sfx"),
        asDouble(col("embedding")).as(s"v$sfx"),
        blk.map(col).getOrElse(lit(0)).as("blk"))
        .withColumn(s"n$sfx", l2Norm(col(s"v$sfx")))
    val scored = prep(anchors, "_a").join(prep(cands, "_c"), "blk")
      .filter(col("lbl_a") =!= col("lbl_c"))
      .select(col("id_a").as("id"), col("id_c").as("nb"),
        round(dot(col("v_a"), col("v_c")) / (col("n_a") * col("n_c")), 6)
          .as("score"))
    naiveTopK(scored, k)
      .select(col("id"), col("rnk").as("rank"), col("nb").as("neg_id"),
        col("score").as("cosine"))
  }

  // ---- parity on the flooded fixture ----

  test("knnGraphLsh class collapse == id-level formulation under duplicate flood") {
    val got = Graph.knnGraphLsh(flooded, "vec_id", "embedding", k = 3,
        dims = 64, bits = 4, tables = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    val want = naiveKnnGraphLsh(flooded, k = 3, dims = 64, bits = 4,
        tables = 8)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == want,
      s"only-got ${(got -- want).take(5)} only-want ${(want -- got).take(5)}")
    // the flood actually exercised multi-member classes: copies appear
    // as rank-1 neighbors at self-cosine
    assert(got.exists { case (id, nb, _, s) => id % 1000 == nb % 1000 && s == 1.0 })
  }

  test("embeddingLshPairs class collapse == id-level formulation under duplicate flood") {
    val got = Dedup.embeddingLshPairs(flooded, "vec_id", "embedding",
        dims = 64, bits = 8, minCosine = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val want = naiveLshPairs(flooded, dims = 64, bits = 8, minCosine = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want,
      s"only-got ${(got -- want).take(5)} only-want ${(want -- got).take(5)}")
    assert(got.exists(_._3 == 1.0), "flood must surface exact-dup pairs")
  }

  test("embeddingTopPairs class collapse == id-level formulation under duplicate flood") {
    val got = Dedup.embeddingTopPairs(flooded, "vec_id", "embedding",
        "label", topN = 25)
      .as[(Long, Long, Double)].collect().toSeq
    val want = naiveTopPairs(flooded, topN = 25)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == want, s"got $got\nwant $want") // ordered compare: same ranking
  }

  test("embeddingTopPairs null blocks coalesce into one sentinel block (not dropped)") {
    // Parity: null block values behave as one distinct block
    // (Knn.blockKey sentinel) instead of dropping out of the blk joins.
    def blk(v: org.apache.spark.sql.Column) =
      when(col("vec_id") % 2 === 0, lit("a")).otherwise(v)
    def run(v: org.apache.spark.sql.Column) =
      Dedup.embeddingTopPairs(flooded.withColumn("b2", blk(v)),
          "vec_id", "embedding", "b2", topN = 25)
        .as[(Long, Long, Double)].collect().toSeq
    val gotNull = run(lit(null))
    assert(gotNull == run(lit("zz")))
    assert(gotNull.nonEmpty)
  }

  test("hardNegatives class collapse == id-level formulation under duplicate flood") {
    val anchors = flooded.filter(col("vec_id") % 20 === 0)
    val got = Knn.hardNegatives(anchors, flooded, "vec_id", "embedding",
        "label", k = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val want = naiveHardNegatives(anchors, flooded, k = 5, blk = None)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got == want,
      s"only-got ${(got -- want).take(5)} only-want ${(want -- got).take(5)}")
    // blocked tier parity too; the block key keeps a vector's copies in
    // the SAME block (mod on the original id), so multi-member classes
    // exist inside blocks
    val blocked = flooded.withColumn("blkc", pmod(col("vec_id") % 1000, lit(7)))
    val anchorsB = blocked.filter(col("vec_id") % 20 === 0)
    val gotB = Knn.hardNegatives(anchorsB, blocked, "vec_id", "embedding",
        "label", k = 5, blockCol = Some("blkc"))
      .as[(Long, Int, Long, Double)].collect().toSet
    val wantB = naiveHardNegatives(anchorsB, blocked, k = 5,
        blk = Some("blkc"))
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(gotB == wantB,
      s"only-got ${(gotB -- wantB).take(5)} only-want ${(wantB -- gotB).take(5)}")
  }
}
