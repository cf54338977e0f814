package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("recovers the dominant axis of an anisotropic cloud") {
    // points spread along (1,1)/sqrt(2) with small orthogonal noise
    val pts = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val n = ((i * 37) % 11 - 5) / 50.0
      (i.toLong, Seq(t + n, t - n))
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(pts, "embedding", numComponents = 2)
    val e1 = m.components(0)
    assert(math.abs(math.abs(dot(e1, Array(1 / math.sqrt(2), 1 / math.sqrt(2)))) - 1.0) < 0.01,
      s"e1 ${e1.toSeq} not aligned with the diagonal")
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1))
  }

  test("components are orthonormal up to rounding; eigenvalues ordered") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Pca.fit(emb, "embedding", numComponents = 2)
    val Array(e1, e2) = m.components
    assert(math.abs(dot(e1, e1) - 1.0) < 1e-4)
    assert(math.abs(dot(e2, e2) - 1.0) < 1e-4)
    assert(math.abs(dot(e1, e2)) < 1e-3)
    assert(m.eigenvalues(0) >= m.eigenvalues(1))
    // sign pin: first non-tiny component positive
    assert(e1(e1.indexWhere(x => math.abs(x) > 1e-12)) > 0)
  }

  test("partitioning does not change the fit (map-side merge correctness)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Pca.fit(emb.repartition(1), "embedding")
    val b = Pca.fit(emb.repartition(13), "embedding")
    // all quantities re-quantized to 6 decimals -> bit-equal across layouts
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
  }

  test("two-stage retrieval through the reduced space: candidates + exact re-rank") {
    // The compression-ladder use: score candidates in the m-dim PCA
    // space (m << d bytes scanned), exact re-rank the shortlist. On
    // synthetic near-flat-spectrum embeddings 16/64 components hold
    // only ~a quarter of the variance, so the reduced space alone is a
    // WEAK ranker — the point of the measurement: the two-stage
    // formulation recovers exact top-k once the shortlist is generous,
    // and the spec pins how generous it must be here (fetch 100 of 500
    // -> recall >= 0.8; fetch all -> exactly 1.0 by construction).
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Pca.fit(emb, "embedding", numComponents = 16, powerIters = 40)
    val reduced = Pca.transform(emb, "vec_id", "embedding", m)
    val pcCols = (1 to 16).map(i => col(s"pc$i"))
    val q = emb.filter($"vec_id" === 7L)
      .select(graft.functions.VectorFunctions.asDouble($"embedding")).head().getSeq[Double](0)
    val qc = q.toArray.zip(m.mean).map { case (v, mu) => v - mu }
    val qProj = m.components.map(e => dot(qc, e))
    val scoreRed = pcCols.zip(qProj).map { case (c, w) => c * lit(w) }.reduce(_ + _)
    def exactTop(k: Int): Seq[Long] =
      emb.select($"vec_id",
          graft.functions.VectorFunctions.dot($"embedding",
            typedLit(q)).as("s"))
        .orderBy(desc("s"), $"vec_id").limit(k).as[(Long, Double)]
        .collect().map(_._1).toSeq
    val exact = exactTop(10).toSet
    def twoStage(fetch: Int): Set[Long] = {
      val cands = reduced.select($"vec_id".as("cid"), scoreRed.as("s"))
        .orderBy(desc("s"), $"cid").limit(fetch).select("cid")
      emb.join(cands, emb("vec_id") === cands("cid"))
        .select($"vec_id",
          graft.functions.VectorFunctions.dot($"embedding", typedLit(q)).as("s"))
        .orderBy(desc("s"), $"vec_id").limit(10)
        .as[(Long, Double)].collect().map(_._1).toSet
    }
    val r100 = (twoStage(100) & exact).size / 10.0
    assert(r100 >= 0.8, s"recall@10 with fetch=100 was $r100")
    assert(twoStage(500) == exact) // full fetch = exact by construction
  }

  test("transform projects onto the components, centered") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val m = Pca.fit(emb, "embedding")
    val out = Pca.transform(emb, "vec_id", "embedding", m)
      .orderBy("vec_id").limit(5)
      .as[(Long, Double, Double)].collect()
    val raw = emb.orderBy("vec_id").limit(5)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    out.foreach { case (id, pc1, pc2) =>
      val c = raw(id).toArray.zip(m.mean).map { case (v, mu) => v - mu }
      assert(math.abs(pc1 - dot(c, m.components(0))) < 1e-5)
      assert(math.abs(pc2 - dot(c, m.components(1))) < 1e-5)
    }
    // projections average ~0 (centered data)
    val means = Pca.transform(emb, "vec_id", "embedding", m)
      .agg(avg("pc1"), avg("pc2")).as[(Double, Double)].head()
    assert(math.abs(means._1) < 1e-3 && math.abs(means._2) < 1e-3)
  }
}
