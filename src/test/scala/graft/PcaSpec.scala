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
