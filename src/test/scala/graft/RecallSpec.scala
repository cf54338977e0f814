package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Recall of the approximate search paths against the exact-kNN oracle
  * (the reference's own ground truth is exact recompute search,
  * recompute.rs:96-110). Quantifies the nprobe trade: more probed
  * clusters → more data scanned → higher recall. */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)
  private val k = 10
  private val queryIds = Seq(3L, 57L, 123L, 250L, 401L)

  private def topIds(df: DataFrame): Set[Long] =
    df.select("vec_id").as[Long].collect().toSet

  private def recallAt(nprobe: Int): Double = {
    val scores = queryIds.map { q =>
      val exact = topIds(Knn.exactTopK(emb, Knn.queryVector(emb, q), k))
      val approx = topIds(Knn.ivfTopK(emb, Knn.queryVector(emb, q), "label", nprobe, k))
      (exact intersect approx).size.toDouble / k
    }
    scores.sum / scores.size
  }

  test("ivf recall@10 grows with nprobe and reaches 1.0 at full probe") {
    val r2 = recallAt(2)
    val r5 = recallAt(5)
    val r10 = recallAt(10)
    info(f"recall@10: nprobe=2 -> $r2%.2f, nprobe=5 -> $r5%.2f, nprobe=10 -> $r10%.2f")
    assert(r10 == 1.0)                 // probing every cluster = exact
    assert(r5 >= r2 - 1e-9)            // monotone in probed fraction
    assert(r2 > 0.0)                   // even 2/10 clusters finds some
  }

  test("declarative IVF (optimizer rewrite) recall@10 over KMeans clusters") {
    import java.nio.file.Files
    import graft.pipeline.Index
    // Real production path: KMeans layout + the naive declarative plan,
    // pruned by IvfTopKRewrite at the configured nprobe.
    val d = Files.createTempDirectory("graft-recall-ivf").toString + "/idx"
    emb.select(col("vec_id").as("id"), col("embedding"))
      .write.parquet(s"$d/embeddings")
    Index.buildIvf(spark, d, numClusters = 8)
    GraftExtensions.install(spark)

    def declarative(q: Long, nprobe: Int): Set[Long] = {
      spark.conf.set("spark.graft.ivf.nprobe", nprobe.toString)
      try {
        val qv = emb.filter(col("vec_id") === q)
          .select("embedding").head.getSeq[Float](0).toArray
        Index.searchIvfDeclarative(spark, d, qv, k)
          .select("id").as[Long].collect().toSet
      } finally spark.conf.unset("spark.graft.ivf.nprobe")
    }
    def recallAt(nprobe: Int): Double = {
      val scores = queryIds.map { q =>
        val exact = topIds(Knn.exactTopK(emb, Knn.queryVector(emb, q), k))
        (exact intersect declarative(q, nprobe)).size.toDouble / k
      }
      scores.sum / scores.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    info(f"declarative KMeans-IVF recall@10: nprobe=2 -> $r2%.2f, nprobe=8 -> $r8%.2f")
    // HARD regression gate (r6 VERDICT): the KMeans layout has measured
    // recall@10 = 1.0 at nprobe 2/8 since round 2 — an IVF/PQ change
    // that trades recall for speed must fail here, not ship silently.
    assert(r2 >= 0.9,
      f"KMeans-IVF recall@10 at nprobe=2 regressed to $r2%.2f (gate: 0.9)")
    assert(r8 == 1.0)       // probing all clusters recovers exact
    // The gate is sensitive: an intentionally bad layout (random label
    // blocking, no cluster structure) measures well below it at the
    // same probe fraction — so a layout regression cannot hide.
    val degraded = queryIds.map { q =>
      val exact = topIds(Knn.exactTopK(emb, Knn.queryVector(emb, q), k))
      val approx = topIds(Knn.ivfTopK(emb, Knn.queryVector(emb, q), "label", 2, k))
      (exact intersect approx).size.toDouble / k
    }.sum / queryIds.size
    info(f"induced-drop check (random-label layout, nprobe=2): $degraded%.2f")
    assert(degraded < 0.9, "the degraded layout should fail the gate")
  }

  test("PQ tier recall@10: 1.0 at full knobs, floor at production knobs, gate is sensitive") {
    import graft.operators.Pq
    val trainedCb = Pq.trainCodebooks(emb, "embedding", m = 8, k = 16, seed = 42L)
    val assigned = Knn.ivfAssign(emb, "embedding", numClusters = 8, seed = 1L)
    def vecOf(id: Long): Array[Double] =
      emb.filter(col("vec_id") === id)
        .select(graft.functions.VectorFunctions.asDouble(col("embedding")))
        .head.getSeq[Double](0).toArray
    def recall(nprobe: Int, rerank: Int): Double = {
      val per = queryIds.map { qid =>
        val exact = topIds(Knn.exactTopK(emb, Knn.queryVector(emb, qid), k))
        val got = topIds(Pq.ivfPqSearch(assigned, "vec_id", "embedding",
          "centroid_id", trainedCb, vecOf(qid), nprobe = nprobe, k = k, rerank = rerank))
        (exact intersect got).size.toDouble / k
      }
      per.sum / per.size
    }
    // Full knobs (probe every cluster, re-rank the whole corpus): the
    // ladder's contract is EXACT equality with brute force — a codebook
    // or ADC change that breaks this trades recall silently.
    val full = recall(nprobe = 8, rerank = 1000)
    assert(full == 1.0, f"PQ full-knob recall@10 = $full%.2f, must be exactly 1.0")
    // Production rerank knob (top-100 of 500 re-ranked exactly), full
    // probe so the measurement isolates CODEBOOK/ADC quality from IVF
    // probing loss (probing recall is gated by the IVF tests above; on
    // this synthetic data neighbors spread across clusters, so nprobe<8
    // mostly measures the layout, not the quantizer).
    val prod = recall(nprobe = 8, rerank = 100)
    val probed = recall(nprobe = 4, rerank = 100)
    info(f"PQ recall@10 at rerank=100: nprobe=8 -> $prod%.2f, nprobe=4 -> $probed%.2f (full=$full%.2f)")
    // Measured 0.80 with the seeded trained codebooks (deterministic —
    // seeds pin the value); gate just below, far above the ~0.2-0.4
    // level a broken codebook/ADC change produces.
    assert(prod >= 0.75,
      f"PQ production-knob recall@10 regressed to $prod%.2f (gate: 0.75)")
    // Sensitivity: ADC-only ranking (rerank=k — no exact re-rank slack)
    // measures below the gate, so a regression cannot hide in it.
    val induced = recall(nprobe = 8, rerank = k)
    info(f"induced-drop check (ADC-only, rerank=k): $induced%.2f")
    assert(induced < 0.75, "the ADC-only degradation should fail the gate")
  }

  test("Hamming tier recall@10: 1.0 at full rerank, floor at production knobs, gate is sensitive") {
    def vecOf(id: Long): Array[Double] =
      emb.filter(col("vec_id") === id)
        .select(graft.functions.VectorFunctions.asDouble(col("embedding")))
        .head.getSeq[Double](0).toArray
    def recall(rerank: Int): Double = {
      val per = queryIds.map { qid =>
        val exact = topIds(Knn.exactTopK(emb, Knn.queryVector(emb, qid), k))
        val got = topIds(Knn.hammingTopK(emb, vecOf(qid), dims = 64, k = k, rerank = rerank))
        (exact intersect got).size.toDouble / k
      }
      per.sum / per.size
    }
    // rerank covering the corpus = exact search, by construction.
    val full = recall(rerank = 1000)
    assert(full == 1.0, f"Hamming full-rerank recall@10 = $full%.2f, must be exactly 1.0")
    // Production knobs: the headline knn_hamming query runs rerank=50
    // (SparkEntry). The 1-bit sketch keeps a real share of the true
    // top-10 in its top-50 — gate the measured level so a sketch change
    // (word packing, sign threshold) can't silently trade recall.
    val prod = recall(rerank = 50)
    info(f"Hamming recall@10 at rerank=50 = $prod%.2f (full=$full%.2f)")
    assert(prod >= 0.4,
      f"Hamming production-knob recall@10 regressed to $prod%.2f (gate: 0.4)")
    // Sensitivity: no re-rank slack (rerank=k) ranks by the 1-bit
    // sketch alone and measures below the gate.
    val induced = recall(rerank = k)
    info(f"induced-drop check (sketch-only, rerank=k): $induced%.2f")
    assert(induced < prod, "sketch-only ranking should measure below the production knobs")
  }

  test("quantized search recall@10 vs exact is near-perfect") {
    import graft.functions.VectorFunctions._
    val dq = emb
      .select(col("vec_id"), quantizeInt8(col("embedding")).as("q"))
      .select(col("vec_id"), dequantizeInt8(col("q")).as("embedding"))
    val scores = queryIds.map { q =>
      val exact = topIds(Knn.exactTopK(emb, Knn.queryVector(emb, q), k))
      val qv = Knn.queryVector(emb, q)
      val approx = topIds(
        dq.crossJoin(broadcast(qv))
          .select(col("vec_id"), round(dot(col("embedding"), col("qv")), 6).as("score"))
          .orderBy(desc("score"), col("vec_id")).limit(k))
      (exact intersect approx).size.toDouble / k
    }
    val recall = scores.sum / scores.size
    info(f"int8 recall@10 = $recall%.2f")
    assert(recall >= 0.8)
  }
}
