package graft.serve

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.embedding.EmbeddingProvider
import graft.pipeline.Index

/** Driver-resident warm serving tier — the per-request LATENCY answer
  * to the reference's in-process index walk (`src/index/searcher.rs`:
  * the whole HNSW lives in one process's RAM and a query is a few
  * thousand distance evaluations, no scheduler in the path). The
  * batch-parity [[graft.pipeline.Index.search]] plan is correct but
  * pays Spark's per-job floor (~100s of ms) per request; this tier
  * loads the index ONCE into driver arrays and serves each request
  * with zero Spark jobs:
  *
  *   - centroid ranking is a driver-side loop over the (<= C, dims)
  *     centroid matrix (the same rank-then-prune [[Index.searchIvf]]
  *     runs as a plan),
  *   - the nprobe winning buckets are scanned in-process (flat-major
  *     float arrays, one fused multiply-add loop per vector),
  *   - passages resolve from a driver HashMap.
  *
  * Parity is EXACT, not approximate-by-reimplementation: scores are
  * the same left-to-right Double summation as the codegen'd
  * [[graft.functions.expressions.DotProduct]] with the same
  * `round(_, 6)` (java BigDecimal.valueOf — Spark's Round semantics
  * for doubles) and the same (score desc, id asc) tie-break, so at
  * `nprobe >= numClusters` (or a flat layout) the results equal
  * [[Index.search]]'s non-hybrid unfiltered path row for row —
  * ServerSpec pins that equality through the HTTP surface.
  *
  * This is deliberately a BOUNDED tier, the reference's own regime (a
  * RAM-resident single-node index): [[WarmIndex.load]] refuses
  * loudly above `maxVectors` instead of silently OOMing the driver —
  * indexes past the bound stay on the Spark path, which scales with
  * the cluster. Loading pays one Spark collect of the embeddings +
  * passages tables; every request after is scheduler-free. */
final class WarmIndex private (
    val dims: Int,
    centroids: Array[Array[Double]],
    bucketIds: Array[Array[String]],
    bucketVecs: Array[Array[Float]],
    passages: java.util.HashMap[String, Array[String]],
    provider: EmbeddingProvider,
    template: String) {

  def numClusters: Int = bucketIds.length
  def numVectors: Int = bucketIds.iterator.map(_.length).sum

  // Spark Round semantics for DoubleType: BigDecimal.valueOf (the
  // Double.toString form, NOT the DECIMAL128 constructor) + HALF_UP
  private def round6(v: Double): Double =
    JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  /** Exact top-k over the probed buckets; `nprobe >= numClusters`
    * (default) scans everything = [[Index.search]] parity. */
  def search(query: String, topK: Int = 5,
             nprobe: Int = Int.MaxValue): Seq[(String, Double, String, String)] = {
    val qv = provider.embedWithTemplate(Seq(query), template).head
      .map(_.toDouble)
    require(qv.length == dims,
      s"query embedding dims ${qv.length} != index dims $dims")
    val probe: Seq[Int] =
      if (nprobe >= numClusters || centroids.isEmpty) bucketIds.indices
      else {
        // rank centroids by dot desc, centroid id ascending on ties —
        // the searchIvf ordering
        bucketIds.indices
          .map { c =>
            var s = 0.0; var i = 0
            val cv = centroids(c)
            while (i < dims) { s += cv(i) * qv(i); i += 1 }
            (c, s)
          }
          .sortBy { case (c, s) => (-s, c) }
          .take(nprobe).map(_._1)
      }
    // k-bounded heap: root = the worst kept row; "better" = higher
    // score, ties to the SMALLER id (so the root comparator is the
    // reverse)
    val ord = new java.util.Comparator[(String, Double)] {
      def compare(a: (String, Double), b: (String, Double)): Int = {
        val c = java.lang.Double.compare(a._2, b._2)
        if (c != 0) c else b._1.compareTo(a._1)
      }
    }
    val heap = new java.util.PriorityQueue[(String, Double)](topK max 1, ord)
    probe.foreach { c =>
      val ids = bucketIds(c)
      val vecs = bucketVecs(c)
      var r = 0
      while (r < ids.length) {
        var s = 0.0
        var i = 0
        val base = r * dims
        while (i < dims) { s += vecs(base + i).toDouble * qv(i); i += 1 }
        val scored = (ids(r), round6(s))
        if (heap.size < topK) heap.add(scored)
        else if (ord.compare(scored, heap.peek()) > 0) {
          heap.poll(); heap.add(scored)
        }
        r += 1
      }
    }
    val out = new Array[(String, Double)](heap.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 }
    out.toSeq.map { case (id, score) =>
      val p = passages.get(id)
      if (p == null) (id, score, "", "")
      else (id, score, p(0), p(1))
    }
  }
}

object WarmIndex {

  /** Load an index's layout into driver memory. Prefers the
    * cluster-partitioned `embeddings_ivf` + `centroids` pair (so
    * `nprobe` prunes buckets exactly as [[Index.searchIvf]]'s
    * partition filter does); a plain `embeddings` table loads as one
    * flat bucket (every search is the exact scan). Refuses loudly
    * above `maxVectors` — the driver-RAM budget is this tier's
    * contract, and silently OOMing a serving driver is worse than
    * falling back to the Spark path. */
  def load(spark: SparkSession, dir: String, provider: EmbeddingProvider,
           maxVectors: Int = 1000000): WarmIndex = {
    val meta = Index.readMeta(dir)
    val hasIvf = new java.io.File(s"$dir/embeddings_ivf").exists()
    val embPath = if (hasIvf) s"$dir/embeddings_ivf" else s"$dir/embeddings"
    require(new java.io.File(embPath).exists(),
      s"warm serving needs a persisted embeddings table under $dir " +
        "(recompute-on-read indexes stay on the Spark path)")
    val emb = spark.read.parquet(embPath)
    val n = emb.count()
    require(n <= maxVectors,
      s"warm serving tier is driver-RAM-bounded: index has $n vectors > " +
        s"maxVectors $maxVectors — serve it on the Spark path or raise " +
        "the bound against your driver memory deliberately")
    val rows = (if (hasIvf)
        emb.select(col("centroid_id").cast("int"), col("id").cast("string"),
          col("embedding"))
      else
        emb.select(org.apache.spark.sql.functions.lit(0).as("centroid_id"),
          col("id").cast("string"), col("embedding")))
      .collect()
    require(rows.nonEmpty, s"empty embeddings table under $dir")
    val dims = rows.head.getSeq[Float](2).length
    val byCluster = rows.groupBy(_.getInt(0))
    val clusterIdx = byCluster.keys.toArray.sorted
    val bucketIds = new Array[Array[String]](clusterIdx.length)
    val bucketVecs = new Array[Array[Float]](clusterIdx.length)
    clusterIdx.zipWithIndex.foreach { case (c, pos) =>
      // id-sorted within the bucket: scan order never affects results
      // (the heap tie-breaks), but determinism eases debugging
      val rs = byCluster(c).sortBy(_.getString(1))
      bucketIds(pos) = rs.map(_.getString(1))
      val flat = new Array[Float](rs.length * dims)
      var r = 0
      while (r < rs.length) {
        val v = rs(r).getSeq[Float](2)
        var i = 0
        while (i < dims) { flat(r * dims + i) = v(i); i += 1 }
        r += 1
      }
      bucketVecs(pos) = flat
    }
    // centroid matrix aligned to the bucket order (only meaningful
    // with an IVF layout; flat layouts never rank centroids)
    val centroids: Array[Array[Double]] =
      if (hasIvf && new java.io.File(s"$dir/centroids").exists()) {
        val cm = spark.read.parquet(s"$dir/centroids")
          .select(col("centroid_id").cast("int"), col("pos").cast("int"),
            col("cv").cast("double"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (c, rs) =>
            val v = new Array[Double](dims)
            rs.foreach(r => v(r.getInt(1)) = r.getDouble(2))
            c -> v
          }
        clusterIdx.map(c => cm.getOrElse(c, new Array[Double](dims)))
      } else Array.empty
    val passages = new java.util.HashMap[String, Array[String]](n.toInt * 2)
    spark.read.parquet(s"$dir/passages")
      .select(col("id").cast("string"), col("text"),
        col("metadata.source").as("source"))
      .collect()
      .foreach(r => passages.put(r.getString(0),
        Array(r.getString(1), r.getString(2))))
    new WarmIndex(dims, centroids, bucketIds, bucketVecs, passages,
      provider, meta.queryPromptTemplate)
  }
}
