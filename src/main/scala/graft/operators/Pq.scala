package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.VectorFunctions.asDouble

/** Product quantization (PQ) for vector search at the 100 TB tier
  * (Jégou et al. 2011): split each `m·dsub`-dim vector into `m`
  * subvectors, quantize each against a per-subspace codebook of `k`
  * centroids, and store only the `m` small codes — `m` bytes instead of
  * `4·m·dsub` (32× at the standard m=8/k=256 over 64 float dims; the
  * int8 tier in [[graft.functions.VectorFunctions.quantizeInt8]] is 4×).
  *
  * Query-time scoring is ADC (asymmetric distance computation): one
  * `m × k` lookup table of `query_sub · centroid` inner products is
  * built per query on the driver — O(m·k·dsub), corpus-independent —
  * and each stored vector scores as the sum of `m` table lookups, never
  * touching the original floats. The scan reads the codes column only:
  * at 1000 executors that is the difference between shipping 100 TB of
  * floats and ~3 TB of codes through the scorers.
  *
  * Extends the reference's storage/recompute trade (PQ is what its HNSW
  * backend calls "compact" storage, `src/backend/hnsw.rs:30-44`; the
  * recompute path `src/index/recompute.rs:52-123` is our exact re-rank
  * stage). Distance/argmin determinism contract documented on
  * [[graft.functions.expressions.PqEncode]] — the DuckDB oracle
  * reproduces encode + ADC bit-for-bit from the seed codebooks.
  */
object Pq {
  /** File-local shadow of `org.apache.spark.sql.functions.round`:
    * per-row DOUBLE scores at scale 6 route through the fast HALF_UP
    * expression (exact-equivalent; see RoundHalfUp / RoundHalfUpSpec). */
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column = {
    require(scale == 6, s"file-local fast round is scale-6 only (got $scale)")
    graft.functions.VectorFunctions.round6(c)
  }


  /** Trained PQ model: `cents(sub)(code)` is a `dsub`-dim centroid. */
  case class Codebooks(m: Int, k: Int, dsub: Int,
      cents: Array[Array[Array[Double]]]) {
    require(cents.length == m && cents.forall(_.length == k) &&
      cents.forall(_.forall(_.length == dsub)), "codebook shape mismatch")
    def dims: Int = m * dsub
    /** Row-major flat layout `[(sub * k + code) * dsub + j]` for the
      * encoder expression. */
    def flat: IndexedSeq[Double] =
      cents.flatMap(_.flatMap(_.toIndexedSeq)).toIndexedSeq
  }

  /** ==ORACLE FORMULATION ONLY — not a production entry point.==
    * Codebooks taken verbatim from the subvector slices of the `k`
    * lowest-id rows (a deterministic sample init, no Lloyd iterations),
    * so a DuckDB oracle can rebuild the identical codebooks from the
    * same table and check encode + ADC end-to-end. Production models
    * come from [[trainCodebooks]] (per-subspace KMeans). */
  def seedCodebooks(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Codebooks = {
    val rows = emb.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .orderBy(col(idCol)).limit(k).collect()
    require(rows.length == k, s"need $k seed rows, table has ${rows.length}")
    val dims = rows.head.getSeq[Double](1).length
    require(dims % m == 0, s"dims $dims not divisible by m=$m")
    val dsub = dims / m
    val cents = Array.tabulate(m, k) { (mi, c) =>
      rows(c).getSeq[Double](1).slice(mi * dsub, (mi + 1) * dsub).toArray
    }
    Codebooks(m, k, dsub, cents)
  }

  /** Production training: one KMeans per subspace over the (optionally
    * sampled) corpus — m small fits on `dsub`-dim points, distributed
    * by Spark ML; nothing corpus-sized reaches the driver. At 100 TB
    * train on a fraction (1-10M vectors is plenty for k=256 centroids
    * per subspace); encoding always runs over the full table. */
  def trainCodebooks(emb: DataFrame, vecCol: String, m: Int, k: Int,
      seed: Long = 42L, sampleFraction: Double = 1.0): Codebooks = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val base0 = emb.select(asDouble(col(vecCol)).as("v"))
    val base = (if (sampleFraction < 1.0) base0.sample(sampleFraction, seed) else base0)
      .cache()
    try {
      val dims = base.select(size(col("v"))).head().getInt(0)
      require(dims % m == 0, s"dims $dims not divisible by m=$m")
      val dsub = dims / m
      val cents = Array.tabulate(m) { mi =>
        val sub = base.select(
          array_to_vector(slice(col("v"), mi * dsub + 1, dsub)).as("__sub"))
        val model = new KMeans().setK(k).setSeed(seed + mi)
          .setFeaturesCol("__sub").setPredictionCol("__c").fit(sub)
        // stable code order: sort centroids so retrains are comparable
        model.clusterCenters.map(_.toArray)
          .sortBy(_.toIndexedSeq)(scala.math.Ordering.Implicits.seqOrdering[IndexedSeq, Double])
      }
      Codebooks(m, k, dsub, cents)
    } finally { base.unpersist(); () }
  }

  /** Encode a vector column to its `m` PQ codes (ARRAY<INT>) via the
    * codegen'd [[graft.functions.expressions.PqEncode]]. */
  def encodeCol(vec: Column, cb: Codebooks): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.PqEncode(
      GraftColumnBridge.expression(asDouble(vec)),
      new graft.functions.expressions.PqCodebookConst(cb.flat.toArray), cb.m, cb.k))
  }

  /** Driver-side reference encoder — the parity oracle PqSpec pins the
    * expression against (same sequential distance sum, same first-win
    * argmin). */
  def encodeRef(v: Array[Double], cb: Codebooks): Array[Int] =
    Array.tabulate(cb.m) { mi =>
      var best = Double.PositiveInfinity
      var bestC = 0
      for (c <- 0 until cb.k) {
        var d = 0.0
        for (j <- 0 until cb.dsub) {
          val diff = v(mi * cb.dsub + j) - cb.cents(mi)(c)(j)
          d += diff * diff
        }
        if (d < best) { best = d; bestC = c }
      }
      bestC
    }

  /** Reconstruction of a code array (centroid concatenation) — used for
    * MSE diagnostics, not in any query path. */
  def decodeRef(codes: Array[Int], cb: Codebooks): Array[Double] =
    Array.tabulate(cb.dims)(i => cb.cents(i / cb.dsub)(codes(i / cb.dsub))(i % cb.dsub))

  /** Per-query ADC lookup table: `lut(sub)(code) = q_sub · centroid`,
    * computed sequentially (j ascending) to match the oracle's
    * list_inner_product. O(m·k·dsub) driver work per query. */
  def adcLut(cb: Codebooks, q: Array[Double]): Array[Array[Double]] = {
    require(q.length == cb.dims, s"query dims ${q.length} != ${cb.dims}")
    Array.tabulate(cb.m, cb.k) { (mi, c) =>
      var s = 0.0
      for (j <- 0 until cb.dsub) s += q(mi * cb.dsub + j) * cb.cents(mi)(c)(j)
      s
    }
  }

  /** ADC inner-product estimate of a codes column against a query LUT:
    * an unrolled left-to-right sum of `m` array-literal lookups — stays
    * inside whole-stage codegen (m is small; no HOF lambdas). */
  def adcScore(codes: Column, lut: Array[Array[Double]]): Column =
    lut.zipWithIndex.map { case (row, mi) =>
      element_at(typedLit(row.toSeq), element_at(codes, mi + 1) + 1)
    }.reduce(_ + _)

  /** ADC top-k over an encoded table (`idCol`, `codesCol`): scores are
    * rounded to 6 decimals before ranking, ties broken by id —
    * `TakeOrderedAndProject` merges per-partition top-k, nothing else
    * shuffles. */
  def adcTopK(encoded: DataFrame, idCol: String, codesCol: String,
      cb: Codebooks, q: Array[Double], k: Int): DataFrame =
    encoded.select(col(idCol),
        round(adcScore(col(codesCol), adcLut(cb, q)), 6).as("adc_score"))
      .orderBy(desc("adc_score"), col(idCol))
      .limit(k)

  /** The IVF-PQ read path at the operator level: IVF pruning → ADC over
    * codes only → exact re-rank of the survivors.
    *
    *  1. Rank cluster centroids against the query; keep `nprobe` ids.
    *     Pass `centroids` (`clusterCol`, pos, cv — the persisted
    *     layout's position-wise mean table) to make this O(K·dims
    *     not counting its own tiny scan). When omitted
    *     the means are DERIVED from the full table — an O(corpus)
    *     per-query convenience/oracle formulation, same stance as
    *     [[Knn.ivfTopK]]; the persisted-layout production entry point
    *     is [[graft.pipeline.Index.searchPq]], which always ranks
    *     stored centroids.
    *  2. Scan ONLY the `codes` column of the probed partitions and ADC-
    *     score them — with the table partitioned by `centroid_id` this
    *     is partition pruning plus a bytes-not-floats scan.
    *  3. Re-rank the top `rerank` candidates exactly: a broadcast
    *     semi-join fetches just those rows' float vectors, then true
    *     inner product orders the final k (the reference's recompute
    *     stage, `src/index/recompute.rs:52-123`).
    *
    * With nprobe = all clusters and rerank >= corpus size this is
    * *identical* to exact search (PqSpec pins that), so recall is
    * tunable down from 1.0 by the two knobs, never silently broken.
    */
  def ivfPqSearch(assigned: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, cb: Codebooks, q: Array[Double],
      nprobe: Int, k: Int, rerank: Int,
      codesCol: Option[String] = None,
      centroids: Option[DataFrame] = None): DataFrame = {
    val spark = assigned.sparkSession
    // 1. probe set from per-cluster mean vectors (scores rounded like
    // Index.searchIvf so probe choice is deterministic)
    val qdf = spark.range(1).select(typedLit(q.toSeq).as("qv"))
    val cents = centroids
      .map(_.select(col(clusterCol).as("__cl"), col("pos"), col("cv")))
      .getOrElse(assigned
        .select(col(clusterCol).as("__cl"), posexplode(asDouble(col(vecCol))).as(Seq("pos", "v")))
        .groupBy(col("__cl"), col("pos")).agg(avg("v").as("cv")))
    val probed = cents
      .join(broadcast(qdf), expr("true"))
      .groupBy("__cl")
      .agg(round(sum(col("cv") * element_at(col("qv"), col("pos") + 1)), 6).as("cscore"))
      .orderBy(desc("cscore"), col("__cl")).limit(nprobe)
      .select(col("__cl"))
    val pruned = assigned
      .join(broadcast(probed), col(clusterCol) === col("__cl"), "left_semi")
    // 2. cheap ADC pass over codes only. A stored codes column keeps the
    // float vectors out of this scan entirely (the production layout
    // writes codes at build time); encoding on the fly is the
    // convenience path for un-materialized tables.
    val codes = codesCol.fold(encodeCol(col(vecCol), cb))(col)
    val candidates = adcTopK(
        pruned.select(col(idCol), codes.as("__codes")),
        idCol, "__codes", cb, q, rerank)
      .select(col(idCol))
    // 3. exact re-rank of the candidate set
    assigned.join(broadcast(candidates), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(VectorFunctions.dot(col(vecCol), typedLit(q.toSeq)), 6).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
