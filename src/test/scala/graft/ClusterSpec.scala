package graft

import org.apache.spark.sql.functions._

import graft.operators.Cluster

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  private def toDf(vs: Seq[(Long, Seq[Double])]) =
    vs.toDF("vec_id", "embedding")

  test("separable blobs: members group with their blob, centroids converge") {
    // three tight blobs around (0,0), (10,0), (0,10); ids interleaved so
    // init picks one vector from each blob plus a duplicate-ish one
    val pts = Seq[(Long, Seq[Double])](
      (0L, Seq(0.1, 0.0)), (1L, Seq(10.1, 0.0)), (2L, Seq(0.0, 10.1)),
      (3L, Seq(-0.1, 0.1)), (4L, Seq(9.9, -0.1)), (5L, Seq(0.1, 9.9)),
      (6L, Seq(0.0, -0.1)), (7L, Seq(10.0, 0.1)), (8L, Seq(-0.1, 10.0)))
    val asg = Cluster.kmeansAssign(toDf(pts), "vec_id", "embedding",
        k = 3, iters = 4)
      .as[(Long, Int, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(asg(0L) == asg(3L) && asg(3L) == asg(6L))
    assert(asg(1L) == asg(4L) && asg(4L) == asg(7L))
    assert(asg(2L) == asg(5L) && asg(5L) == asg(8L))
    assert(Set(asg(0L), asg(1L), asg(2L)).size == 3)
  }

  test("warm start: warm(cold(i), j) == cold(i + 1 + j) bit-for-bit") {
    // centroids-from-assignment IS the next Lloyd update, so resuming
    // from a persisted assignment must land exactly on the cold
    // trajectory — the contract that makes incremental re-clustering
    // safe for curation decisions
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(120)
    val prior = Cluster.kmeansAssign(emb, "vec_id", "embedding", k = 4, iters = 2)
    val warm = Cluster.kmeansAssignWarm(emb, "vec_id", "embedding", prior, iters = 1)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    val cold = Cluster.kmeansAssign(emb, "vec_id", "embedding", k = 4, iters = 4)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(warm == cold, "warm(A2, 1) must equal cold(4) exactly")
  }

  test("warm start: vectors new since the prior run join at the argmin") {
    val pts = Seq[(Long, Seq[Double])](
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 0.0)),
      (2L, Seq(0.2, 0.0)), (3L, Seq(9.8, 0.0)))
    val prior = Cluster.kmeansAssign(toDf(pts), "vec_id", "embedding",
      k = 2, iters = 2)
    // two new points arrive near each blob; warm from the OLD assignment
    val grown = pts ++ Seq((4L, Seq(0.1, 0.1)), (5L, Seq(9.9, 0.1)))
    val warm = Cluster.kmeansAssignWarm(toDf(grown), "vec_id", "embedding",
        prior, iters = 1)
      .as[(Long, Int, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(warm.size == 6, s"every vector must be assigned: $warm")
    assert(warm(4L) == warm(0L) && warm(5L) == warm(1L),
      s"new points must join their blob's cluster: $warm")
  }

  test("watched: early-stop at tol=0 equals the full fixed-round run") {
    // the watched contract: stopping at the exact fixed point (or an
    // even-remainder 2-cycle) is indistinguishable from running the
    // remaining rounds — on a corpus slice that converges well before
    // the cap, watched(cap) must bit-match cold(cap) AND actually stop
    // early (else this test only proves the loop can count)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(150)
    val (asgDf, rounds) = Cluster.kmeansAssignWatched(
      emb, "vec_id", "embedding", k = 4, maxIters = 40, tol = 0.0)
    assert(rounds < 40, s"watch must fire before the cap, ran $rounds")
    val watched = asgDf.as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    val cold = Cluster.kmeansAssign(emb, "vec_id", "embedding", k = 4, iters = 40)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(watched == cold, "watched(tol=0) must equal cold(maxIters) exactly")
  }

  test("watched + warm: a converged prior confirms in one round") {
    // daily-increment mode: yesterday's structure enters as round 0 —
    // on an unchanged corpus the first update reproduces it and the
    // watch fires immediately
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(150)
    val (prior, cold) = {
      val (df, r) = Cluster.kmeansAssignWatched(
        emb, "vec_id", "embedding", k = 4, maxIters = 40, tol = 0.0)
      (df.cache(), r)
    }
    val (warm, rounds) = Cluster.kmeansAssignWatched(
      emb, "vec_id", "embedding", k = 4, maxIters = 40, tol = 0.0,
      init = Some(prior))
    assert(rounds == 1, s"converged prior must confirm in 1 round, ran $rounds")
    assert(warm.as[(Long, Int, Double)].collect().sortBy(_._1).toSeq ==
      prior.as[(Long, Int, Double)].collect().sortBy(_._1).toSeq,
      "re-watching a fixed point must reproduce it")
  }

  test("watched: production tol stops no later than tol=0 and assigns everything") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(150)
    val (_, exact) = Cluster.fitCentroidsWatched(
      emb, "vec_id", "embedding", k = 4, maxIters = 40, tol = 0.0)
    val (asg, loose) = Cluster.kmeansAssignWatched(
      emb, "vec_id", "embedding", k = 4, maxIters = 40, tol = 0.05)
    assert(loose <= exact, s"tol=0.05 ran $loose > tol=0's $exact rounds")
    assert(asg.count() == emb.count(), "every vector must be assigned")
  }

  test("deterministic across runs and input order") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(100)
    val a = Cluster.kmeansAssign(emb, "vec_id", "embedding", 4, 3)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    val b = Cluster.kmeansAssign(emb.orderBy(desc("vec_id")), "vec_id",
        "embedding", 4, 3)
      .orderBy("id").as[(Long, Int, Double)].collect().toSeq
    assert(a == b)
  }

  test("emptied cluster drops instead of lingering") {
    // duplicate init vectors: every point ties and the tie-break sends
    // it to cluster 0, so cluster 1 empties after round 1 and must not
    // reappear in later rounds or the final assignment.
    val pts = Seq[(Long, Seq[Double])](
      (0L, Seq(1.0, 1.0)), (1L, Seq(1.0, 1.0)), (2L, Seq(0.1, 0.0)),
      (3L, Seq(0.1, 0.1)), (4L, Seq(0.0, 0.1)))
    val cents = Cluster.fitCentroids(toDf(pts), "vec_id", "embedding",
      k = 2, iters = 3)
    assert(cents.size == 1, s"expected lone surviving centroid, got $cents")
    assert(cents.keySet == Set(0))
    val asg = Cluster.kmeansAssign(toDf(pts), "vec_id", "embedding", 2, 3)
      .select("cluster").distinct().as[Int].collect().toSeq
    assert(asg == Seq(0))
  }

  test("iters=0 assigns against the raw init vectors") {
    val pts = Seq[(Long, Seq[Double])](
      (0L, Seq(0.0, 0.0)), (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.0)))
    val asg = Cluster.kmeansAssign(toDf(pts), "vec_id", "embedding",
        k = 2, iters = 0)
      .as[(Long, Int, Double)].collect().map(t => t._1 -> t._2).toMap
    assert(asg(0L) == 0 && asg(1L) == 1 && asg(2L) == 1)
  }

  test("distance ties break to the smaller cluster id") {
    // two identical init vectors: every point is equidistant to both
    val pts = Seq[(Long, Seq[Double])](
      (0L, Seq(1.0, 1.0)), (1L, Seq(1.0, 1.0)), (2L, Seq(2.0, 0.5)))
    val asg = Cluster.kmeansAssign(toDf(pts), "vec_id", "embedding",
        k = 2, iters = 1)
      .select("cluster").distinct().as[Int].collect().toSeq
    assert(asg == Seq(0))
  }
}
