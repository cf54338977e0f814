package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)

  test("knnGraph: k rows per node, no self edges, ordered by (score desc, nb)") {
    val g = Graph.knnGraph(emb.limit(50), "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int, Double)].collect()
    val byId = g.groupBy(_._1)
    assert(byId.forall(_._2.length == 3))
    assert(g.forall { case (id, nb, _, _) => id != nb })
    byId.values.foreach { rows =>
      val keys = rows.sortBy(_._3).map(r => (-r._4, r._2)).toSeq
      assert(keys == keys.sorted)
    }
  }

  test("autoLshBits: occupancy-bounded, integer-exact, clamped") {
    // smallest b in [4,16] with 2^b * 64 >= n — expected bucket
    // occupancy <= 64 at every corpus size, so pair mass stays ~linear
    // (n * 64 per table) instead of n^2/2^pinnedBits
    assert(Graph.autoLshBits(1) == 4)
    assert(Graph.autoLshBits(1024) == 4)   // 16 * 64 boundary: exact
    assert(Graph.autoLshBits(1025) == 5)
    assert(Graph.autoLshBits(2000) == 5)   // sf0.1 embeddings
    assert(Graph.autoLshBits(20000) == 9)  // 10x corpus -> wider key
    assert(Graph.autoLshBits(4194304) == 16)
    assert(Graph.autoLshBits(100000000L) == 16) // clamp: raise tables/blocking instead
    // bits = 0 routes through the auto path and matches the pinned
    // equivalent exactly (same layout, same edges)
    val n = emb.count()
    val auto = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
      dims = 64, bits = 0, tables = 4).collect().toSet
    val pinned = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
      dims = 64, bits = Graph.autoLshBits(n), tables = 4).collect().toSet
    assert(auto == pinned)
  }

  test("knnGraphLsh blockCol scopes neighborhoods; constant block == unblocked") {
    // a constant block column changes nothing (the unblocked plan IS
    // the blocked plan at blk = lit(0))
    val withConst = emb.withColumn("one", lit(1))
    val unblocked = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
      dims = 64, bits = 4, tables = 4).collect().toSet
    val constBlk = Graph.knnGraphLsh(withConst, "vec_id", "embedding", k = 3,
      dims = 64, bits = 4, tables = 4, blockCol = Some("one")).collect().toSet
    assert(constBlk == unblocked)
    // a real block column: every edge stays within its block (the
    // IVF-pre-clustering contract — the past-16-bits scale path)
    val blocked = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
        dims = 64, bits = 4, tables = 4, blockCol = Some("label"))
      .select("id", "nb").as[(Long, Long)].collect()
    val lbl = emb.select(col("vec_id").cast("long"), col("label"))
      .as[(Long, String)].collect().toMap
    assert(blocked.nonEmpty)
    assert(blocked.forall { case (a, b) => lbl(a) == lbl(b) },
      "blocked kNN graph must keep every edge within its block")
  }

  test("blocked auto bits == the per-block autoLshBits(maxBlock) recipe") {
    // r15 default: with blockCol set, bits <= 0 sizes the key from the
    // LARGEST block's count (per-block occupancy <= 64 — the measured
    // recall-over-cost point: 0.450 vs the global key's 0.312,
    // GraphBlockDrive r14), not the global corpus count.
    val maxBlock = emb.groupBy("label").count()
      .agg(max("count")).head().getLong(0)
    val auto = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
        dims = 64, bits = 0, tables = 4, blockCol = Some("label"))
      .collect().toSet
    val recipe = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
        dims = 64, bits = Graph.autoLshBits(maxBlock), tables = 4,
        blockCol = Some("label")).collect().toSet
    assert(auto == recipe,
      "blocked auto bits must equal autoLshBits(maxBlockSize)")
  }

  test("LSH plane-prefix property: a b-bit key is the low b bits of the 16-bit key") {
    // the escape valve's masking rests on this: plane b's coefficients
    // depend only on (seed, b), so widening the key appends bits
    // without disturbing the low ones
    val keys = emb.limit(100).select(
        graft.operators.Knn.signLshKey(col("embedding"), 64, 6, 1000L).as("k6"),
        graft.operators.Knn.signLshKey(col("embedding"), 64, 16, 1000L).as("k16"))
      .as[(Long, Long)].collect()
    assert(keys.length == 100)
    assert(keys.forall { case (k6, k16) => k6 == (k16 & 63L) })
  }

  test("occupancy escape valve: a hot block escalates to exactly the replayed width, cold blocks keep the base key") {
    // One "hot" block of random vectors plus a small "cold" block; a
    // LOWERED cap forces the valve at spec scale (the default 256 needs
    // a 100x pair-output corpus — GraphBlockDrive's job). The spec
    // replays the selection rule driver-side (base width from the max
    // block count, occupancy = largest table-0 cell, smallest
    // base+e <= 16 with occ <= cap·2^e) and pins the valve run against
    // per-block PINNED runs at those widths — block independence means
    // the union of single-block graphs IS the blocked graph.
    val rnd = new scala.util.Random(7)
    def vec() = Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)
    val hot = (0 until 48).map(i => (i.toLong, vec(), "h"))
    val cold = (100 until 106).map(i => (i.toLong, vec(), "c"))
    val df = (hot ++ cold).toDF("vec_id", "embedding", "b")
    val b0 = Graph.autoLshBits(48) // max block count
    def maxCell(rows: org.apache.spark.sql.DataFrame): Long =
      rows.select(graft.operators.Knn.signLshKey(col("embedding"), 64, b0, 1000L).as("k"))
        .groupBy("k").count().agg(max("count")).head().getLong(0)
    val cap = 2L
    val occHot = maxCell(df.filter($"b" === "h"))
    val occCold = maxCell(df.filter($"b" === "c"))
    assert(occHot > cap, s"fixture premise: hot occupancy $occHot must exceed the cap")
    assert(occCold <= cap, s"fixture premise: cold occupancy $occCold must not")
    val expectedHot = (0 to (16 - b0))
      .find(e => occHot <= cap * (1L << e)).map(b0 + _).getOrElse(16)
    assert(expectedHot > b0)
    val valve = Graph.knnGraphLsh(df, "vec_id", "embedding", k = 3, dims = 64,
        bits = 0, tables = 4, blockCol = Some("b"), blockBucketCap = cap)
      .collect().toSet
    val hotPinned = Graph.knnGraphLsh(df.filter($"b" === "h"), "vec_id",
        "embedding", k = 3, dims = 64, bits = expectedHot, tables = 4,
        blockCol = Some("b")).collect().toSet
    val coldPinned = Graph.knnGraphLsh(df.filter($"b" === "c"), "vec_id",
        "embedding", k = 3, dims = 64, bits = b0, tables = 4,
        blockCol = Some("b")).collect().toSet
    assert(valve == (hotPinned ++ coldPinned),
      "the valve must escalate the hot block's width and leave the cold block at the base key")
    // at the DEFAULT cap nothing here escalates: auto == base recipe
    val calm = Graph.knnGraphLsh(df, "vec_id", "embedding", k = 3, dims = 64,
      bits = 0, tables = 4, blockCol = Some("b")).collect().toSet
    val base = Graph.knnGraphLsh(df, "vec_id", "embedding", k = 3, dims = 64,
      bits = b0, tables = 4, blockCol = Some("b")).collect().toSet
    assert(calm == base)
  }

  test("knnGraphLsh null blocks coalesce into one sentinel block (not dropped)") {
    // SQL null never matches an equi-join key: without Knn.blockKey's
    // coalesce, every null-block row would silently vanish from the
    // graph. Contract: null behaves exactly like any other distinct
    // block value — the null rows pair among themselves.
    def blk(v: org.apache.spark.sql.Column) =
      when($"vec_id" % 2 === 0, lit("a")).otherwise(v)
    val gotNull = Graph.knnGraphLsh(emb.withColumn("b2", blk(lit(null))),
      "vec_id", "embedding", k = 3, dims = 64, bits = 4, tables = 4,
      blockCol = Some("b2")).collect().toSet
    val want = Graph.knnGraphLsh(emb.withColumn("b2", blk(lit("zz"))),
      "vec_id", "embedding", k = 3, dims = 64, bits = 4, tables = 4,
      blockCol = Some("b2")).collect().toSet
    assert(gotNull == want)
    assert(gotNull.exists(_.getLong(0) % 2 == 1),
      "null-block rows must stay in the graph")
  }

  test("knnGraphLsh recall vs exact at the default knobs") {
    val exact = Graph.knnGraph(emb, "vec_id", "embedding", k = 3)
      .select("id", "nb").as[(Long, Long)].collect().toSet
    // The synthetic embeddings are adversarial for sign-LSH: the "true"
    // top-3 neighbors sit at cosine ~0.3-0.47 (angle ~65 deg), so each
    // hyperplane agrees with probability only ~0.6 and the default
    // 8-bit/4-table knobs (tuned for near-dup neighbors at cosine>=0.9,
    // where per-bit agreement is ~0.9) recover <10% of them. Wider
    // buckets + more tables is the standard LSH response when the
    // target similarity drops: 4 bits x 8 tables lifts per-table hit
    // probability to ~0.13-0.18 and the union above half. Pin that
    // floor so knob or hash changes that silently collapse recall fail.
    val lsh = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
        dims = 64, bits = 4, tables = 8)
      .select("id", "nb").as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH kNN-graph recall $recall below floor")
    // every LSH edge is a real scored pair (subset sanity, not ranked parity)
    assert(lsh.forall { case (a, b) => a != b })
  }

  test("pageRank on a hand-computed triangle+tail graph") {
    // 1-2-3 triangle plus 4-1: symmetric, verified against the DuckDB
    // recursive-CTE prototype of the same fixed-round update.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, damping = 0.85, iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L))
    assert(math.abs(pr(1L) - 0.380015) < 1e-6)
    assert(math.abs(pr(2L) - 0.242318) < 1e-6)
    assert(math.abs(pr(3L) - 0.242318) < 1e-6)
    assert(math.abs(pr(4L) - 0.135349) < 1e-6)
    // conservation: no dangling nodes -> total rank mass stays 1
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("pageRank redistributes dangling mass uniformly") {
    // 1 -> 2 only: node 2 is dangling. Without redistribution the total
    // mass decays toward the teleport floor; with it, mass stays 1.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val pr = Graph.pageRank(edges, damping = 0.85, iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-6,
      s"rank mass ${pr.values.sum} leaked despite dangling redistribution")
    assert(pr(2L) > pr(1L)) // 2 receives 1's rank plus its own share
  }

  test("personalized PageRank concentrates mass near the seeds") {
    // two directional blobs (the labelSpread fixture); seed ONLY in the
    // even blob — every top-ranked node must be an even (same-blob) id
    val pts = (0 until 40).map { i =>
      val j = i * 0.01
      val v = if (i % 2 == 0) Seq(1.0, j) else Seq(j, 1.0)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val g = Graph.symmetrize(Graph.knnGraph(pts, "vec_id", "embedding", 3))
    val ppr = Graph.personalizedPageRank(g, Seq(0L).toDF("id"), iters = 8)
      .as[(Long, Double)].collect().sortBy(r => (-r._2, r._1))
    assert(ppr.head._1 == 0L, "the seed itself must rank first")
    assert(ppr.take(10).forall(_._1 % 2 == 0),
      s"top-10 crossed into the unseeded blob: ${ppr.take(10).toSeq}")
    // walk mass conservation: no dangling nodes -> total stays ~1
    assert(math.abs(ppr.map(_._2).sum - 1.0) < 1e-3)
  }

  test("personalizedPageRankWatched: early-stops, matching fixed-round exactly") {
    val pts = (0 until 40).map { i =>
      val j = i * 0.01
      val v = if (i % 2 == 0) Seq(1.0, j) else Seq(j, 1.0)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val g = Graph.symmetrize(Graph.knnGraph(pts, "vec_id", "embedding", 3))
    val seeds = Seq(0L).toDF("id")
    val (watched, rounds) = Graph.personalizedPageRankWatched(
      g, seeds, damping = 0.5, maxIters = 60, tol = 0.0)
    assert(rounds < 60, s"never converged in $rounds rounds")
    assert(rounds > 1)
    val w = watched.as[(Long, Double)].collect().toMap
    val fixed = Graph.personalizedPageRank(g, seeds, damping = 0.5, iters = 60)
      .as[(Long, Double)].collect().toMap
    assert(w == fixed)
  }

  test("personalizedPageRankWatched warm start: fast confirm, seed churn, departed ids") {
    val pts = (0 until 40).map { i =>
      val j = i * 0.01
      val v = if (i % 2 == 0) Seq(1.0, j) else Seq(j, 1.0)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val g = Graph.symmetrize(Graph.knnGraph(pts, "vec_id", "embedding", 3))
    val seeds = Seq(0L).toDF("id")
    val (cold, coldRounds) = Graph.personalizedPageRankWatched(
      g, seeds, damping = 0.5, maxIters = 60, tol = 0.0)
    assert(coldRounds > 2)
    val prior = cold.cache()
    // warm AT the fixed point: the renormalizing division (kept mass
    // ~1 - quantization eps) shifts grid cells, and on SPARSE state
    // the re-settle is a short grid crawl (measured 6 rounds vs cold
    // 25 on this fixture — the pageRankWeightedWatched warm lesson),
    // so the contract is warm < cold rounds plus a tight node-wise
    // drift envelope, not an exact confirm count
    val (warm, warmRounds) = Graph.personalizedPageRankWatched(
      g, seeds, damping = 0.5, maxIters = 60, tol = 0.0, init = Some(prior))
    assert(warmRounds < coldRounds,
      s"fixed-point warm start took $warmRounds rounds, cold took $coldRounds")
    val wm = warm.as[(Long, Double)].collect().toMap
    val cm = prior.as[(Long, Double)].collect().toMap
    val cell = math.pow(2, -30)
    assert(wm.keySet == cm.keySet,
      "warm frontier must reach the same node set as the prior")
    wm.foreach { case (id, r) =>
      assert(math.abs(r - cm(id)) <= 8 * cell, s"node $id drifted: $r vs ${cm(id)}")
    }
    // SEED CHURN: a new seed needs no init row — the per-round
    // full-outer seed term injects its teleport mass, so the warm run
    // lands in the same attractor basin as a cold run on the NEW seeds
    val tol = 1e-6
    val seeds2 = Seq(0L, 2L).toDF("id")
    val (cold2, cold2Rounds) = Graph.personalizedPageRankWatched(
      g, seeds2, damping = 0.5, maxIters = 60, tol = tol)
    val (warm2, warm2Rounds) = Graph.personalizedPageRankWatched(
      g, seeds2, damping = 0.5, maxIters = 60, tol = tol, init = Some(prior))
    assert(warm2Rounds <= cold2Rounds,
      s"warm seed-churn run ($warm2Rounds) exceeded cold ($cold2Rounds)")
    val w2 = warm2.as[(Long, Double)].collect().toMap
    val c2 = cold2.as[(Long, Double)].collect().toMap
    (w2.keySet ++ c2.keySet).foreach { id =>
      val a = w2.getOrElse(id, 0.0); val b = c2.getOrElse(id, 0.0)
      assert(math.abs(a - b) <= 10 * tol,
        s"node $id: warm $a vs cold $b — beyond tolerance envelope")
    }
    assert(math.abs(w2.values.sum - 1.0) < 1e-3, "walk mass must stay ~1")
    // DEPARTED IDS: init rows whose node left the graph drop before
    // renormalization — mass they carried never re-injects, and the
    // kept rows' result is identical with or without the stale rows
    val stale = prior.union(Seq((999L, 0.25), (998L, 0.25)).toDF("id", "rank"))
    val (warm3, _) = Graph.personalizedPageRankWatched(
      g, seeds, damping = 0.5, maxIters = 60, tol = 0.0, init = Some(stale))
    assert(warm3.as[(Long, Double)].collect().toMap == wm,
      "stale departed-id rows must not change the warm result")
    // a seed with NO surviving mass refuses loudly (wrong-table guard)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRankWatched(g, seeds, maxIters = 5, tol = 0.0,
        init = Some(Seq((999L, 1.0)).toDF("id", "rank")))
    }
  }

  test("personalized PageRank refuses dangling graphs") {
    val edges = Seq((1L, 2L)).toDF("src", "dst") // 2 has no out-edge
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, Seq(1L).toDF("id"))
    }
  }

  test("triangleCounts on the triangle+tail graph") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val t = Graph.triangleCounts(edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(t(1L) == ((3L, 1L, 0.333333)))
    assert(t(2L) == ((2L, 1L, 1.0)))
    assert(t(3L) == ((2L, 1L, 1.0)))
    assert(t(4L) == ((1L, 0L, 0.0)))
  }

  test("triangleCountsCapped: exact at/below the cap, unbiased estimate above it") {
    // below cap: must equal the exact tier bit for bit (w = 1 path)
    val small = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val exact = Graph.triangleCounts(small)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3.toDouble, r._4))).toMap
    val capped = Graph.triangleCountsCapped(small, maxDegree = 10)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(capped == exact, s"under-cap must be exact: $capped vs $exact")

    // a hub star (0 -- 1..40, no triangles): the capped tier must run
    // the wedge stage on <= C(cap,2) wedges and report zero triangles
    // with EXACT degrees
    val star = (1L to 40L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("src", "dst")
    val starT = Graph.triangleCountsCapped(star, maxDegree = 5)
      .as[(Long, Long, Double, Double)].collect()
    assert(starT.forall(_._3 == 0.0))
    assert(starT.find(_._1 == 0L).get._2 == 40L, "hub degree must stay exact")

    // a 10-clique with cap 4: every center over the cap. The estimator
    // is unbiased (E = exact) and deterministic under the hash
    // sampling; assert the TOTAL triangle estimate lands within the
    // documented error envelope of the exact 3 * C(10,3) = 360
    // per-corner total (w = C(9,2)/C(4,2) = 6 for the smallest-vertex
    // centers; RSE per center <= sqrt((w-1)/t_a), aggregate well under
    // 50% here).
    val clique = (for {
      a <- 0L until 10L; b <- 0L until 10L if a != b
    } yield (a, b)).toDF("src", "dst")
    val est = Graph.triangleCountsCapped(clique, maxDegree = 4)
      .agg(sum("triangles")).head().getDouble(0)
    assert(est > 180 && est < 540, s"clique estimate $est outside [180, 540]")
    // degrees on the clique stay exact regardless of sampling
    val dgs = Graph.triangleCountsCapped(clique, maxDegree = 4)
      .select("degree").as[Long].collect()
    assert(dgs.forall(_ == 9L))
  }

  test("labelSpread recovers held-out blob labels from two seeds") {
    // two directional blobs (even ids along e1, odd along e2, distinct
    // jitters so the kNN graph chains through each blob); one seed per
    // blob must label everything the diffusion reaches correctly
    val pts = (0 until 40).map { i =>
      val j = i * 0.01
      val v = if (i % 2 == 0) Seq(1.0, j) else Seq(j, 1.0)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val g = Graph.knnGraph(pts, "vec_id", "embedding", k = 3)
    val seeds = Seq((0L, 0), (1L, 1)).toDF("id", "label")
    val spread = Graph.labelSpread(Graph.symmetrize(g), seeds, iters = 10)
    val best = spread.as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.minBy(r => (-r._3, r._2))._2
      }
    assert(best.size >= 30, s"diffusion reached only ${best.size} nodes")
    best.foreach { case (id, l) =>
      assert(l == (id % 2).toInt, s"node $id labeled $l")
    }
  }

  test("plan shapes: knnGraph top-k combines map-side; kmeans assignment is shuffle-free") {
    // The n^2 scored pairs must meet a PARTIAL object-hash aggregate
    // before any exchange — k rows per (task, node) cross the wire,
    // never the pair table.
    val g = Graph.knnGraph(emb.limit(50), "vec_id", "embedding", k = 3)
    val plan = g.queryExecution.executedPlan.toString
    // the map-side partial of the bounded aggregator must exist: k rows
    // per (task, node) cross any exchange, never the scored pair table
    // (r16: the native TopKScored aggregate replaced the typed
    // TopKByScore — the partial is named after the Catalyst class)
    assert(plan.contains("partial_topkscored"),
      s"expected a partial TopKScored below the exchange:\n$plan")
    // the typed path's AppendColumns (a full object-encoder pass over
    // every scored pair, outside codegen) must be gone
    assert(!plan.contains("AppendColumns"),
      s"expected no typed AppendColumns boundary in the pair stream:\n$plan")
    // k-means assignment: codegen'd dots against literal centroids —
    // the final assignment stage plans with no Exchange at all (no
    // .limit here: a GlobalLimit would add its own SinglePartition
    // exchange and mask the property under test).
    val asg = graft.operators.Cluster.kmeansAssign(
      emb, "vec_id", "embedding", k = 2, iters = 0)
    val asgPlan = asg.queryExecution.executedPlan.toString
    assert(!asgPlan.contains("Exchange"),
      s"kmeans assignment should be shuffle-free:\n$asgPlan")
  }

  test("pageRankWatched: early-stops at the grid fixed point, matching fixed-round exactly") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    // tol=0: run to the EXACT fixed point of the quantized update —
    // stopping there is indistinguishable from running the remaining
    // rounds, so the watched result must equal the fixed-round result
    // at any iters >= roundsRun, bit for bit (same grid, same update).
    val (watched, rounds) =
      Graph.pageRankWatched(edges, damping = 0.5, maxIters = 60, tol = 0.0)
    assert(rounds < 60, s"never converged in $rounds rounds")
    assert(rounds > 1)
    val w = watched.as[(Long, Double)].collect().toMap
    val fixed = Graph.pageRank(edges, damping = 0.5, iters = 60)
      .as[(Long, Double)].collect().toMap
    assert(w == fixed, s"watched $w != fixed-round $fixed")
    // a positive tol stops earlier and lands within tol of the fixed point
    val (loose, looseRounds) =
      Graph.pageRankWatched(edges, damping = 0.5, maxIters = 60, tol = 1e-4)
    assert(looseRounds < rounds)
    val l = loose.as[(Long, Double)].collect().toMap
    assert(l.keySet == w.keySet)
    assert(l.map { case (k, v) => math.abs(v - w(k)) }.sum < 1e-3)
  }

  test("pageRankWatched warm start: near-instant confirm when unchanged, faster on local perturbation") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 3L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val (cold, coldRounds) =
      Graph.pageRankWatched(edges, damping = 0.5, maxIters = 60, tol = 0.0)
    assert(coldRounds > 2)
    // warm start AT the fixed point: the renormalizing division can
    // shift grid cells by one (the seed's floored total is ~1 - eps),
    // so allow one settling round on top of the confirming round
    val (warm, warmRounds) = Graph.pageRankWatched(edges, damping = 0.5,
      maxIters = 60, tol = 0.0, init = Some(cold))
    assert(warmRounds <= 2,
      s"fixed-point warm start took $warmRounds rounds, cold took $coldRounds")
    assert(warmRounds < coldRounds)
    val wm = warm.as[(Long, Double)].collect().toMap
    val cm = cold.as[(Long, Double)].collect().toMap
    val cell30 = math.pow(2, -30)
    assert(wm.keySet == cm.keySet)
    wm.foreach { case (id, r) =>
      assert(math.abs(r - cm(id)) <= 2 * cell30, s"node $id drifted: $r vs ${cm(id)}")
    }
    // perturbed graph, in warm start's actual regime: a SMALL edit to
    // a larger graph whose rank field is FAR from uniform. Two
    // measured dead ends shaped this fixture: (1) under tol = 0 the
    // round count is dominated by the final crawl through grid cells,
    // similar from any nearby start (warm 25 vs cold 19) — so compare
    // in the practical tol > 0 mode; (2) on a degree-REGULAR graph
    // uniform ~= the fixed point, so cold is born converged and
    // warm/cold tie (11 == 11 on the 37-node mod graph) — so the
    // fixture must be degree-skewed. A hub star is the canonical
    // skewed case: uniform is far from the hub-heavy fixed point.
    val big = (1L to 36L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("src", "dst")
    val (base, _) =
      Graph.pageRankWatched(big, damping = 0.5, maxIters = 60, tol = 0.0)
    val big2 = big.union(Seq((100L, 5L), (5L, 100L)).toDF("src", "dst"))
    val tol = 1e-6
    val (cold2, cold2Rounds) =
      Graph.pageRankWatched(big2, damping = 0.5, maxIters = 60, tol = tol)
    val (warm2, warm2Rounds) = Graph.pageRankWatched(big2, damping = 0.5,
      maxIters = 60, tol = tol, init = Some(base))
    assert(warm2Rounds < cold2Rounds,
      s"warm $warm2Rounds should beat cold $cold2Rounds on a local perturbation")
    // both stopped within tol of the same attractor basin: node-wise
    // agreement within a small multiple of the tolerance
    val c2 = cold2.as[(Long, Double)].collect().toMap
    val w2 = warm2.as[(Long, Double)].collect().toMap
    assert(w2.keySet == c2.keySet)
    w2.foreach { case (id, r) =>
      assert(math.abs(r - c2(id)) <= 10 * tol,
        s"node $id: warm $r vs cold ${c2(id)} — beyond tolerance envelope")
    }
    // degenerate warm starts refuse loudly (every node explicitly
    // zero — a PARTIAL zero seed is fine, missing nodes get uniform)
    intercept[IllegalArgumentException] {
      Graph.pageRankWatched(edges, init =
        Some(Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 0.0)).toDF("id", "rank")))
    }
  }

  test("pageRankWatched: period-2 cycle stop preserves fixed-round equality") {
    // The quantized contraction can settle into an adjacent-cell
    // 2-cycle instead of a fixed point; the watch also stops on an
    // exact two-rounds-back revisit, but only with an EVEN remaining
    // budget so the result still equals the full fixed-round run.
    // This 37-node mod graph at quantBits=14 / damping=0.5 is a
    // measured cycling fixture: the stop round depends on maxIters
    // PARITY (the cycle branch waits for an even remainder), which is
    // the fingerprint that the cycle stop — not the fixed-point stop —
    // fired. Equality with the fixed-round replay must hold at BOTH
    // parities regardless.
    val edges = (0 until 37).flatMap { i =>
      Seq(3, 5, 11).flatMap { m =>
        val j = (i * m + 1) % 37
        if (i != j) Seq((i.toLong, j.toLong), (j.toLong, i.toLong)) else Nil
      }
    }.distinct.toDF("src", "dst")
    val (w40, r40) = Graph.pageRankWatched(edges, damping = 0.5,
      maxIters = 40, tol = 0.0, quantBits = 14)
    val (w41, r41) = Graph.pageRankWatched(edges, damping = 0.5,
      maxIters = 41, tol = 0.0, quantBits = 14)
    assert(r40 < 40 && r41 < 41, s"never stopped: $r40 / $r41")
    assert(r40 != r41,
      s"stop round must be maxIters-parity-dependent on a cycling fixture ($r40 == $r41)")
    val f40 = Graph.pageRank(edges, damping = 0.5, iters = 40, quantBits = 14)
      .as[(Long, Double)].collect().toMap
    val f41 = Graph.pageRank(edges, damping = 0.5, iters = 41, quantBits = 14)
      .as[(Long, Double)].collect().toMap
    assert(w40.as[(Long, Double)].collect().toMap == f40)
    assert(w41.as[(Long, Double)].collect().toMap == f41)
    // and the cycle is real: consecutive fixed-round results differ
    assert(f40 != f41, "fixture stopped cycling — pick new knobs")
  }

  test("labelSpreadWatched: early-stops at the grid fixed point, matching fixed-round") {
    val pts = (0 until 40).map { i =>
      val j = i * 0.01
      val v = if (i % 2 == 0) Seq(1.0, j) else Seq(j, 1.0)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val g = Graph.symmetrize(Graph.knnGraph(pts, "vec_id", "embedding", 3))
    val seeds = Seq((0L, 0), (1L, 1)).toDF("id", "label")
    val (watched, rounds) =
      Graph.labelSpreadWatched(g, seeds, alpha = 0.5, maxIters = 60, tol = 0.0)
    assert(rounds < 60, s"never converged in $rounds rounds")
    val w = watched.as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val fixed = Graph.labelSpread(g, seeds, alpha = 0.5, iters = 60)
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(w == fixed)
  }

  test("labelSpreadWatched warm start: prior state confirms fast and matches cold labels") {
    val pts = (0 until 40).map { i =>
      val j = i * 0.01
      val v = if (i % 2 == 0) Seq(1.0, j) else Seq(j, 1.0)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val g = Graph.symmetrize(Graph.knnGraph(pts, "vec_id", "embedding", 3))
    val seeds = Seq((0L, 0), (1L, 1)).toDF("id", "label")
    val (cold, coldRounds) =
      Graph.labelSpreadWatched(g, seeds, alpha = 0.5, maxIters = 60, tol = 0.0)
    assert(coldRounds > 2)
    // re-spread seeded from the converged state: one confirming round,
    // identical sparse state (no renormalization to shift cells here)
    val (warm, warmRounds) = Graph.labelSpreadWatched(g, seeds, alpha = 0.5,
      maxIters = 60, tol = 0.0, init = Some(cold))
    assert(warmRounds == 1, s"fixed-point warm re-spread took $warmRounds rounds")
    val wm = warm.as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val cm = cold.as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(wm == cm)
  }

  test("knnGraphLsh plan: no vector column crosses the bucket or dedup exchanges") {
    // The production graph tier's exchange discipline (the Hamming
    // family's stance): candidate generation shuffles 16-byte id pairs,
    // never dims-wide vectors. Vectors may only cross the wire in the
    // post-dedup rejoin, whose shuffled side is corpus-cardinality (one
    // row per vector), not candidate-cardinality.
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val lsh = Graph.knnGraphLsh(emb, "vec_id", "embedding", k = 3,
      dims = 64, bits = 4, tables = 8)
    // executedPlan AFTER EnsureRequirements has inserted the exchanges
    // (sparkPlan is pre-preparation and shows none); unwrap the AQE
    // root to reach the statically-planned tree
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val root = lsh.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val exchanges = root.collect { case s: ShuffleExchangeExec => s }
    assert(exchanges.nonEmpty)
    exchanges.foreach { ex =>
      val keys = ex.outputPartitioning match {
        case h: HashPartitioning => h.expressions.flatMap(_.references)
          .map(_.name).toSet
        case _ => Set.empty[String]
      }
      val isCandidateExchange =
        keys.contains("bkt") || (keys.contains("id") && keys.contains("nb"))
      if (isCandidateExchange) {
        val wide = ex.child.output.filter(_.dataType.isInstanceOf[ArrayType])
        assert(wide.isEmpty,
          s"candidate exchange on $keys carries vector column(s) " +
            s"${wide.map(_.name).mkString(",")}:\n${ex.treeString}")
      }
    }
  }

  test("labelPropagation: density splits what connectivity merges") {
    // two 4-cliques joined by one bridge edge: LPA keeps them distinct
    // communities (the bridge cannot outvote a clique majority) while
    // CC — same substrate — merges them into one cluster
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val pairs = (cliqueA ++ cliqueB :+ (3L, 10L)).toDF("id_a", "id_b")
    val sym = Graph.symmetrize(pairs, "id_a", "id_b")
    val lpa = Graph.labelPropagation(sym, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert((0L to 3L).map(lpa).toSet.size == 1, "clique A must agree")
    assert((10L to 13L).map(lpa).toSet.size == 1, "clique B must agree")
    assert(lpa(0L) != lpa(10L),
      "one bridge edge must not merge two dense communities")
    val cc = graft.operators.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1, "CC merges across the bridge")
    // stability: the synchronous update reproduces the settled state,
    // so extra rounds change nothing (the fixed-round oracle contract)
    val more = Graph.labelPropagation(sym, iters = 8)
      .as[(Long, Long)].collect().toMap
    assert(more == lpa, "settled LPA labels must be round-count invariant")
  }

  test("modularity: two clean cliques score 0.5, one-blob labels score 0") {
    // two disjoint 4-cliques: 24 directed rows, each community owns 12
    // ends, all internal -> Q_c = 12/24 - (12/24)^2 = 0.25, total 0.5
    // (the textbook two-equal-communities maximum); collapsing
    // everything into ONE label gives Q = 1 - 1 = 0 (the null read)
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val sym = Graph.symmetrize((cliqueA ++ cliqueB).toDF("id_a", "id_b"),
      "id_a", "id_b")
    val split = (0L to 3L).map(i => (i, 0L)) ++ (10L to 13L).map(i => (i, 10L))
    val q = Graph.modularity(sym, split.toDF("id", "label"))
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t._4).toMap
    assert(q == Map(0L -> 0.25, 10L -> 0.25), s"clean split must score 0.25 each: $q")
    val blob = (0L to 3L).map(i => (i, 0L)) ++ (10L to 13L).map(i => (i, 0L))
    val q1 = Graph.modularity(sym, blob.toDF("id", "label"))
      .as[(Long, Long, Long, Double)].collect()
    assert(q1.length == 1 && q1.head._4 == 0.0,
      s"one blob must score exactly 0: ${q1.toSeq}")
    // LPA's own labels on the bridged fixture recover the clean split's
    // score shape: both communities positive, total well above 0
    val bridged = Graph.symmetrize(
      (cliqueA ++ cliqueB :+ (3L, 10L)).toDF("id_a", "id_b"), "id_a", "id_b")
    val lpa = Graph.labelPropagation(bridged, iters = 4)
    val qs = Graph.modularity(bridged, lpa)
      .as[(Long, Long, Long, Double)].collect().map(_._4)
    assert(qs.length == 2 && qs.sum > 0.4, s"LPA split must score high: ${qs.toSeq}")
  }

  test("kCore: a clique with a tail — the tail peels layer by layer") {
    // 4-clique (every degree 3) + a path tail 3-20-21-22: at k=2 the
    // tail peels one endpoint layer per round (22, then 21, then 20),
    // the canonical multi-round case; the clique itself survives as
    // the 2-core together with nothing else
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val tail = Seq((3L, 20L), (20L, 21L), (21L, 22L))
    val sym = Graph.symmetrize((cliqueA ++ tail).toDF("id_a", "id_b"),
      "id_a", "id_b")
    val (core, rounds) = Graph.kCore(sym, k = 2, maxIters = 10)
    val ids = core.select("id").as[Long].collect().toSet
    assert(ids == Set(0L, 1L, 2L, 3L), s"2-core must be the clique: $ids")
    assert(rounds == 4, s"three peel layers + the confirming round, got $rounds")
    // every surviving degree is counted INSIDE the core
    val degs = core.as[(Long, Long)].collect().toMap
    assert(degs.values.forall(_ == 3L), s"clique core degrees must be 3: $degs")
    // k above the densest node -> empty core, no throw
    val (empty, _) = Graph.kCore(sym, k = 4, maxIters = 10)
    assert(empty.count() == 0L, "k above max degree must return an empty core")
  }

  test("kCore: refuses loudly when the peel outlives maxIters") {
    // a long path at k=2 peels two endpoints per round: 12 nodes need
    // 6+ rounds — a cap of 3 must throw, not return a partial peel
    val path = (0L until 11L).map(i => (i, i + 1))
    val sym = Graph.symmetrize(path.toDF("id_a", "id_b"), "id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Graph.kCore(sym, k = 2, maxIters = 3)
    }
    assert(e.getMessage.contains("did not settle"), e.getMessage)
    // and with budget it settles to the empty core (a path has no 2-core)
    val (core, _) = Graph.kCore(sym, k = 2, maxIters = 20)
    assert(core.count() == 0L, "a path has no 2-core")
  }

  test("labelPropagationWatched: early-stop == fixed-round on a settling graph") {
    // the clique fixture settles in ~2 rounds; the watch must fire
    // before a 12-round cap and reproduce labelPropagation(12) exactly
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val sym = Graph.symmetrize(
      (cliqueA ++ cliqueB :+ (3L, 10L)).toDF("id_a", "id_b"), "id_a", "id_b")
    val (watchedDf, rounds) = Graph.labelPropagationWatched(sym, maxIters = 12)
    assert(rounds < 12, s"watch must fire before the cap, ran $rounds")
    val watched = watchedDf.as[(Long, Long)].collect().toMap
    val fixed = Graph.labelPropagation(sym, iters = 12)
      .as[(Long, Long)].collect().toMap
    assert(watched == fixed, "watched must equal the full fixed-round run")
  }

  test("labelPropagationWatched: the canonical 2-cycle stops on even remainder only") {
    // a single undirected edge is synchronous LPA's textbook 2-cycle:
    // the endpoints swap labels forever, so a naive fixpoint watch
    // never fires. The cycle watch first sees state(2) == state(0) at
    // round 2; with an even cap the remainder is even and it stops
    // there, with an odd cap it must defer one round (state(3) ==
    // state(1), remainder even again) so the returned state equals the
    // full run at BOTH cap parities.
    val sym = Graph.symmetrize(Seq((1L, 2L)).toDF("id_a", "id_b"),
      "id_a", "id_b")
    for (cap <- Seq(9, 10)) {
      val (df, rounds) = Graph.labelPropagationWatched(sym, maxIters = cap)
      val expect = if (cap % 2 == 0) 2 else 3
      assert(rounds == expect,
        s"cap $cap: 2-cycle must stop at round $expect, ran $rounds")
      val watched = df.as[(Long, Long)].collect().toMap
      val fixed = Graph.labelPropagation(sym, iters = cap)
        .as[(Long, Long)].collect().toMap
      assert(watched == fixed,
        s"cap $cap: watched 2-cycle result must equal fixed($cap)")
    }
  }

  test("labelPropagationWatched + init: an unchanged graph confirms its prior in 1 round") {
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val sym = Graph.symmetrize(
      (cliqueA ++ cliqueB :+ (3L, 10L)).toDF("id_a", "id_b"), "id_a", "id_b")
    val (priorDf, _) = Graph.labelPropagationWatched(sym, maxIters = 12)
    val prior = priorDf.cache()
    val (warm, rounds) = Graph.labelPropagationWatched(sym, maxIters = 12,
      init = Some(prior))
    assert(rounds == 1, s"converged prior must confirm in 1 round, ran $rounds")
    assert(warm.as[(Long, Long)].collect().toMap ==
      prior.as[(Long, Long)].collect().toMap,
      "re-running from a fixed point must reproduce it")
    // a NEW node attached to clique A enters as its own label and gets
    // absorbed by the clique's community in the warm re-run
    val grown = Graph.symmetrize(
      (cliqueA ++ cliqueB ++ Seq((3L, 10L), (0L, 77L), (1L, 77L), (2L, 77L)))
        .toDF("id_a", "id_b"), "id_a", "id_b")
    val (regrown, r2) = Graph.labelPropagationWatched(grown, maxIters = 12,
      init = Some(prior))
    val m = regrown.as[(Long, Long)].collect().toMap
    assert(m(77L) == m(0L), s"the new node must join clique A's community: $m")
    assert(r2 <= 4, s"a local perturbation must re-converge fast, ran $r2")
  }

  test("labelPropagationWeighted: uniform weights == unweighted; weights decide ties") {
    // parity arm: weight 1.0 everywhere must reproduce the unweighted
    // operator exactly (count IS the uniform-weight sum)
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val pairs = (cliqueA ++ cliqueB :+ (3L, 10L)).toDF("id_a", "id_b")
    val uni = Graph.labelPropagationWeighted(
      Graph.symmetrizeWeighted(pairs.withColumn("w", lit(1.0)),
        "id_a", "id_b", "w"), iters = 4)
      .as[(Long, Long)].collect().toMap
    val plain = Graph.labelPropagation(
      Graph.symmetrize(pairs, "id_a", "id_b"), iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(uni == plain, "uniform weights must reproduce unweighted LPA")

    // weights-decide arm: node 3 hears 1 (w=5) and 2 (w=1); unweighted
    // would tie-break to label 1, the heavy edge must win instead
    val star = Seq((3L, 1L, 5.0), (3L, 2L, 1.0)).toDF("src", "dst", "w")
    val sym = star.union(star.select(col("dst"), col("src"), col("w")))
    val one = Graph.labelPropagationWeighted(sym, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(one(3L) == 1L, s"the w=5 neighbor must outvote: $one")
    val plainStar = Graph.labelPropagation(
      sym.select(col("src"), col("dst")), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(plainStar(3L) == 1L && one(1L) == 3L && one(2L) == 3L, s"$plainStar $one")
    // flip the heavy edge: weighted follows it away from the min label
    val star2 = Seq((3L, 1L, 1.0), (3L, 2L, 5.0)).toDF("src", "dst", "w")
    val sym2 = star2.union(star2.select(col("dst"), col("src"), col("w")))
    val two = Graph.labelPropagationWeighted(sym2, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(two(3L) == 2L,
      s"weighted vote must beat the min-label tie-break: $two")
  }

  test("pageRankWeighted: uniform weights == pageRank; heavy edges attract mass") {
    // parity arm: w = 1 everywhere makes rank*w/outw == rank/outdeg,
    // so the weighted operator must reproduce plain pageRank exactly
    // (symmetric graph => no dangling subplan on either side)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val plain = Graph.pageRank(Graph.symmetrize(tri, "id_a", "id_b"), iters = 5)
      .as[(Long, Double)].collect().toMap
    val uni = Graph.pageRankWeighted(
      Graph.symmetrizeWeighted(tri.withColumn("w", lit(1.0)),
        "id_a", "id_b", "w"), iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(uni == plain, s"uniform weights must reproduce pageRank: $uni vs $plain")

    // weights-matter arm: z splits mass 3:1 between x and y — x must
    // outrank y although their degrees are identical
    val wpairs = Seq((100L, 1L, 3.0), (100L, 2L, 1.0)).toDF("id_a", "id_b", "w")
    val wr = Graph.pageRankWeighted(
      Graph.symmetrizeWeighted(wpairs, "id_a", "id_b", "w"), iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(wr(1L) > wr(2L),
      s"the w=3 neighbor must accumulate more rank: $wr")

    // dangling refusal: a directed-only weighted edge list leaks mass
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankWeighted(
        Seq((1L, 2L, 1.0)).toDF("src", "dst", "w"), iters = 1).count()
    }
    assert(e.getMessage.contains("outgoing weight"))
  }

  test("labelPropagationWeightedWatched: early-stop == fixed-round; warm confirms in 1 round") {
    // weighted clique fixture (heavy bridge so weights matter): the
    // watch must fire before the cap and reproduce the fixed-round run
    // exactly — the unweighted twin's oracle contract
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j)
      yield (i, j, 0.25 + 0.25 * ((i + j) % 3))
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j)
      yield (i, j, 0.25 + 0.25 * ((i + j) % 3))
    val sym = Graph.symmetrizeWeighted(
      (cliqueA ++ cliqueB :+ ((3L, 10L, 2.5)))
        .toDF("id_a", "id_b", "w"), "id_a", "id_b", "w")
    val (watchedDf, rounds) =
      Graph.labelPropagationWeightedWatched(sym, maxIters = 12)
    assert(rounds < 12, s"watch must fire before the cap, ran $rounds")
    val watched = watchedDf.as[(Long, Long)].collect().toMap
    val fixed = Graph.labelPropagationWeighted(sym, iters = 12)
      .as[(Long, Long)].collect().toMap
    assert(watched == fixed, "watched must equal the full fixed-round run")
    // warm start from the converged prior: the heavy 2.5 bridge
    // outweighs the tails' internal votes, so this fixture settles on
    // a period-2 CYCLE (the tails swap labels) — the warm re-run
    // stops via the cycle rule in 2 rounds and, because the even-
    // remainder rule returns the revisited state, reproduces the
    // prior exactly; a true fixed point would confirm in 1
    val prior = watchedDf.cache()
    val (warm, r2) = Graph.labelPropagationWeightedWatched(sym,
      maxIters = 12, init = Some(prior))
    assert(r2 <= 2, s"converged prior must confirm in <= 2 rounds, ran $r2")
    assert(warm.as[(Long, Long)].collect().toMap == watched,
      "re-running from the settled state must reproduce it")
  }

  test("labelPropagationWeightedWatched: the weighted 2-cycle stops on even remainder only") {
    // one weighted undirected edge — synchronous LPA's textbook
    // 2-cycle is weight-independent, so the weighted watch needs the
    // same even-remainder stop rule to preserve fixed-round equality
    val sym = Graph.symmetrizeWeighted(
      Seq((1L, 2L, 0.5)).toDF("id_a", "id_b", "w"), "id_a", "id_b", "w")
    for (cap <- Seq(9, 10)) {
      val (df, rounds) =
        Graph.labelPropagationWeightedWatched(sym, maxIters = cap)
      val expect = if (cap % 2 == 0) 2 else 3
      assert(rounds == expect,
        s"cap $cap: 2-cycle must stop at round $expect, ran $rounds")
      val watched = df.as[(Long, Long)].collect().toMap
      val fixed = Graph.labelPropagationWeighted(sym, iters = cap)
        .as[(Long, Long)].collect().toMap
      assert(watched == fixed,
        s"cap $cap: watched 2-cycle result must equal fixed($cap)")
    }
  }

  test("pageRankWeightedWatched: early-stop == fixed-round; warm confirms fast") {
    // dyadic-weight triangle+extra so vote terms are grid-exact; the
    // tol=0 watch must reach the quantized fixed point before a
    // 40-round cap and equal the fixed-round run at that cap
    val tri = Seq((1L, 2L, 0.5), (2L, 3L, 1.0), (1L, 3L, 0.25),
      (3L, 4L, 2.0)).toDF("id_a", "id_b", "w")
    val sym = Graph.symmetrizeWeighted(tri, "id_a", "id_b", "w")
    // damping 0.5 (the pageRankWatched spec's contraction rate): at
    // 0.85 the quantized weighted map can wander adjacent grid cells
    // for a long time before settling
    val (watchedDf, rounds) = Graph.pageRankWeightedWatched(sym,
      damping = 0.5, maxIters = 60, tol = 0.0)
    assert(rounds < 60, s"watch must fire before the cap, ran $rounds")
    val watched = watchedDf.as[(Long, Double)].collect().toMap
    val fixed = Graph.pageRankWeighted(sym, damping = 0.5, iters = 60)
      .as[(Long, Double)].collect().toMap
    assert(watched == fixed, "watched must equal the full fixed-round run")
    // warm start from the fixed point: the renormalizing division
    // shifts grid cells, and under tol=0 the re-settle is a grid
    // crawl (the pageRankWatched warm spec's measured lesson) — so
    // the contract here is warm <= cold rounds and a tight node-wise
    // drift envelope, not an exact round count
    val prior = watchedDf.cache()
    val (warm, r2) = Graph.pageRankWeightedWatched(sym, damping = 0.5,
      maxIters = 60, tol = 0.0, init = Some(prior))
    assert(r2 <= rounds,
      s"warm from the fixed point ($r2 rounds) must not exceed cold ($rounds)")
    val wm = warm.as[(Long, Double)].collect().toMap
    val cell = math.pow(2, -30)
    assert(wm.keySet == watched.keySet)
    wm.foreach { case (id, r) =>
      assert(math.abs(r - watched(id)) <= 4 * cell,
        s"node $id drifted: $r vs ${watched(id)}")
    }
  }

  test("pageRank hubs rank above peripheral nodes on a star") {
    // star: 0 connected to 1..9 (symmetric) — hub must dominate
    val edges = (1L to 9L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("src", "dst")
    val pr = Graph.pageRank(edges, iters = 10).as[(Long, Double)].collect().toMap
    assert(pr(0L) > 3 * pr(1L))
    assert((1L to 9L).map(pr).distinct.size == 1) // symmetric leaves tie
  }
}
