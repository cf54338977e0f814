package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions.{asDouble, cosine, dot}
import graft.operators.Ckpt.CkptOps

/** Similarity-graph operators for corpus curation.
  *
  * A near-dup / kNN graph over a training corpus is the substrate for a
  * family of curation signals the flat per-document scores can't see:
  * centrality finds template/boilerplate HUBS (a page whose neighborhood
  * is huge is a mirror or a template, whatever its individual quality
  * score says), and the same graph drives diversity-aware sampling. The
  * reference engine stops at per-pair similarity (its ANN search,
  * `/root/reference/src/backend/hnsw.rs`); these operators take the pair
  * table the dedup tiers already produce and lift it to graph analytics,
  * expressed as iterative DataFrame joins — each round is a shuffle on
  * the edge key, nothing driver-resident, the same execution shape as
  * [[Dedup.connectedComponents]].
  */
object Graph {
  /** File-local shadow of `org.apache.spark.sql.functions.round`: every
    * per-row score here rounds a DOUBLE column at scale 6, where the
    * built-in pays BigDecimal per value (~430 ns — 1.7 s of the n²
    * knn_graph row alone). Routes through the exact-equivalent fast
    * HALF_UP expression (see [[graft.functions.expressions.RoundHalfUp]]
    * and RoundHalfUpSpec's brute-forced equivalence). */
  private def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column = {
    require(scale == 6, s"file-local fast round is scale-6 only (got $scale)")
    graft.functions.VectorFunctions.round6(c)
  }


  /** Exact k-nearest-neighbor graph over an embedding column: for every
    * vector, the `k` most cosine-similar OTHER vectors, as
    * (id, nb, rnk, score) with score rounded to 6 decimals and ties
    * broken to the smallest neighbor id.
    *
    * This is the all-pairs oracle tier: O(n^2) scored pairs, fine for a
    * fixture or a sampled slice, and the ground truth the blocked
    * variant ([[knnGraphLsh]]) measures recall against. The per-node
    * top-k goes through the bounded [[graft.functions.expressions.TopKScored]]
    * aggregator, so even here the shuffle carries at most k rows per
    * (map task, node), never the n^2 scored-pair table. */
  def knnGraph(emb: DataFrame, idCol: String, vecCol: String,
               k: Int): DataFrame = {
    // Norms are per-ROW quantities: compute sqrt(v.v) once per side
    // before the join instead of letting the cosine expand to three
    // dot products per PAIR (3x the flops on an n^2 join). Same
    // arithmetic per score — dot/(na*nb) with na,nb the identical
    // sequential self-dots — so results are bit-identical to the
    // inline-cosine formulation the oracle replays.
    // null and ZERO vectors carry no similarity signal: drop them up
    // front (a null cosine would NPE the typed top-k encoder
    // downstream, and an all-zero embedding yields 0/0 -> NULL cosine
    // with the same NPE — both hazards filtered at the scan)
    val a = emb.select(col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("va"))
      .where(col("id").isNotNull && col("va").isNotNull &&
        dot(col("va"), col("va")) > 0)
      .withColumn("na", sqrt(dot(col("va"), col("va"))))
    val b = emb.select(col(idCol).cast("long").as("nb"),
      asDouble(col(vecCol)).as("vb"))
      .where(col("nb").isNotNull && col("vb").isNotNull &&
        dot(col("vb"), col("vb")) > 0)
      .withColumn("nb_n", sqrt(dot(col("vb"), col("vb"))))
    // Parallelism must scale with the OUTPUT work (n^2 scored pairs),
    // not the input bytes: a small corpus parquet is one file split, and
    // a cross join inherits the stream side's partitioning, so without
    // this the whole n^2 scoring runs in ONE task (measured: 20k
    // vectors = 4e8 pairs pinned to a single core). One n-row hash
    // exchange per side is noise next to the n^2 it parallelizes;
    // repartitioning both sides keeps 32-way parallelism whichever side
    // the planner broadcasts. Same pairs, same scores, and topKPerNode's
    // bounded aggregator is merge-order-independent, so results are
    // unchanged.
    val scored = a.repartition(col("id")).crossJoin(b.repartition(col("nb")))
      .filter(col("id") =!= col("nb"))
      .select(col("id"), col("nb"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb_n")), 6)
          .as("score"))
    topKPerNode(scored, k)
  }

  /** LSH-blocked kNN graph — the 100 TB formulation. `tables`
    * independent sign-LSH keys (different seeds) bucket the corpus;
    * within-bucket pairs are the only candidates scored, so the join is
    * an equi-join on the bucket key instead of a cross join: cost is
    * sum of bucket^2 per table, and a vector's candidates live in the
    * same partitions its buckets hash to. Recall vs [[knnGraph]] is
    * measured in GraphSpec at the (bits, tables) knobs — more tables
    * raise recall, more bits shrink buckets; both are restatements of
    * the probe/recall trade every ANN tier in this repo makes.
    *
    * ==Duplicate-flood posture== (the [[Dedup.hammingBandedPairs]]
    * distinct-signature lesson lifted to raw vectors): a mirrored crawl
    * gives a vector m byte-identical copies, and a raw id-level bucket
    * self-join then scores m^2 candidate pairs PER TABLE for that one
    * vector — quadratic in the duplication factor. Here identical
    * vectors collapse to one CLASS (rep = min member id) first; bucket
    * joins, candidate dedup and cosine scoring all run over class reps
    * (one row per distinct vector), and members re-attach through two
    * provably sufficient bounded windows:
    *
    *   1. per class, the top `k+1` neighbor classes by
    *      (score desc, rep asc): any class outside that window cannot
    *      contribute to ANY member's top-k, because each class ranked
    *      above it supplies at least one member that outranks all of
    *      its members under the (score desc, id asc) member order —
    *      the `+1` absorbs the one exceptional case where a member's
    *      OWN class wins its tie-break through the member itself;
    *   2. per class, its `k+1` smallest member ids: within a class all
    *      scores tie, so the member order falls to id asc and only the
    *      smallest ids can surface (`+1` covers a member that is itself
    *      among its class's k smallest and must skip itself).
    *
    * The final [[topKPerNode]] pass then selects exactly the same top-k
    * set as the id-level formulation (same candidate superset, same
    * rounded scores, same tie-breaks) while pair mass stays linear in
    * corpus size: n x (k+1)^2 narrow expansion rows, never
    * (duplication factor)^2. */
  /** Smallest bit width in [4, 16] whose bucket count keeps expected
    * occupancy at or under `target` (64) for an `n`-vector corpus:
    * with FIXED bits, within-bucket pair mass grows n^2/2^bits — 10x
    * data means 100x pairs — so the production default must widen the
    * key with the corpus. Integer-exact on purpose (no log2 floats):
    * the oracle replays the same scan over [4, 16], and a
    * last-ulp log2 disagreement at a power-of-two boundary would flip
    * the whole signature layout between engines. Capped at 16 because
    * past that the recall cost of ever-finer buckets outruns the pair
    * savings — above ~4M vectors, raise `tables` or pre-block by IVF
    * cluster instead (both knobs exist). */
  def autoLshBits(n: Long, target: Long = 64L): Int =
    (4 to 16).find(b => (1L << b) * target >= n).getOrElse(16)

  /** `blockCol` (optional) scopes the whole graph to within-block
    * neighborhoods — bucket keys become (block, signature), so a
    * pre-clustering (e.g. `Cluster.assign`'s centroid id) bounds every
    * bucket by its block's size regardless of corpus scale. This is
    * the documented past-16-bits path: when the auto key is already at
    * its recall-driven cap, block first, then bucket. Same plan shape,
    * one extra narrow key column through the exchanges. Rows whose
    * block value is NULL coalesce into one shared sentinel block
    * ([[Knn.blockKey]]) — they stay in the graph and pair among
    * themselves instead of silently vanishing from the equi-joins.
    *
    * Auto bits (bits <= 0) size from the LARGEST BLOCK's count when
    * blockCol is set — `autoLshBits(maxBlockSize)` — so every block
    * sees at most the same ~64 expected cell occupancy the unblocked
    * auto key targets. Sizing from the GLOBAL count instead (the
    * pre-r15 default) runs occupancy at ~64/B for B same-sized blocks:
    * cheaper, but recall vs the exact graph measured 0.312 against the
    * per-block recipe's 0.450 at +50% cost (GraphBlockDrive,
    * BASELINE.md r14) — and the blocked tier is the recommended
    * 100 TB path, so its default buys recall, not the discount.
    * Callers who want the finer key back pass
    * `bits = autoLshBits(globalCount)` explicitly; pinned bits > 0
    * keep their exact layout. Both selections are integer-exact and
    * oracle-replayable (the max-block count is one GROUP BY + max,
    * the same scan DuckDB replays). */
  /** ==Occupancy escape valve (r16)== — blocked-auto only. The
    * per-block recipe keeps EXPECTED occupancy <= 64, but expectation
    * assumes signature-uniform vectors: a clustered block (the very
    * case blocking serves) can pour hundreds of near-identical-sign
    * classes into one cell, and at a pair-output corpus that single
    * hot cell dominates the whole sweep (the r15 watch item: 142.1 s
    * vs the global key's 109.4 s at 100x). So the blocked auto path
    * MEASURES before it buckets: one aggregation over class reps
    * counts each block's largest cell at the base key (table-0 seed),
    * and any block whose max cell exceeds `blockBucketCap` escalates
    * its OWN bit width — the smallest `b0 + e <= 16` with
    * `maxCell <= cap << e` (each extra bit halves expected cell mass;
    * integer-exact, no log2 floats, the [[autoLshBits]] stance) —
    * while quiet blocks keep the recall-friendly base key. Per-block
    * keys cost nothing extra at scoring time: LSH bit i depends only
    * on (seed, i), so a b-bit key IS the low b bits of the 16-bit key
    * (GraphSpec pins the prefix property) and escalated rows just mask
    * a wider key. The selection is replayed verbatim by the oracle's
    * occupancy/bits CTEs, so the hash gate pins the valve itself. */
  def knnGraphLsh(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                  dims: Int, bits: Int = 0, tables: Int = 4,
                  blockCol: Option[String] = None,
                  blockBucketCap: Long = 256L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val blk = Knn.blockKey(blockCol)
    val base = emb.select(col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("v"), blk.as("blk"))
      .where(col("id").isNotNull && col("v").isNotNull &&
        dot(col("v"), col("v")) > 0) // see knnGraph
    // bits <= 0 = auto: size the bucket key from a corpus count (one
    // cheap action against the n^2/2^bits pair mass it controls) —
    // the max BLOCK count when blocked (per-block occupancy <= 64,
    // the recall-over-cost recipe; scaladoc above), the global count
    // otherwise. Callers who pinned bits keep their exact layout.
    val useBits =
      if (bits > 0) bits
      else if (blockCol.isDefined) {
        // empty corpus: max over zero groups is NULL, not 0
        val mx = base.groupBy("blk").count().agg(max(col("count"))).head()
        autoLshBits(if (mx.isNullAt(0)) 0L else mx.getLong(0))
      }
      else autoLshBits(base.count())
    // Identical-vector class collapse: ONE map-side-combined groupBy on
    // the (block, vector) value (a hot class absorbs in the combiner),
    // one membership join back. These are the only vector-carrying
    // exchanges; everything downstream ships reps, buckets and scores.
    // Identical vectors in DIFFERENT blocks stay separate classes —
    // their neighborhoods differ by construction.
    val classes = base.groupBy("blk", "v")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("cnt"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
    val members = base.join(classes.select("blk", "v", "rep"), Seq("blk", "v"))
      .select("id", "rep")
    // k+1 smallest member ids per class (window 2 above). A constant
    // score makes the (score desc, id asc) order collapse to id asc —
    // an exact bounded smallest-ids aggregator (native TopKScored, r16).
    val smallIds = members.groupBy(col("rep"))
      .agg(graft.functions.expressions.TopKScored
        .topk(lit(0.0), col("id"), k + 1).as("top"))
      .select(col("rep"), col("top.id").as("ids"))
    // Candidate generation shuffles REP PAIRS ONLY: each bucket join
    // projects (rep, bkt) per side, so the bucket exchanges and the
    // union + dropDuplicates dedup exchange carry 16-byte rows — the
    // Hamming-family exchange discipline — instead of two dims-wide
    // double vectors per candidate (~12 KB at 768 dims). Vectors and
    // norms rejoin AFTER the dedup from the class projection, one
    // class-cardinality pass per side rather than one per surviving
    // candidate per table. Same candidate set, same scores.
    val crep = classes.select(col("rep").as("id"), col("v"), col("n"),
      col("blk"))
    // Occupancy escape valve (scaladoc above): per-block bit widths from
    // the measured largest cell at the base key. ONE job — two map-side-
    // combined aggregations over class-rep rows, escalated blocks
    // collected to the driver (<= numBlocks rows, the nprobe/centroid-
    // matrix bounded-scalar tier; hot blocks are by nature few) — then
    // the escalated widths ride into every table's key expression as a
    // literal blk -> bitmask map, so the valve adds zero joins and zero
    // re-executions to the candidate plan. Blocks at or under the cap
    // keep exactly the base key: a signature-uniform corpus is
    // bit-for-bit the pre-valve plan.
    val escalatedMasks: Map[String, Long] =
      if (bits <= 0 && blockCol.isDefined) {
        crep
          .select(col("blk"),
            Knn.signLshKey(col("v"), dims, useBits, seed = 1000L).as("bkt"))
          .groupBy("blk", "bkt").agg(count(lit(1)).as("cnt"))
          .groupBy("blk").agg(max("cnt").as("occ"))
          .filter(col("occ") > blockBucketCap)
          .collect()
          .map { r =>
            val occ = r.getLong(1)
            // smallest escalation e with occ <= cap * 2^e, capped at 16
            // bits — integer-exact (each extra bit halves expected mass)
            val b = (0 to (16 - useBits))
              .find(e => occ <= blockBucketCap * (1L << e))
              .map(useBits + _).getOrElse(16)
            r.getString(0) -> ((1L << b) - 1L)
          }.toMap
      } else Map.empty
    val candidates = (0 until tables).map { t =>
      // bucket key scoped by block: a block bounds its buckets no
      // matter how large the corpus grows
      val keyed =
        if (escalatedMasks.isEmpty)
          crep.select(col("id"), col("blk"),
            Knn.signLshKey(col("v"), dims, useBits, seed = 1000L + t).as("bkt"))
        else {
          // escalated blocks mask the low bits of the 16-bit key (= the
          // escalated-width key, by the plane-prefix property); cap-
          // abiding blocks evaluate only the base-width expression
          val mask = element_at(typedLit(escalatedMasks), col("blk"))
          crep.select(col("id"), col("blk"),
            when(mask.isNull,
              Knn.signLshKey(col("v"), dims, useBits, seed = 1000L + t))
            .otherwise(Knn.signLshKey(col("v"), dims, 16, seed = 1000L + t)
              .bitwiseAND(mask))
            .as("bkt"))
        }
      keyed.join(keyed.select(col("id").as("nb"), col("blk"), col("bkt")),
          Seq("blk", "bkt"))
        .filter(col("id") =!= col("nb"))
        .select("id", "nb")
    }.reduce(_ union _).dropDuplicates("id", "nb")
    // per-side norm hoist (the knnGraph stance): one dot per scored
    // pair instead of three; bit-identical scores
    val scoredClasses = candidates
      .join(crep.select(col("id"), col("v").as("va"), col("n")
        .as("na")), "id")
      .join(crep.select(col("id").as("nb"), col("v").as("vb"),
        col("n").as("nb_n")), "nb")
      .select(col("id").as("rep_a"), col("nb").as("rep_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb_n")), 6)
          .as("score"))
    // Members of a multi-member class are mutual neighbors at the
    // self-cosine (identical vectors share every bucket, so the
    // id-level formulation always paired them).
    val intra = classes.filter(col("cnt") >= 2)
      .select(col("rep").as("rep_a"), col("rep").as("rep_b"),
        round(dot(col("v"), col("v")) / (col("n") * col("n")), 6)
          .as("score"))
    // window 1: top-(k+1) neighbor classes per class. The kept id is
    // the neighbor's rep = its min member id, exactly the tie-break the
    // member order needs (native TopKScored, r16).
    val topClasses = scoredClasses.union(intra)
      .groupBy(col("rep_a"))
      .agg(graft.functions.expressions.TopKScored
        .topk(col("score"), col("rep_b"), k + 1).as("top"))
      .select(col("rep_a"), explode(col("top")).as("t"))
      .select(col("rep_a"), col("t.id").as("rep_b"),
        col("t.score").as("score"))
    // expand: every member of A x the k+1 smallest ids of each of A's
    // top classes — narrow (id, nb, score) rows, linear in corpus
    val expanded = members.withColumnRenamed("rep", "rep_a")
      .join(topClasses, Seq("rep_a"))
      .join(smallIds.select(col("rep").as("rep_b"), col("ids")),
        Seq("rep_b"))
      .select(col("id"), explode(col("ids")).as("nb"), col("score"))
      .filter(col("id") =!= col("nb"))
    topKPerNode(expanded, k)
  }

  /** Bounded per-node top-k over a scored (id, nb, score) pair table:
    * (score desc, nb asc) order, rnk 1..k, map-side partial. */
  private def topKPerNode(scored: DataFrame, k: Int): DataFrame =
    // native bounded top-k (r16): the typed Aggregator's groupByKey/
    // mapValues inserted two AppendColumns (full object-encoder passes
    // over every scored pair, breaking codegen before the partial
    // aggregate); TopKScored evaluates straight off the InternalRow.
    // Same (score desc, id asc) order, same map-side k-row bound.
    scored.groupBy("id")
      .agg(graft.functions.expressions.TopKScored
        .topk(col("score"), col("nb"), k).as("top"))
      .select(col("id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("id"), col("t.id").as("nb"),
        (col("pos") + 1).as("rnk"), col("t.score").as("score"))

  /** Quantize a score column onto the 2^-bits binary grid (floor).
    *
    * Decimal `round(x, 9)` is NOT engine-portable for graph
    * iterations: `score / outdeg` arithmetic with small integer
    * degrees systematically produces values whose shortest decimal
    * representation ends exactly in ...5 at the rounding digit, where
    * Spark's decimal-string HALF_UP and DuckDB's float-multiply
    * `round()` disagree (observed as a 1e-9 flap on
    * graph_label_spread at sf0.01). Power-of-two scaling is EXACT in
    * IEEE doubles (it only shifts the exponent), so `floor` on the
    * scaled value has no tie rule at all — both engines agree
    * whenever their pre-quantization sums fall in the same 2^-bits
    * cell, and nothing in 1/3-type arithmetic favors binary cell
    * boundaries the way it favors decimal halves. */
  private[operators] def quant(c: Column, bits: Int): Column = {
    val s = math.pow(2, bits)
    floor(c * lit(s)).cast("double") / lit(s)
  }

  /** Quantize a per-edge contribution term onto the 2^-48 grid BEFORE
    * it enters a `sum`, making the aggregation EXACT in IEEE doubles
    * and therefore order-independent: every term becomes an exact
    * multiple of 2^-48 (scaling by a power of two only shifts the
    * exponent; floor and the back-division are exact), and any partial
    * sum of such terms bounded by the total rank/score mass (<= ~1)
    * needs at most 48 + a few mantissa bits — under the 52 doubles
    * carry. Without this, Spark's partition-order-dependent float sum
    * vs DuckDB's own order can differ in the last ulp, and a
    * pre-quantization value landing within that ulp of a 2^-quantBits
    * cell boundary flips the floor — observed as a one-cell graph_ppr
    * flap whose occurrence depended on which OTHER queries ran in the
    * same session. The 2^-48 term grid costs at most indeg * 2^-48 of
    * bias per node per round — 5 orders of magnitude below the
    * 2^-30 state grid. */
  private def termQuant(c: Column): Column = quant(c, 48)

  /** PageRank by fixed-round power iteration over a directed edge list
    * (src, dst) — undirected graphs pass both directions. Returns
    * (id, rank) over nodes = distinct(src union dst).
    *
    * Engine-portable determinism (the repo-wide oracle stance): ranks
    * quantize onto the 2^-quantBits grid ([[quant]]) after EVERY
    * update, so two engines whose per-node contribution sums differ in
    * the last float bit re-quantize to identical values each round
    * instead of compounding; the teleport term is written
    * `(1 - damping) / n` COMPUTED — not a pre-simplified literal —
    * because `1.0 - 0.85 != 0.15` in doubles (the [[Knn.mmrRerank]]
    * lesson).
    *
    * Dangling nodes (in-edges only) leak rank mass under the naive
    * update; the standard fix redistributes their mass uniformly. That
    * mass is a per-round GLOBAL scalar, but it never touches the
    * driver: a 1-row aggregate cross-joined back in broadcast, so the
    * loop stays fully declarative. Each round is one shuffle on dst
    * plus the node-table join; `localCheckpoint` truncates the
    * per-round lineage exactly as in [[Dedup.connectedComponents]] —
    * at SERIALIZED storage (r15, the [[kCore]] heap-cliff lesson:
    * the default deserialized checkpoint holds each partition as an
    * in-heap object array, ~3.5x the serialized bytes; node-scale
    * state on a billion-node graph hits the same cliff kCore's
    * edge-scale state hit at the 100x sweep).
    * Fixed `iters` (not convergence-tested) keeps the round count — and
    * thus the oracle's recursion depth — identical across engines; at
    * 100 TB use [[pageRankWatched]], which watches the L1 delta with
    * the same plan per round. */
  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 5,
               quantBits: Int = 30): DataFrame =
    pageRankLoop(edges, damping, iters, watchTol = None, quantBits)._1

  /** Convergence-watched PageRank — the 100 TB production mode the
    * fixed-round tier's scaladoc promises: iterate until the L1 delta
    * `sum(|rank' - rank|)` falls to `tol` or `maxIters` rounds, whichever
    * first. The delta is a 1-row aggregate over the two (checkpointed)
    * consecutive rank tables — one extra cheap job per round, never a
    * per-node driver loop. Returns (ranks, roundsRun).
    *
    * `tol = 0.0` runs to the EXACT fixed point of the quantized update:
    * on the 2^-quantBits grid a round that changes nothing is truly
    * stable, so stopping there is indistinguishable from running the
    * remaining rounds — which is what makes the watched variant
    * oracle-checkable against a fixed-`maxIters` replay (early-stop at
    * the fixed point and the full-length run produce the identical
    * table, converged or not). Fixed-round [[pageRank]] stays the
    * oracle tier for graph_pagerank itself.
    *
    * PERIOD-2 CYCLES: the quantized contraction can settle into an
    * adjacent-cell 2-cycle instead of a fixed point (measured on the
    * 1.6k-node supplier-customer graph: delta1 parks at 3 grid cells
    * from round 31 on while state(r) == state(r-2) exactly), which
    * would defeat a pure delta1 watch forever. The loop therefore also
    * watches the two-rounds-back L1 delta and stops on an exact cycle
    * — but ONLY when the remaining round budget is EVEN: a period-2
    * state revisits itself every 2 rounds, so with an even remainder
    * the returned state is bit-identical to what running out the full
    * `maxIters` would produce, preserving the fixed-round-replay
    * oracle equality unconditionally.
    *
    * `init` (incremental mode): seed from a prior (id, rank) table
    * instead of uniform — the production re-run path when edges change
    * incrementally. New nodes get uniform mass, departed nodes drop,
    * and the seed RENORMALIZES to total mass 1 (one O(1) driver
    * scalar): the update would self-correct mass on its own, but only
    * geometrically, and a grown graph's ~1/n seed-mass excess decaying
    * to tol floors the round count at log(1/(n*tol)) — measured 15
    * rounds where the perturbation alone needed ~5. The division can
    * shift grid cells by one, so an unchanged graph confirms in at
    * most TWO rounds rather than exactly one; a perturbed graph
    * converges in the rounds the PERTURBATION needs, not the
    * cold-start count. Caveat, inherent to grid dynamics: the
    * quantized map can admit ADJACENT-CELL fixed points, so a warm run
    * may settle within a few 2^-quantBits cells of the cold result
    * rather than bit-identically on it (the unquantized fixed point is
    * unique; grid attractors differ by O(cell)). Warm starts follow a
    * different trajectory, so they exist only on this watched tier;
    * the fixed-round oracle tier always starts cold. */
  def pageRankWatched(edges: DataFrame, damping: Double = 0.85,
                      maxIters: Int = 50, tol: Double = 0.0,
                      quantBits: Int = 30,
                      init: Option[DataFrame] = None): (DataFrame, Int) =
    pageRankLoop(edges, damping, maxIters, watchTol = Some(tol), quantBits,
      init)


  private def pageRankLoop(edges: DataFrame, damping: Double, iters: Int,
                           watchTol: Option[Double], quantBits: Int,
                           init: Option[DataFrame] = None): (DataFrame, Int) = {
    // Persist the raw edge list FIRST: deg, nodes, eout and the
    // dangling probe all derive from it, and an upstream edge source
    // can itself be expensive (the kNN graph) — without this cache
    // each derivation would re-run that upstream plan.
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    // loop-invariant: the edge list already joined to its out-degree —
    // materialized once instead of re-joined every round
    // NOT pre-partitioned by src (r16 tested-and-reverted): hash-
    // clustering the cache by the per-round join key removes the
    // per-round edge exchange from the STATIC plan, but it also removes
    // the query-stage boundary AQE needs to convert each round's join
    // into a broadcast hash join of the (much smaller) rank side —
    // measured +30-45% per watched row at sf0.1 (SMJ sort+merge every
    // round instead of a broadcast probe of the in-place cache). With
    // the plain cache AQE picks per round from runtime sizes: broadcast
    // while ranks fit, sort-merge with the edge exchange when they
    // don't — the right call at every scale without a hand-rolled
    // threshold.
    val eout = e.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // Two one-time driver scalars (the nprobe stance): n sizes the
      // teleport term; hasDangling decides ONCE whether the per-round
      // dangling-mass subplan exists at all — a symmetrized similarity
      // graph never has dangling nodes, and dropping the subplan saves
      // two stages per round. Arithmetic is identical either way: the
      // no-dangling branch adds the same literal 0.0 the dangling
      // branch's empty aggregate produces.
      val n = nodes.count().toDouble
      val hasDangling = nodes
        .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
        .limit(1).count() > 0
      val teleport = (1.0 - damping) / n
      // Warm start (incremental mode): seed from prior ranks instead of
      // uniform — an unchanged graph confirms within two rounds (one
      // confirming round, plus one settling round when the
      // renormalizing division shifts a grid cell); a perturbed graph
      // converges in the rounds the perturbation needs, not the
      // cold-start count. The init is LEFT-joined onto the CURRENT
      // node set (new nodes get the uniform mass, departed nodes drop)
      // so rank stays a distribution whatever the caller hands in. A
      // warm start is a different trajectory, so it belongs to the
      // watched tier only — the fixed-round oracle tier always starts
      // cold.
      //
      // State schema (r16): (id, rank, p1, p2) — the previous and
      // two-rounds-back ranks ride INSIDE the checkpointed state, so
      // the per-round watch probe is one aggregate scan of the frame
      // the round just materialized instead of a 3-way join of three
      // checkpoints (guide §2.4: the probe's two id-keyed exchanges
      // per round are gone; the rank arithmetic is untouched and the
      // final select drops the watch columns).
      val noPrev = lit(null).cast("double")
      // tol = 0 fast path (r16, the connectedComponents accumulator
      // discipline): the ONLY question the probe answers at tol = 0 is
      // "is the L1 delta (or the two-rounds-back delta) EXACTLY zero?",
      // and a sum of non-negative |differences| bumped by an
      // accumulator DURING the checkpoint materialization answers that
      // with zero extra jobs per round — task retry/speculation can
      // only over-count a non-zero sum, never fabricate a zero, so the
      // ==0 decision is re-execution-safe (the same monotone argument
      // markChg makes). tol > 0 keeps the separate aggregate probe: an
      // inflated sum could wrongly miss `delta <= tol` and change the
      // stopping round.
      val accTol0 = watchTol.contains(0.0)
      val acc1 = edges.sparkSession.sparkContext.doubleAccumulator("pr_d1")
      val acc2 = edges.sparkSession.sparkContext.doubleAccumulator("pr_d2")
      val markDelta = udf { (r: Double, p1: java.lang.Double, p2: java.lang.Double) =>
        if (p1 != null) acc1.add(math.abs(r - p1))
        if (p2 != null) acc2.add(math.abs(r - p2))
        true
      }.asNondeterministic()
      var rank = init match {
        case Some(r0) =>
          val seeded = nodes.join(
            r0.select(col("id").cast("long").as("id"),
              col("rank").cast("double").as("r0"))
              .where(col("id").isNotNull && col("r0").isNotNull &&
                col("r0") >= 0),
            Seq("id"), "left")
            .select(col("id"), coalesce(col("r0"), lit(1.0 / n)).as("r0"))
          // RENORMALIZE to total mass 1 (one O(1) driver scalar, the
          // n/hasDangling stance; refuses an all-zero seed loudly).
          // The update would self-correct mass on its own (teleport
          // injects (1 - damping) per round), but only geometrically:
          // an un-renormalized seed over a grown graph carries a ~1/n
          // mass excess whose decay to tol floors the round count at
          // log(1/(n*tol)) — measured 15 rounds where the perturbation
          // alone needed ~5 — defeating the whole point of warm
          // starting. The division's cell-shift cost is one extra
          // confirming round when the seed was already the fixed point.
          val t = seeded.agg(sum(col("r0"))).head().getDouble(0)
          require(t > 0, "pageRank warm start needs positive total mass")
          seeded.select(col("id"),
              quant(col("r0") / lit(t), quantBits).as("rank"),
              noPrev.as("p1"), noPrev.as("p2"))
            .ckptSer()
        case None => nodes.select(col("id"),
          quant(lit(1.0 / n), quantBits).as("rank"),
          noPrev.as("p1"), noPrev.as("p2"))
      }
      var rounds = 0
      var converged = false
      while (rounds < iters && !converged) {
        // Union-fused update (r17, guide §2.4 "two operations keyed the
        // same way can share one exchange"): the contribution aggregate
        // and the state join are BOTH id-keyed, so the state rows ride
        // the same groupBy exchange as the per-edge terms instead of
        // paying a second id-keyed join (broadcast build or shuffle)
        // per round. Terms keep the 2^-48 grid, so the per-id sum is
        // EXACT and order-independent — rows moving between partial
        // aggregates cannot change it; the state columns pass through
        // as max() over exactly one non-null value per id (the state
        // has one row per node). Row set: contrib ids ⊆ nodes = state
        // ids, so the grouped set is exactly the node set — identical
        // to the old LEFT join from the state.
        val nullD = lit(null).cast("double")
        val terms = eout
          .join(rank.select(col("id").as("src"), col("rank")), "src")
          .select(col("dst").as("id"),
            termQuant(col("rank") / col("outdeg")).as("c"),
            nullD.as("r0"), nullD.as("q1"))
        val stateRows = rank.select(col("id"), nullD.as("c"),
          col("rank").as("r0"), col("p1").as("q1"))
        val agg = terms.union(stateRows).groupBy("id")
          .agg(sum(col("c")).as("contrib"), max(col("r0")).as("pr1"),
            max(col("q1")).as("pr2"))
        val withDm =
          if (hasDangling) {
            val dangling = rank.select(col("id"), col("rank"))
              .join(deg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
              .agg(coalesce(sum("rank"), lit(0.0)).as("dm"))
            agg.crossJoin(broadcast(dangling))
          } else {
            agg.withColumn("dm", lit(0.0))
          }
        val updated = withDm
          .select(col("id"),
            quant(lit(teleport) + lit(damping) *
              (coalesce(col("contrib"), lit(0.0)) + col("dm") / lit(n)),
              quantBits).as("rank"),
            col("pr1").as("p1"), col("pr2").as("p2"))
        acc1.reset(); acc2.reset()
        val next = (if (accTol0)
            // tol = 0: both watch sums ride the materialization job as
            // accumulator bumps (scaladoc above) — zero probe jobs
            updated.withColumn("_chg",
              markDelta(col("rank"), col("p1"), col("p2")))
          else updated)
          // eager, not lazy: each round materializes against the cached
          // edge table (measured fastest of the four checkpoint
          // placements — lazy variants either re-optimize a deep plan
          // or race the finally-block unpersist of their upstream)
          .ckptSer()
        // the probe only decides whether to CONTINUE — on the final
        // round there is nothing left to decide, so skip it
        // (mirrored in the labelSpread/ppr loops)
        if (rounds + 1 < iters) watchTol.foreach { t =>
          val (delta, delta2) =
            if (accTol0)
              // acc2 carries signal only once a two-rounds-back state
              // exists (p2 is null through round 1)
              (acc1.value.doubleValue,
                if (rounds >= 1) acc2.value.doubleValue else -1.0)
            else {
              // tol > 0: one aggregate scan of the just-checkpointed
              // frame — no joins, p1/p2 are columns of the state.
              // sum() skips null p2 rows; read null as "no signal".
              val r = next
                .agg(sum(abs(col("rank") - col("p1"))).as("d1"),
                  sum(abs(col("rank") - col("p2"))).as("d2"))
                .head()
              (r.getDouble(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1))
            }
          if (delta <= t) converged = true
          // period-2 cycle watch: exact revisit of the state two
          // rounds back, stop only on an EVEN remaining budget so the
          // result equals the full fixed-round run (scaladoc)
          else if (delta2 == 0.0 && (iters - (rounds + 1)) % 2 == 0)
            converged = true
        }
        rank = next
        rounds += 1
      }
      nodes.unpersist()
      (rank.select(col("id"), col("rank")), rounds)
    } finally { eout.unpersist(); e.unpersist(); () }
  }

  /** Symmetrize a (id, nb) neighbor table into a distinct directed edge
    * list carrying both directions — the adjacency a cosine kNN graph
    * means (similarity is symmetric even when top-k membership isn't). */
  def symmetrize(pairs: DataFrame, aCol: String = "id",
                 bCol: String = "nb"): DataFrame =
    pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()

  /** Per-node triangle count and local clustering coefficient over an
    * UNDIRECTED graph given as a symmetric directed edge list (both
    * directions present, no self-loops — [[symmetrize]]'s output).
    * Returns (id, degree, triangles, clustering) with clustering =
    * round(2*triangles / (degree*(degree-1)), 6) and 0.0 for degree<2.
    *
    * Triangles are the standard curation signal for community density:
    * a near-dup cluster or template farm shows up as a
    * high-clustering-coefficient neighborhood long before connected
    * components merge it. All-integer counting — no float portability
    * concerns until the final coefficient.
    *
    * Plan shape: count each triangle once at its smallest vertex via
    * the oriented wedge join (a<b<c: edges a-b, a-c checked against
    * b-c), then credit all three corners — three shuffles on edge keys,
    * never a matrix product. Skew: a hub of degree D contributes D^2/2
    * wedges — the standard cost of exact triangle counting; this tier's
    * contract is degree-bounded graphs (the kNN composition bounds
    * degree at k x tables by construction). For arbitrary edge lists
    * with possible crawl-scale hubs use [[triangleCountsCapped]], the
    * sampled unbiased estimator. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      // defensive: a self-loop would count phantom wedges; the contract
      // says none, enforce it rather than trust it
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("degree"))
      // oriented edges a<b ensure each triangle is ONE (a,b,c) wedge hit
      val fwd = e.filter(col("src") < col("dst"))
      val wedges = fwd.select(col("src").as("a"), col("dst").as("b"))
        .join(fwd.select(col("src").as("a"), col("dst").as("c")), "a")
        .filter(col("b") < col("c"))
      val tris = wedges.join(
        fwd.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
      val perCorner = tris.select(col("a").as("id"))
        .union(tris.select(col("b").as("id")))
        .union(tris.select(col("c").as("id")))
        .groupBy("id").agg(count(lit(1)).as("triangles"))
      deg.join(perCorner, Seq("id"), "left")
        .select(col("id"), col("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"),
          when(col("degree") < 2, lit(0.0)).otherwise(
            round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
              (col("degree") * (col("degree") - 1)), 6)).as("clustering"))
    } finally { e.unpersist(); () }
  }

  /** Degree histogram of a directed edge list: (degree, nodes) rows,
    * one per distinct out-degree. The graph-health profile read before
    * the expensive analytics: a heavy tail here is what says the exact
    * triangle tier would stall on a hub and [[triangleCountsCapped]]'s
    * cap should sit at (say) the knee of this histogram; a near-delta
    * histogram says the graph is degree-bounded (the kNN composition)
    * and the exact tiers are safe. Two map-side-combined aggregations,
    * output cardinality = distinct degrees (tiny at any corpus size). */
  def degreeProfile(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("nodes"))

  /** Newman modularity of a community assignment, per community:
    * Q_c = m_c/m − (d_c/2m)² — the fraction of edges INSIDE community
    * c minus the fraction expected under the degree-preserving random
    * rewiring. Σ Q_c is the standard did-the-communities-mean-anything
    * read over [[labelPropagation]]'s (or any) assignment: ~0 for one
    * blob or a random split, toward 1 for well-separated dense blocks.
    * On the symmetrized directed representation (2m rows): per
    * community, `ends` = directed rows leaving c (= d_c) and
    * `internal_ends` = rows with BOTH endpoints in c (= 2·m_c), so
    * Q_c = internal_ends/rows − (ends/rows)².
    *
    * Plan: two id-keyed joins stamping each edge end with its
    * community, ONE (community)-keyed aggregation (map-side
    * combinable), a broadcast 1-row total — no window, no iteration.
    * `assign` must cover every node in the edge list ((id, label) —
    * exactly what the community/CC ops emit); edges whose endpoint is
    * missing from the assignment are dropped by the inner join, which
    * would silently skew Q, so coverage is the caller's contract (a
    * composed `analyze --op communities` output always satisfies it).
    * Returns (label, internal_ends, ends, q) per community. */
  def modularity(edges: DataFrame, assign: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val lab = assign.select(col("id").cast("long").as("id"),
      col("label").cast("long").as("label"))
    val stamped = e
      .join(lab.select(col("id").as("src"), col("label").as("c_s")), "src")
      .join(lab.select(col("id").as("dst"), col("label").as("c_d")), "dst")
    val per = stamped.groupBy(col("c_s").as("label"))
      .agg(count(lit(1)).as("ends"),
        sum(when(col("c_s") === col("c_d"), 1L).otherwise(0L))
          .as("internal_ends"))
    val total = per.agg(sum("ends").as("rows2m"))
    per.crossJoin(broadcast(total))
      .select(col("label"), col("internal_ends"), col("ends"),
        round(col("internal_ends") / col("rows2m") -
          (col("ends") / col("rows2m")) * (col("ends") / col("rows2m")),
          6).as("q"))
  }

  /** k-core: the maximal subgraph in which every surviving node keeps
    * degree >= k — computed by the standard iterative peel (drop all
    * nodes under k, recount, repeat). Where [[degreeProfile]] reads the
    * degree DISTRIBUTION, the k-core finds the dense SUBSTRATE: on a
    * near-dup similarity graph the high-k cores are the template/
    * boilerplate families whose members all resemble many others (the
    * curation targets), while sparse chains of borderline matches peel
    * away.
    *
    * Termination is different in kind from the watched family: peeling
    * is MONOTONE (the node set only shrinks), so the fixpoint watch
    * always fires and there is no cycle case — equal edge COUNTS
    * between rounds therefore imply the equal edge SET, and the
    * count that each round's materialization already needs doubles as
    * the convergence probe (zero extra jobs). `maxIters` is a
    * fail-loud guard, not a result knob (the CC-maxIter stance): a
    * pathological chain peels O(n) rounds (a k=2 path loses only its
    * two endpoints per round), and refusing loudly beats returning a
    * partially-peeled set that silently isn't a core. A replay capped
    * at R >= the peel depth is exact for ANY such R — extra rounds are
    * identity on the settled set (what makes the unrolled oracle
    * valid).
    *
    * Scale shape per round: one degree aggregation (map-side
    * combinable) + two id-keyed joins filtering the edge set; edge
    * state is held as SERIALIZED rolling persists (re-anchored by a
    * serialized localCheckpoint every 8 rounds so deep peels keep
    * bounded lineage — see the body comments for the heap and
    * fault-tolerance trades), and the input edge list materializes
    * ONCE up front so an expensive upstream (a kNN build) is never
    * recomputed across rounds. The returned core is node-scale and
    * materialized; the final edge persist is released before return,
    * so a long-lived session never accumulates cached edge tables
    * across kCore calls.
    *
    * Expects the symmetrized directed representation ([[symmetrize]]);
    * returns ((id, deg) of the surviving core with deg counted INSIDE
    * the core, rounds run — the final confirming no-op round
    * included). An empty core (k above the densest node) returns zero
    * rows. */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 100): (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    // SERIALIZED rolling persists, not localCheckpoint: the per-round
    // edge state is corpus-scale (29M rows at the 100x sweep), and
    // localCheckpoint materializes each partition as a deserialized
    // in-heap array (~56 B/row object overhead vs ~16 B serialized) —
    // two live generations plus shuffle buffers sat exactly at the
    // 8 GB heap cliff, flaky-OOMing in-suite. MEMORY_AND_DISK_SER is
    // ~3.5x smaller, spills instead of dying, and the peel's <= 8
    // bounded rounds keep the un-truncated lineage shallow (truncation
    // is what localCheckpoint bought the 50-round pagerank loops; this
    // loop doesn't need it). Repartition by src first — the operator
    // must not trust caller partition sizing (a coarse parquet scan
    // hands out tens of millions of rows per split), and round 1's
    // groupBy("src") reuses the hash partitioning. Each round
    // unpersists the previous edge state once the next is counted.
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    var nEdges = e.count()
    var rounds = 0
    var stable = nEdges == 0L
    while (!stable) {
      if (rounds >= maxIters) throw new IllegalStateException(
        s"kCore did not settle in $maxIters rounds (edge set still " +
          s"shrinking at $nEdges edges): a long borderline chain peels " +
          "one layer per round — raise maxIters deliberately")
      val alive = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("src")
      val peeled = e.join(alive, "src")
        .join(alive.select(col("src").as("dst")), "dst")
        .select("src", "dst")
      // Fault-tolerance trade of the rolling persists: the next round's
      // plan references THIS round's cached frame, whose own plan reaches
      // back through every already-unpersisted generation — on cached-
      // block loss in a cluster the recompute re-executes the whole peel
      // from source instead of failing fast as localCheckpoint would.
      // The shallow-peel case (the <= 8 rounds every measured corpus
      // needs) accepts that for the cheaper persist; a DEEP peel (a long
      // borderline chain) re-anchors with a serialized localCheckpoint
      // every 8 rounds so un-truncated lineage depth stays bounded at 8
      // regardless of how far maxIters was deliberately raised.
      val next =
        if ((rounds + 1) % 8 == 0)
          peeled.ckptSer()
        else peeled.persist(StorageLevel.MEMORY_AND_DISK_SER)
      val n = next.count()
      e.unpersist(blocking = false)
      rounds += 1
      stable = n == nEdges || n == 0L
      e = next
      nEdges = n
    }
    // Materialize the node-scale result and release the final edge
    // state before returning: explicit persists are held by the
    // CacheManager until unpersist/clearCache (unlike localCheckpoint
    // blocks, reclaimed by the ContextCleaner once references drop), so
    // a returned frame depending on the last round's cached edges would
    // pin one corpus-scale table per kCore call in a long-lived session.
    val core = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
      .ckptSer()
    e.unpersist(blocking = false)
    (core, rounds)
  }

  /** Similarity-WEIGHTED PageRank over a (src, dst, w) edge list: the
    * random surfer follows edges in proportion to their weight
    * (contribution = rank · w / outgoing-weight-sum), so centrality
    * concentrates along STRONG similarity paths — on a kNN graph, a hub
    * of near-duplicates outranks a hub of marginal neighbors that plain
    * [[pageRank]] would score identically. Companion to
    * [[labelPropagationWeighted]] on [[symmetrizeWeighted]] substrates.
    *
    * Same engine-portable grids as [[pageRank]]: every rank·w/outw term
    * floors onto the 2^-48 grid before summation, states requantize
    * onto 2^-quantBits per round. Zero/negative/null-weight edges are
    * dropped (they carry no walk mass). Designed for symmetrized
    * weighted graphs, where every node has outgoing weight; an
    * arbitrary directed list with weighted-dangling nodes is REFUSED
    * loudly rather than silently leaking walk mass (the PPR stance) —
    * use [[pageRank]]'s dangling redistribution for those. */
  def pageRankWeighted(edges: DataFrame, damping: Double = 0.85,
                       iters: Int = 5, quantBits: Int = 30): DataFrame =
    pageRankWeightedLoop(edges, damping, iters, watchTol = None,
      quantBits)._1

  /** Convergence-watched WEIGHTED PageRank — [[pageRankWatched]]'s
    * contract (L1-delta watch, period-2 cycle watch on an even
    * remaining budget, warm `init` with mass renormalization) over
    * [[pageRankWeighted]]'s rank·w/outw update, closing the family
    * asymmetry where the 100 TB watched mode stopped at the unweighted
    * tier. `tol = 0.0` runs to the exact fixed point of the quantized
    * update, so early-stop is indistinguishable from running out
    * `maxIters` — the fixed-round-replay oracle equality. The same
    * no-weighted-dangling refusal applies (symmetrized inputs).
    * Returns (ranks, roundsRun). */
  def pageRankWeightedWatched(edges: DataFrame, damping: Double = 0.85,
                              maxIters: Int = 50, tol: Double = 0.0,
                              quantBits: Int = 30,
                              init: Option[DataFrame] = None)
      : (DataFrame, Int) =
    pageRankWeightedLoop(edges, damping, maxIters, watchTol = Some(tol),
      quantBits, init)

  private def pageRankWeightedLoop(edges: DataFrame, damping: Double,
                                   iters: Int, watchTol: Option[Double],
                                   quantBits: Int,
                                   init: Option[DataFrame] = None)
      : (DataFrame, Int) = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
      .filter(col("src") =!= col("dst") && col("w").isNotNull && col("w") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outw = e.groupBy("src").agg(sum("w").as("outw"))
    // not pre-partitioned by src — see pageRankLoop's eout note (r16)
    val eout = e.join(outw, "src")
      .select(col("src"), col("dst"), col("w"), col("outw"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = nodes.count().toDouble
        val dangling = nodes
          .join(outw.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
          .limit(1).count()
        require(dangling == 0,
          "pageRankWeighted expects every node to carry outgoing weight " +
            "(a symmetrizeWeighted graph); dangling nodes would leak walk " +
            "mass — use pageRank's dangling redistribution instead")
        val teleport = (1.0 - damping) / n
        // watch columns ride inside the state (the r16 pageRankLoop
        // restructure): (id, rank, p1, p2), probe = accumulator bumps
        // fused into the materialization job at tol = 0 (re-execution-
        // safe for ==0 decisions, see pageRankLoop), one aggregate scan
        // otherwise — no joins either way
        val noPrev = lit(null).cast("double")
        val accTol0 = watchTol.contains(0.0)
        val acc1 = edges.sparkSession.sparkContext.doubleAccumulator("prw_d1")
        val acc2 = edges.sparkSession.sparkContext.doubleAccumulator("prw_d2")
        val markDelta = udf { (r: Double, p1: java.lang.Double, p2: java.lang.Double) =>
          if (p1 != null) acc1.add(math.abs(r - p1))
          if (p2 != null) acc2.add(math.abs(r - p2))
          true
        }.asNondeterministic()
        var rank = init match {
          case Some(prior) =>
            // warm start: prior ranks where known, uniform mass for new
            // nodes, RENORMALIZED to total mass 1 (the pageRankLoop
            // rule — without it a grown graph's seed-mass excess decays
            // only geometrically and floors the round count)
            val seeded = nodes.join(
                prior.select(col("id").cast("long").as("id"),
                  col("rank").cast("double").as("r0")), Seq("id"), "left")
              .select(col("id"),
                coalesce(col("r0"), lit(1.0 / n)).as("r0"))
            val t = seeded.agg(sum(col("r0"))).head().getDouble(0)
            require(t > 0,
              "pageRankWeighted warm start needs positive total mass")
            seeded.select(col("id"),
                quant(col("r0") / lit(t), quantBits).as("rank"),
                noPrev.as("p1"), noPrev.as("p2"))
              .ckptSer()
          case None => nodes.select(col("id"),
            quant(lit(1.0 / n), quantBits).as("rank"),
            noPrev.as("p1"), noPrev.as("p2"))
        }
        var rounds = 0
        var converged = false
        while (rounds < iters && !converged) {
          // Union-fused update (r17): state rows ride the contribution
          // groupBy's exchange instead of a second id-keyed join per
          // round — see pageRankLoop; terms stay on the 2^-48 grid so
          // the shared aggregation is exact and order-independent.
          val nullD = lit(null).cast("double")
          val terms = eout
            .join(rank.select(col("id").as("src"), col("rank")), "src")
            .select(col("dst").as("id"),
              termQuant(col("rank") * col("w") / col("outw")).as("c"),
              nullD.as("r0"), nullD.as("q1"))
          val stateRows = rank.select(col("id"), nullD.as("c"),
            col("rank").as("r0"), col("p1").as("q1"))
          val updated = terms.union(stateRows).groupBy("id")
            .agg(sum(col("c")).as("contrib"), max(col("r0")).as("pr1"),
              max(col("q1")).as("pr2"))
            .select(col("id"),
              quant(lit(teleport) + lit(damping) *
                coalesce(col("contrib"), lit(0.0)), quantBits).as("rank"),
              col("pr1").as("p1"), col("pr2").as("p2"))
          acc1.reset(); acc2.reset()
          val next = (if (accTol0)
              updated.withColumn("_chg",
                markDelta(col("rank"), col("p1"), col("p2")))
            else updated)
            .ckptSer() // eager — see [[pageRank]]
          // one fused L1+cycle probe per round, skipped on the final
          // round (the pageRankLoop discipline)
          if (rounds + 1 < iters) watchTol.foreach { t =>
            val (delta, delta2) =
              if (accTol0)
                (acc1.value.doubleValue,
                  if (rounds >= 1) acc2.value.doubleValue else -1.0)
              else {
                val r = next
                  .agg(sum(abs(col("rank") - col("p1"))).as("d1"),
                    sum(abs(col("rank") - col("p2"))).as("d2"))
                  .head()
                (r.getDouble(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1))
              }
            if (delta <= t) converged = true
            else if (delta2 == 0.0 && (iters - (rounds + 1)) % 2 == 0)
              converged = true
          }
          rank = next
          rounds += 1
        }
        (rank.select(col("id"), col("rank")), rounds)
      } finally { nodes.unpersist(); () }
    } finally { eout.unpersist(); e.unpersist(); () }
  }

  /** [[symmetrize]] with the edge weight carried along: both directions
    * unioned, duplicate (src, dst) rows collapsed to the MAX weight —
    * deterministic whatever the caller's pair table contains (a cosine
    * kNN graph is weight-symmetric, so max is a no-op there). */
  def symmetrizeWeighted(pairs: DataFrame, aCol: String = "id",
                         bCol: String = "nb",
                         wCol: String = "score"): DataFrame =
    pairs.select(col(aCol).as("src"), col(bCol).as("dst"),
        col(wCol).as("w"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst"),
        col(wCol).as("w")))
      .groupBy("src", "dst").agg(max("w").as("w"))

  /** Weight-aware [[labelPropagation]] — what a SIMILARITY graph wants:
    * each neighbor's vote counts its edge weight (the kNN cosine), so
    * one 0.98-similar neighbor outvotes three 0.3-similar ones instead
    * of losing 3:1. Same synchronous scaffold and total-order tie rule,
    * with (max weight-sum, then min label) deciding each node.
    *
    * Engine-portable determinism (the graph-iteration stance): every
    * weight floors onto the 2^-48 grid BEFORE summation ([[termQuant]]),
    * so per-(node, label) vote sums are EXACT in doubles — order-
    * independent across Spark scheduling and replaying engines — for
    * degree x maxWeight up to ~2^4 at full precision (the kNN
    * composition: degree <= k x tables, cosine <= 1). Ties after exact
    * sums break to the smaller label; no float comparison ambiguity
    * remains. Expects [[symmetrizeWeighted]] edges ((src, dst, w) rows,
    * w > 0 — zero/negative/null-weight edges are dropped up front since
    * they carry no vote). */
  def labelPropagationWeighted(edges: DataFrame, iters: Int = 5): DataFrame =
    lpaWeightedLoop(edges, iters, watched = false)._1

  /** Convergence-watched WEIGHTED LPA — [[labelPropagationWatched]]'s
    * contract over [[labelPropagationWeighted]]'s vote rule, closing
    * the family asymmetry where the 100 TB watched mode stopped at the
    * unweighted tier. Labels are integers and the 2^-48-floored vote
    * sums are exact, so the probes are the same exact set+value
    * comparisons (full outer joins — node-set drift counts as change),
    * and the stop rules (true fixed point, or an exact period-2
    * revisit on an even remaining budget) make
    * `watched(maxIters) == labelPropagationWeighted(maxIters)` at any
    * knobs — the oracle contract the unweighted twin carries.
    *
    * `init` = warm start (the family's incremental mode): round 0
    * labels from a prior (id, label) assignment; new nodes enter as
    * their own label, departed ids drop. An unchanged graph confirms
    * its prior communities in 1 round. */
  def labelPropagationWeightedWatched(edges: DataFrame,
                                      maxIters: Int = 50,
                                      init: Option[DataFrame] = None)
      : (DataFrame, Int) =
    lpaWeightedLoop(edges, maxIters, watched = true, init)

  private def lpaWeightedLoop(edges: DataFrame, iters: Int,
                              watched: Boolean,
                              init: Option[DataFrame] = None)
      : (DataFrame, Int) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
      .filter(col("src") =!= col("dst") && col("w").isNotNull && col("w") > 0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("id")).distinct()
      val nullL = lit(null).cast("long")
      val base = init match {
        case Some(prior) =>
          // warm start: prior labels where known, own id for new nodes;
          // departed ids drop via the node-set join (the lpaLoop rule)
          nodes.join(prior.select(col("id").cast("long").as("id"),
              col("label").cast("long").as("pl")), Seq("id"), "left")
            .select(col("id"), coalesce(col("pl"), col("id")).as("label"))
        case None => nodes.withColumn("label", col("id"))
      }
      // watched state carries (label, p1, p2) + exact count tracking —
      // the lpaLoop r17 probe restructure; see the proof there (the
      // voted set shrinks monotonically for arbitrary inputs, so drops
      // are exactly the row-count delta)
      var labels =
        if (watched) base.select(col("id"), col("label"),
          nullL.as("p1"), nullL.as("p2"))
        else base
      var cntPrev = if (watched && iters > 1) labels.count() else 0L
      var cntPrev2 = 0L
      var rounds = 0
      var converged = false
      while (rounds < iters && !converged) {
        val votes = e
          .join(labels.select(col("id").as("dst"), col("label").as("nl")),
            "dst")
          .groupBy(col("src").as("id"), col("nl"))
          .agg(sum(termQuant(col("w"))).as("wv"))
        // watched: state rows ride the same id-keyed exchange as the
        // struct-min (union fusion, guide §2.4) to carry p1/p2; ids
        // with no votes aggregate to a null struct-min and are
        // filtered — the unwatched tier's exact row set
        val next = (if (watched) {
            val voteRows = votes.select(col("id"),
              struct((-col("wv")).as("nw"), col("nl").as("l")).as("p"),
              nullL.as("l1"), nullL.as("l2"))
            val stateRows = labels.select(col("id"),
              lit(null).cast("struct<nw:double,l:bigint>").as("p"),
              col("label").as("l1"), col("p1").as("l2"))
            voteRows.union(stateRows).groupBy("id")
              .agg(min(col("p")).as("p"), max(col("l1")).as("pl1"),
                max(col("l2")).as("pl2"))
              .filter(col("p").isNotNull)
              .select(col("id"), col("p.l").as("label"),
                col("pl1").as("p1"), col("pl2").as("p2"))
          } else votes.groupBy("id")
            .agg(min(struct((-col("wv")).as("nw"), col("nl").as("l"))).as("p"))
            .select(col("id"), col("p.l").as("label")))
          .ckptSer() // eager — see [[pageRank]]
        // probe only decides whether to CONTINUE — skipped on the
        // final round (the family convention); one aggregate scan of
        // the carried columns + dropped-row counting (see lpaLoop)
        if (watched && rounds + 1 < iters) {
          val r = next.agg(
            coalesce(sum(when(col("label") <=> col("p1"), 0L)
              .otherwise(1L)), lit(0L)).as("c1"),
            coalesce(sum(when(col("label") <=> col("p2"), 0L)
              .otherwise(1L)), lit(0L)).as("c2"),
            count(lit(1)).as("n")).head()
          val cnt = r.getLong(2)
          val d1 = r.getLong(0) + (cntPrev - cnt)
          val d2 = if (rounds >= 1) r.getLong(1) + (cntPrev2 - cnt) else -1L
          if (d1 == 0L) converged = true
          else if (d2 == 0L && (iters - (rounds + 1)) % 2 == 0)
            converged = true
          cntPrev2 = cntPrev
          cntPrev = cnt
        }
        labels = next
        rounds += 1
      }
      (labels.select(col("id"), col("label")), rounds)
    } finally { e.unpersist(); () }
  }

  /** Unsupervised community detection by SYNCHRONOUS label propagation
    * (Raghavan et al. 2007) over an undirected (src, dst) edge list:
    * every node starts as its own community, and each round every node
    * simultaneously adopts the most frequent label among its NEIGHBORS
    * (self excluded), ties broken to the SMALLEST label. That tie rule
    * is a total order, so unlike classic LPA's random tie-break and
    * asynchronous sweep — deliberately not ported — the update is a
    * pure function of the graph, exactly replayable by an independent
    * engine (the oracle contract). Fixed `iters` rounds: synchronous
    * LPA can 2-cycle on bipartite-ish structures, so a NAIVE fixpoint
    * watch may never fire; bounded rounds keep the output total
    * ([[labelPropagationWatched]] adds the cycle-aware watch for
    * production runs — this fixed tier stays the oracle).
    *
    * Complements [[Dedup.connectedComponents]] on the same substrate:
    * CC answers "is there ANY path" (one bridge edge merges two
    * clusters — right for dup closure), LPA answers "where does the
    * DENSITY live" (a single bridge between two dense blocks cannot
    * outvote either block's internal majority, so the blocks keep
    * distinct labels — topic/community discovery for corpus curation,
    * e.g. balancing a training mixture by similarity community rather
    * than by source metadata).
    *
    * Scale shape = the [[pageRank]] scaffold: per round, ONE
    * (node, label)-keyed count aggregation (map-side combinable — hub
    * fan-in is exactly what partial aggregation absorbs) plus a
    * per-node struct-min; label state is one row per node, never
    * nodes x labels; localCheckpoint per round truncates lineage.
    * Expects a symmetrized edge list ([[symmetrize]]) so every node
    * appears as src. Returns (id, label), label = a member id of the
    * community. */
  def labelPropagation(edges: DataFrame, iters: Int = 5): DataFrame =
    lpaLoop(edges, iters, watched = false)._1

  /** Convergence-watched LPA — the 100 TB community-detection mode.
    *
    * The fixed-round tier's scaladoc names the reason it does NOT
    * watch: synchronous LPA can 2-cycle (the canonical case is a
    * single undirected edge — the two endpoints swap labels forever),
    * so a naive fixpoint watch may never fire and the loop would run
    * to its cap on exactly the structures that converged-in-spirit
    * first. The watched family's PERIOD-2 CYCLE rule closes that gap:
    * stop on a true fixed point (zero labels changed — every later
    * round reproduces the state), or on an EXACT revisit of the state
    * two rounds back when the remaining budget is even (a 2-cycle
    * revisits itself every 2 rounds, so the returned state is
    * bit-identical to the full fixed-round run). Both rules make
    * early-stopping indistinguishable from running the remaining
    * rounds: watched(maxIters) == labelPropagation(maxIters) at ANY
    * knobs — the oracle contract.
    *
    * Labels are integers, so the probes are exact set+value
    * comparisons (no tol, no quantization): one aggregate job per
    * round over FULL outer joins (a node present on one side only
    * counts as changed, so a node-set drift on a non-symmetrized
    * input can never masquerade as convergence), skipped on the final
    * round like the rest of the family. Returns ((id, label), rounds
    * run).
    *
    * `init` = WARM START (the family's incremental mode, cf.
    * [[pageRankWatched]]/[[kmeansAssignWarm]]): round 0 labels come
    * from a prior (id, label) assignment instead of each-node-its-own-
    * id; nodes new since the prior run enter as their own label,
    * departed ids drop (inner-joined against the current node set). An
    * unchanged graph confirms its prior communities in 1 round; a
    * perturbed one re-converges in rounds tracking the perturbation,
    * not the cold-start mixing. Not cold-equal by construction (a
    * different round-0 state is a different trajectory) — spec-pinned,
    * not oracled, the labelSpreadWatched(init) stance. */
  def labelPropagationWatched(edges: DataFrame,
                              maxIters: Int = 50,
                              init: Option[DataFrame] = None): (DataFrame, Int) =
    lpaLoop(edges, maxIters, watched = true, init)

  private def lpaLoop(edges: DataFrame, iters: Int,
                      watched: Boolean,
                      init: Option[DataFrame] = None): (DataFrame, Int) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("id")).distinct()
      val nullL = lit(null).cast("long")
      val base = init match {
        case Some(prior) =>
          // warm start: prior labels where known, own id for new nodes;
          // departed ids drop via the node-set join
          nodes.join(prior.select(col("id").cast("long").as("id"),
              col("label").cast("long").as("pl")), Seq("id"), "left")
            .select(col("id"), coalesce(col("pl"), col("id")).as("label"))
        case None => nodes.withColumn("label", col("id"))
      }
      // Watched state carries (label, p1, p2) — the previous and
      // two-rounds-back labels ride the checkpoint as columns (r17,
      // the r16 pageRankLoop discipline): the probe becomes ONE
      // aggregate scan of the frame the round just materialized
      // instead of two chained full-outer joins per round. The old
      // probe's "set drift counts as change" semantics survive via
      // exact row-count tracking: the voted set only SHRINKS
      // (votes_r ids = {src with a dst in labels_{r-1}} ⊆ labels_{r-1},
      // by induction from labels_0 = ALL srcs — true for arbitrary
      // directed inputs, warm starts included), so rows absent from a
      // prior state cannot exist, and rows dropped FROM it are exactly
      // the row-count difference, counted below as changed.
      var labels =
        if (watched) base.select(col("id"), col("label"),
          nullL.as("p1"), nullL.as("p2"))
        else base
      // exact prior row counts for the probe (one count job up front
      // replaces two probe joins per round)
      var cntPrev = if (watched && iters > 1) labels.count() else 0L
      var cntPrev2 = 0L
      var rounds = 0
      var converged = false
      while (rounds < iters && !converged) {
        val counts = e
          .join(labels.select(col("id").as("dst"), col("label").as("nl")),
            "dst")
          .groupBy(col("src").as("id"), col("nl"))
          .agg(count(lit(1)).as("c"))
        // (max count, then min label) via one struct-min: -c sorts the
        // count descending, the label ascends on ties — no window, no
        // second shuffle over the counts. On the watched tier the state
        // rows ride the same id-keyed exchange (union fusion, guide
        // §2.4) to carry p1/p2; ids with no votes aggregate to a null
        // struct-min and are filtered — exactly the voted row set the
        // unwatched tier produces.
        val next = (if (watched) {
            val voteRows = counts.select(col("id"),
              struct((-col("c")).as("nc"), col("nl").as("l")).as("p"),
              nullL.as("l1"), nullL.as("l2"))
            val stateRows = labels.select(col("id"),
              lit(null).cast("struct<nc:bigint,l:bigint>").as("p"),
              col("label").as("l1"), col("p1").as("l2"))
            voteRows.union(stateRows).groupBy("id")
              .agg(min(col("p")).as("p"), max(col("l1")).as("pl1"),
                max(col("l2")).as("pl2"))
              .filter(col("p").isNotNull)
              .select(col("id"), col("p.l").as("label"),
                col("pl1").as("p1"), col("pl2").as("p2"))
          } else counts.groupBy("id")
            .agg(min(struct((-col("c")).as("nc"), col("nl").as("l"))).as("p"))
            .select(col("id"), col("p.l").as("label")))
          .ckptSer() // eager — see [[pageRank]]
        // the probe only decides whether to CONTINUE — skip its job on
        // the final round (the family convention)
        if (watched && rounds + 1 < iters) {
          // one aggregate scan: changed labels vs the carried p1/p2,
          // plus the exact row count; dropped rows (set shrink) are
          // cntPrev − cnt, each counting as changed like the old
          // full-outer did
          val r = next.agg(
            coalesce(sum(when(col("label") <=> col("p1"), 0L)
              .otherwise(1L)), lit(0L)).as("c1"),
            coalesce(sum(when(col("label") <=> col("p2"), 0L)
              .otherwise(1L)), lit(0L)).as("c2"),
            count(lit(1)).as("n")).head()
          val cnt = r.getLong(2)
          val d1 = r.getLong(0) + (cntPrev - cnt)
          val d2 = if (rounds >= 1) r.getLong(1) + (cntPrev2 - cnt) else -1L
          if (d1 == 0L) converged = true
          else if (d2 == 0L && (iters - (rounds + 1)) % 2 == 0)
            converged = true
          cntPrev2 = cntPrev
          cntPrev = cnt
        }
        labels = next
        rounds += 1
      }
      (labels.select(col("id"), col("label")), rounds)
    } finally { e.unpersist(); () }
  }

  /** Degree-capped triangle counting — the arbitrary-edge-list tier.
    *
    * Exact [[triangleCounts]] generates C(d, 2) wedges at a center of
    * forward-degree d: one crawl-scale hub (degree 10^5 -> ~10^10
    * wedges) stalls the wedge stage, which is why the kNN-graph
    * composition (degree k-bounded by construction) is the exact
    * tier's contract. This variant caps wedge GENERATION at
    * `maxDegree` sampled forward-neighbors per center and corrects
    * with the standard unbiased estimator: a triangle whose smallest
    * vertex a has forward-degree fd survives sampling with probability
    * C(s, 2)/C(fd, 2) (both of its other corners must be in a's
    * s-neighbor sample), so each FOUND triangle is credited to its
    * three corners with weight w = C(fd, 2)/C(s, 2). Unbiased:
    * E[estimate] = exact count, per corner. Sampling is deterministic
    * (xxhash64-ranked neighbors), so results are reproducible;
    * closing-edge checks run against the FULL edge set — only wedge
    * generation is sampled.
    *
    * Error bound (per center a, t_a = true smallest-vertex triangles
    * at a): the estimate is w times a sum of t_a Bernoulli(1/w)
    * indicators, so under independence Var = t_a * (w - 1) and the
    * relative standard error of a's contribution is sqrt((w - 1)/t_a);
    * the indicators share sampled neighbors, which can inflate that
    * modestly but leaves the scaling — dense neighborhoods (large t_a), which
    * are what triangle analysis is FOR, concentrate fastest; sparse
    * hubs are noisy in relative terms but tiny in absolute ones.
    * Centers at or under the cap have s = fd, w = 1: EXACT, zero
    * variance — the estimator only engages above the cap.
    *
    * Cost: the rank window is one shuffle with O(d) rows per center
    * (linear in the hub degree, vs the exact tier's quadratic wedges);
    * sampled wedge generation is bounded by C(maxDegree, 2) per
    * center. Output matches [[triangleCounts]] but `triangles` is
    * DOUBLE (a weighted estimate; integer-valued when every center is
    * under the cap). */
  def triangleCountsCapped(edges: DataFrame, maxDegree: Int): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2, got $maxDegree")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = e.groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("degree"))
      val fwd = e.filter(col("src") < col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // deterministic per-center neighbor ranking; dst tie-break makes
        // the order total even under (vanishingly unlikely) hash ties
        val ranked = fwd.withColumn("rk", row_number().over(
          Window.partitionBy("src")
            .orderBy(xxhash64(col("src"), col("dst")), col("dst"))))
        val sampled = ranked.filter(col("rk") <= maxDegree)
          .select("src", "dst")
        // per-center correction weight w = C(fd,2)/C(s,2); s = min(fd, cap)
        val weights = fwd.groupBy("src").agg(count(lit(1)).as("fd"))
          .select(col("src").as("a"),
            when(col("fd") <= maxDegree, lit(1.0)).otherwise(
              (col("fd") * (col("fd") - 1)).cast("double") /
                (lit(maxDegree) * lit(maxDegree - 1))).as("w"))
        val wedges = sampled.select(col("src").as("a"), col("dst").as("b"))
          .join(sampled.select(col("src").as("a"), col("dst").as("c")), "a")
          .filter(col("b") < col("c"))
        // closing edges checked against the FULL forward set
        val tris = wedges.join(
            fwd.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
          .join(weights, "a")
        val perCorner = tris.select(col("a").as("id"), col("w"))
          .union(tris.select(col("b").as("id"), col("w")))
          .union(tris.select(col("c").as("id"), col("w")))
          .groupBy("id").agg(sum(col("w")).as("triangles"))
        deg.join(perCorner, Seq("id"), "left")
          .select(col("id"), col("degree"),
            coalesce(col("triangles"), lit(0.0)).as("triangles"),
            when(col("degree") < 2, lit(0.0)).otherwise(
              round(lit(2.0) * coalesce(col("triangles"), lit(0.0)) /
                (col("degree") * (col("degree") - 1)), 6)).as("clustering"))
      } finally { fwd.unpersist(); () }
    } finally { e.unpersist(); () }
  }

  /** Personalized PageRank: the random walk teleports back to a SEED
    * set instead of everywhere, so rank mass concentrates in the
    * seeds' graph neighborhood — the standard retrieval-expansion
    * primitive (start from the hits a query retrieved, walk the
    * similarity graph, surface related documents the retriever
    * missed). Returns sparse (id, rank) over nodes the walk reached.
    *
    * Update: r'(v) = quant(damping * sum_{u->v} r(u)/outdeg(u)
    * + (1 - damping) * [v in seeds]/|S|) — the seed term re-injected
    * every round via a full-outer join (the [[labelSpread]] pattern),
    * per-round binary-grid requantization, cached edge+degree, eager
    * per-round checkpoints. Dangling nodes are rejected up front: in
    * proper PPR their mass returns to the seeds, a variant nothing
    * here needs — a symmetrized similarity graph has none, and
    * silently leaking mass instead would skew every rank. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           damping: Double = 0.85, iters: Int = 5,
                           quantBits: Int = 30): DataFrame =
    pprLoop(edges, seeds, damping, iters, watchTol = None, quantBits)._1

  /** Convergence-watched personalized PageRank (the [[pageRankWatched]]
    * stance, over PPR's SPARSE rank state): iterate until the
    * full-outer L1 delta falls to `tol` or `maxIters`; tol = 0 runs to
    * the exact grid fixed point, with the same parity-preserving
    * period-2 cycle stop, so the watched result is always identical to
    * the fixed-`maxIters` run. Returns (ranks, roundsRun).
    *
    * `init` (incremental mode — completes the watched family's
    * daily-increment coverage; reference analog: the incremental
    * `update` CLI, `/root/reference/src/cli/update.rs:58-242`): seed
    * from a prior sparse (id, rank) table instead of the 1/|S| seed
    * mass, with [[pageRankWatched]]'s renormalized-seed discipline
    * adapted to sparse state — prior rows are restricted to the
    * CURRENT node set (a departed node's row would re-inject mass no
    * edge can drain) and the kept mass renormalizes to total 1 (the
    * same O(1) driver scalar; refuses an all-zero/disjoint seed
    * loudly). NEW seeds need no explicit row: the per-round full-outer
    * seed-term join injects their teleport mass from round one, so a
    * changed seed set self-corrects — old-seed mass decays
    * geometrically, new-seed mass builds — in the rounds the CHANGE
    * needs, not the cold-start count. Warm starts follow a different
    * trajectory, so they exist only on this watched tier; the
    * fixed-round oracle tier always starts cold. */
  def personalizedPageRankWatched(edges: DataFrame, seeds: DataFrame,
                                  damping: Double = 0.85,
                                  maxIters: Int = 50, tol: Double = 0.0,
                                  quantBits: Int = 30,
                                  init: Option[DataFrame] = None): (DataFrame, Int) =
    pprLoop(edges, seeds, damping, maxIters, watchTol = Some(tol),
      quantBits, init)

  private def pprLoop(edges: DataFrame, seeds: DataFrame,
                      damping: Double, iters: Int,
                      watchTol: Option[Double],
                      quantBits: Int,
                      init: Option[DataFrame] = None): (DataFrame, Int) = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sd = seeds.select(col("id").cast("long").as("id")).distinct()
      .where(col("id").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    // NOT pre-partitioned by src (r16 tested-and-reverted): hash-
    // clustering the cache by the per-round join key removes the
    // per-round edge exchange from the STATIC plan, but it also removes
    // the query-stage boundary AQE needs to convert each round's join
    // into a broadcast hash join of the (much smaller) rank side —
    // measured +30-45% per watched row at sf0.1 (SMJ sort+merge every
    // round instead of a broadcast probe of the in-place cache). With
    // the plain cache AQE picks per round from runtime sizes: broadcast
    // while ranks fit, sort-merge with the edge exchange when they
    // don't — the right call at every scale without a hand-rolled
    // threshold.
    val eout = e.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      require(nodes.join(deg.withColumnRenamed("src", "id"), Seq("id"),
          "left_anti").limit(1).count() == 0,
        "personalizedPageRank requires a graph with no dangling nodes " +
          "(symmetrize the edge list)")
      val nSeeds = sd.count().toDouble // documented O(1) driver scalar
      require(nSeeds > 0, "personalizedPageRank needs at least one seed")
      val seedTerm = sd.select(col("id"),
        lit((1.0 - damping) / nSeeds).as("seed"))
      // Watch columns ride inside the sparse state (r16, the
      // pageRankLoop restructure): (id, rank, p1, p2) with p1/p2
      // attached by a LEFT join of the previous state onto the new
      // row set. Sound because the reached set GROWS MONOTONICALLY on
      // the (required) symmetrized dangling-free graph: state_t =
      // N(state_{t-1}) ∪ seeds ⊇ state_{t-1} by induction, so no row
      // ever drops and the left join loses no delta mass — newly
      // reached rows enter with p1/p2 null, which the probe reads as
      // prior rank 0 (exactly the old full-outer's semantics).
      // tol = 0 additionally fuses both L1 sums into the checkpoint
      // job as accumulator bumps (re-execution-safe for ==0, see
      // pageRankLoop); tol > 0 keeps a no-join aggregate scan.
      val accTol0 = watchTol.contains(0.0)
      val acc1 = edges.sparkSession.sparkContext.doubleAccumulator("ppr_d1")
      val acc2 = edges.sparkSession.sparkContext.doubleAccumulator("ppr_d2")
      val markDelta = udf { (r: Double, p1: java.lang.Double, p2: java.lang.Double) =>
        acc1.add(math.abs(r - (if (p1 == null) 0.0 else p1.doubleValue)))
        acc2.add(math.abs(r - (if (p2 == null) 0.0 else p2.doubleValue)))
        true
      }.asNondeterministic()
      var rank = init match {
        case Some(r0) =>
          // sparse warm start (scaladoc above): keep only prior rows
          // whose node still exists, renormalize the kept mass to 1.
          // New seeds carry no row — the full-outer seed term below
          // injects their teleport mass every round regardless.
          val kept = r0.select(col("id").cast("long").as("id"),
              col("rank").cast("double").as("r0"))
            .where(col("id").isNotNull && col("r0").isNotNull &&
              col("r0") >= 0)
            .join(nodes, Seq("id"), "left_semi")
          val t = kept.agg(coalesce(sum(col("r0")), lit(0.0)))
            .head().getDouble(0)
          require(t > 0,
            "personalizedPageRank warm start needs positive total mass " +
              "on the current node set")
          kept.select(col("id"),
              quant(col("r0") / lit(t), quantBits).as("rank"),
              lit(null).cast("double").as("p1"),
              lit(null).cast("double").as("p2"))
            .ckptSer()
        case None => sd.select(col("id"),
          quant(lit(1.0 / nSeeds), quantBits).as("rank"),
          lit(null).cast("double").as("p1"),
          lit(null).cast("double").as("p2"))
      }
      var rounds = 0
      var converged = false
      while (rounds < iters && !converged) {
        // Union-fused update (r17, see pageRankLoop): the contribution
        // aggregate, the seed-term re-injection (formerly a full-outer
        // join) and — on the watched tier — the watch-column carry
        // (formerly a left join) are ALL id-keyed, so seed and state
        // rows ride the contribution groupBy's exchange. Row set is
        // unchanged: grouped ids = contrib ∪ seed ∪ (watched) state
        // ids, and the filter below drops state-only ids — which the
        // monotone-frontier argument (scaladoc above) proves cannot
        // exist on the required dangling-free graph, so the filter is
        // an unconditional row-set-equality guarantee, not a behavior
        // change. Newly reached rows enter with null p1/p2 exactly as
        // the left-join carry produced.
        val nullD = lit(null).cast("double")
        val terms = eout
          .join(rank.select(col("id").as("src"), col("rank")), "src")
          .select(col("dst").as("id"),
            termQuant(col("rank") / col("outdeg")).as("c"),
            nullD.as("sd0"), nullD.as("r0"), nullD.as("q1"))
        val seedRows = seedTerm.select(col("id"), nullD.as("c"),
          col("seed").as("sd0"), nullD.as("r0"), nullD.as("q1"))
        val newRank = quant(lit(damping) * coalesce(col("contrib"), lit(0.0))
          + coalesce(col("seed"), lit(0.0)), quantBits)
        val updated =
          if (watchTol.isDefined) {
            val stateRows = rank.select(col("id"), nullD.as("c"),
              nullD.as("sd0"), col("rank").as("r0"), col("p1").as("q1"))
            terms.union(seedRows).union(stateRows).groupBy("id")
              .agg(sum(col("c")).as("contrib"), max(col("sd0")).as("seed"),
                max(col("r0")).as("pc1"), max(col("q1")).as("pc2"))
              .filter(col("contrib").isNotNull || col("seed").isNotNull)
              .select(col("id"), newRank.as("rank"),
                col("pc1").as("p1"), col("pc2").as("p2"))
          } else terms.union(seedRows).groupBy("id")
            .agg(sum(col("c")).as("contrib"), max(col("sd0")).as("seed"))
            .select(col("id"), newRank.as("rank"))
        acc1.reset(); acc2.reset()
        val next = (if (accTol0)
            updated.withColumn("_chg",
              markDelta(col("rank"), col("p1"), col("p2")))
          else updated)
          .ckptSer() // eager — see [[pageRank]]
        if (rounds + 1 < iters) watchTol.foreach { t =>
          // sparse-state deltas: absent-prior rows read as 0 (null
          // p1/p2 -> 0, the old full-outer's semantics); d2 carries
          // signal only once a two-rounds-back state exists
          val (delta, delta2) =
            if (accTol0)
              (acc1.value.doubleValue,
                if (rounds >= 1) acc2.value.doubleValue else -1.0)
            else {
              val r = next
                .agg(coalesce(sum(abs(col("rank")
                  - coalesce(col("p1"), lit(0.0)))), lit(0.0)).as("d1"),
                  coalesce(sum(abs(col("rank")
                    - coalesce(col("p2"), lit(0.0)))), lit(0.0)).as("d2"))
                .head()
              (r.getDouble(0), if (rounds >= 1) r.getDouble(1) else -1.0)
            }
          if (delta <= t) converged = true
          else if (delta2 == 0.0 && (iters - (rounds + 1)) % 2 == 0)
            converged = true // period-2 cycle, even remainder
        }
        rank = next
        rounds += 1
      }
      (rank.select(col("id"), col("rank")), rounds)
    } finally { eout.unpersist(); sd.unpersist(); e.unpersist(); () }
  }

  /** Label spreading over a directed edge list (Zhou et al. 2004,
    * "Learning with Local and Global Consistency", random-walk
    * normalized): a small SEED set of labeled nodes propagates labels
    * across the similarity graph — the classifier-bootstrapping step a
    * curation pipeline uses to expand a few thousand human quality
    * labels to a whole corpus before training a cheap model on the
    * result.
    *
    * State is the SPARSE (id, label, score) table — only labels that
    * have reached a node carry rows, so state is O(reached nodes x
    * nearby labels), never nodes x labels. Each round:
    *
    *   score'(v, l) = quant(alpha * sum_{u->v} score(u, l)/outdeg(u)
    *                        + (1 - alpha) * seed(v, l), quantBits)
    *
    * with seed(v, l) = 1 for v's seed label — seeds keep injecting
    * their identity (the clamping that distinguishes spreading from
    * plain diffusion). Same execution scaffold as [[pageRank]]: the
    * edge+degree join hoisted and cached, one dst-keyed shuffle per
    * round, per-round binary-grid requantization ([[quant]]) for
    * engine portability,
    * localCheckpoint lineage truncation.
    *
    * Returns (id, label, score) for every (node, label) the diffusion
    * reached; argmax with a smaller-label tie-break gives the
    * prediction (left to the caller/query so the full distribution
    * stays available for confidence thresholds). */
  def labelSpread(edges: DataFrame, seeds: DataFrame,
                  alpha: Double = 0.85, iters: Int = 4,
                  quantBits: Int = 30): DataFrame =
    labelSpreadLoop(edges, seeds, alpha, iters, watchTol = None,
      quantBits)._1

  /** Convergence-watched label spreading (the [[pageRankWatched]]
    * stance): iterate until the L1 delta over the sparse (id, label)
    * state falls to `tol` or `maxIters`. The delta join is FULL OUTER
    * with missing scores read as 0 — the state grows as the diffusion
    * reaches new (node, label) cells, and a newly-reached cell IS delta
    * mass. `tol = 0.0` runs to the exact grid fixed point, making the
    * watched result identical to a fixed-`maxIters` run whether or not
    * it converges early. Returns (state, roundsRun).
    *
    * `init` (incremental mode, the [[pageRankWatched]] stance): seed
    * the diffusion state from a prior run's (id, label, score) output
    * instead of the bare seed table — the re-spread path after a graph
    * or seed edit. Scores are NOT a distribution, so no
    * renormalization applies; the clamped seed term re-injects
    * unconditionally either way, which is what pulls a stale state
    * toward the new answer. */
  def labelSpreadWatched(edges: DataFrame, seeds: DataFrame,
                         alpha: Double = 0.85, maxIters: Int = 50,
                         tol: Double = 0.0,
                         quantBits: Int = 30,
                         init: Option[DataFrame] = None): (DataFrame, Int) =
    labelSpreadLoop(edges, seeds, alpha, maxIters, watchTol = Some(tol),
      quantBits, init)

  private def labelSpreadLoop(edges: DataFrame, seeds: DataFrame,
                              alpha: Double, iters: Int,
                              watchTol: Option[Double],
                              quantBits: Int,
                              init: Option[DataFrame] = None): (DataFrame, Int) = {
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sd = seeds.select(col("id").cast("long").as("id"),
        col("label").cast("int").as("label"))
      .where(col("id").isNotNull && col("label").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
    // NOT pre-partitioned by src (r16 tested-and-reverted): hash-
    // clustering the cache by the per-round join key removes the
    // per-round edge exchange from the STATIC plan, but it also removes
    // the query-stage boundary AQE needs to convert each round's join
    // into a broadcast hash join of the (much smaller) rank side —
    // measured +30-45% per watched row at sf0.1 (SMJ sort+merge every
    // round instead of a broadcast probe of the in-place cache). With
    // the plain cache AQE picks per round from runtime sizes: broadcast
    // while ranks fit, sort-merge with the edge exchange when they
    // don't — the right call at every scale without a hand-rolled
    // threshold.
    val eout = e.join(deg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nullD = lit(null).cast("double")
      val seedTerm = sd.select(col("id"), col("label"),
        lit(1.0 - alpha).as("seed"))
      var state = init match {
        case Some(s0) => s0.select(col("id").cast("long").as("id"),
            col("label").cast("int").as("label"),
            col("score").cast("double").as("score"))
          .where(col("id").isNotNull && col("label").isNotNull &&
            col("score").isNotNull && col("score") >= 0)
          .ckptSer()
        case None =>
          sd.select(col("id"), col("label"), lit(1.0).as("score"))
      }
      var prev: DataFrame = null // two-rounds-back state (cycle watch)
      var rounds = 0
      var converged = false
      while (rounds < iters && !converged) {
        // Union-fused update (r17, see pageRankLoop): the contribution
        // aggregate and the clamped seed re-injection (formerly a
        // full-outer join) both key on (id, label), so seed rows ride
        // the contribution groupBy's exchange instead of a separate
        // join per round. Terms stay on the 2^-48 grid — the shared
        // sum is exact and order-independent — and the grouped cell
        // set is contrib ∪ seed, exactly the old full-outer's. The
        // watch probe keeps its full-outer shape: with a warm `init`
        // the reached set is NOT monotone (stale cells can shed for
        // several rounds), and the probe must count each dying cell's
        // mass — the carry-column shortcut the PageRank loops use
        // would miss it (their node sets are round-invariant; this
        // sparse tier's is not under init).
        val terms = eout
          .join(state.select(col("id").as("src"), col("label"),
            col("score")), "src")
          .select(col("dst").as("id"), col("label"),
            termQuant(col("score") / col("outdeg")).as("c"),
            nullD.as("sd0"))
        val seedRows = seedTerm.select(col("id"), col("label"),
          nullD.as("c"), col("seed").as("sd0"))
        val next = terms.union(seedRows)
          .groupBy("id", "label")
          .agg(sum(col("c")).as("contrib"), max(col("sd0")).as("seed"))
          .select(col("id"), col("label"),
            quant(lit(alpha) * coalesce(col("contrib"), lit(0.0))
              + coalesce(col("seed"), lit(0.0)), quantBits).as("score"))
          .ckptSer() // eager — see [[pageRank]]
        if (rounds + 1 < iters) watchTol.foreach { t =>
          // sparse state: full-outer deltas, absent cells read as 0 —
          // both watch probes (vs last round, vs two back) in one
          // chained-full-outer aggregate job per round
          val (delta, delta2) =
            if (prev != null) {
              val r = next.select(col("id"), col("label"), col("score"))
                .join(state.select(col("id"), col("label"),
                  col("score").as("p1")), Seq("id", "label"), "full_outer")
                .join(prev.select(col("id"), col("label"),
                  col("score").as("p2")), Seq("id", "label"), "full_outer")
                .agg(coalesce(sum(abs(coalesce(col("score"), lit(0.0))
                  - coalesce(col("p1"), lit(0.0)))), lit(0.0)).as("d1"),
                  coalesce(sum(abs(coalesce(col("score"), lit(0.0))
                    - coalesce(col("p2"), lit(0.0)))), lit(0.0)).as("d2"))
                .head()
              (r.getDouble(0), r.getDouble(1))
            } else {
              val r = next.select(col("id"), col("label"), col("score"))
                .join(state.select(col("id"), col("label"),
                  col("score").as("p1")), Seq("id", "label"), "full_outer")
                .agg(coalesce(sum(abs(coalesce(col("score"), lit(0.0))
                  - coalesce(col("p1"), lit(0.0)))), lit(0.0)).as("d1"))
                .head()
              (r.getDouble(0), -1.0)
            }
          if (delta <= t) converged = true
          else if (delta2 == 0.0 && (iters - (rounds + 1)) % 2 == 0)
            converged = true // period-2 cycle, even remainder — see pageRankWatched
        }
        prev = state
        state = next
        rounds += 1
      }
      (state, rounds)
    } finally { eout.unpersist(); sd.unpersist(); e.unpersist(); () }
  }
}
