package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.MetadataFilterDsl
import graft.operators.{BM25, Dedup, Expansion, Graph, Knn}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with equivalent DuckDB SQL in `oracleSql` (the
  * correctness gate hash-compares the two result sets).
  *
  * Determinism rules shared by every query/oracle pair:
  *   - money aggregates go through exact DECIMAL(18,2) sums, cast to
  *     DOUBLE only at the end (bit-identical across engines);
  *   - vector/BM25 scores are computed in Double and rounded to 6
  *     decimals *before* ranking, with id tie-breaks, so top-k sets match;
  *   - rows are explicitly ordered where a LIMIT exists.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Hybrid
    * vector+BM25 search — the reference's headline capability. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("hybrid_search")(spark, dir)
  }

  /** Build-once cache of the label-assigned IVF layout (partitioned
    * embeddings + centroids table) shared by knn_ivf / knn_ivf_plan.
    * Keyed by (path, source mtime): regenerated testdata at the same
    * path must not reuse a stale layout. */
  private def ivfLayoutDir(s: SparkSession, dir: String): String = {
    val mtime = new java.io.File(s"$dir/embeddings.parquet").lastModified()
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ivfplan_${math.abs(dir.hashCode)}_$mtime"
    if (!new java.io.File(s"$out/centroids/_SUCCESS").exists()) {
      val assigned = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"), col("label").as("centroid_id"))
      graft.pipeline.Index.writeIvfLayout(s, assigned, out)
    }
    out
  }

  /** The IVF layout extended with the persisted PQ tier (codes
    * partitioned by centroid_id + codebooks table), using the
    * deterministic SEED codebooks so the stored-path query stays
    * DuckDB-oracle-checkable. Shares [[ivfLayoutDir]]'s cache key. */
  private def pqLayoutDir(s: SparkSession, dir: String): String = {
    val out = ivfLayoutDir(s, dir)
    // Gate on the COMMIT marker (pq_codebooks is written last by
    // writePqLayout): gating on pq_codes alone would treat a build that
    // crashed between the two writes as complete, and every later run
    // would then fail on the missing codebooks table.
    if (!new java.io.File(s"$out/pq_codebooks/_SUCCESS").exists()) {
      val cb = graft.operators.Pq.seedCodebooks(
        Tables.embeddings(s, dir), "vec_id", "embedding", m = 8, k = 16)
      graft.pipeline.Index.writePqLayout(s, out, cb, idCol = "vec_id")
    }
    out
  }

  /** The IVF layout extended with the persisted 1-bit sketch tier. */
  private def binaryLayoutDir(s: SparkSession, dir: String): String = {
    val out = ivfLayoutDir(s, dir)
    if (!new java.io.File(s"$out/binary_sigs/_SUCCESS").exists())
      graft.pipeline.Index.writeBinaryLayout(s, out, dims = 64, idCol = "vec_id")
    out
  }

  /** Deterministic multi-line restructuring of the single-line
    * synthetic documents: lines of 10 whitespace words, with a
    * terminal '.' appended iff the line's first word sorts before "n"
    * (≈ half the lines). The line-granular queries (quality_c4,
    * dedup_lines) run on this so the C4 rules have real line structure
    * to act on; the oracle rebuilds byte-identical text in SQL
    * (OracleSql.linifiedCtes). */
  private def linified(text: Column): Column = {
    val ws = filter(split(text, "\\s+"), w => length(w) > 0)
    val nLines = ceil(size(ws) / lit(10.0)).cast("int")
    val lines = when(size(ws) > 0,
      transform(sequence(lit(0), greatest(nLines - 1, lit(0))),
        i => concat(
          array_join(slice(ws, i * 10 + 1, lit(10)), " "),
          when(element_at(ws, i * 10 + 1) < "n", lit(".")).otherwise(lit("")))))
      .otherwise(array().cast("array<string>"))
    array_join(lines, "\n")
  }

  /** The symmetrized exact-kNN edge fixture the graph_* operator rows
    * consume: built once per (session, dir) as an EAGER localCheckpoint
    * (the graph_build row rebuilds and re-registers it; any other
    * access order builds lazily). Splitting fixture from operator keeps
    * each bench row measuring its own iteration cost — production
    * consumes persisted `--edges` (the CLI contract), so a row that
    * re-pays the O(n^2) oracle-tier build per query measures the
    * fixture, not the operator. localCheckpoint rather than the DfCache
    * persist registry because the bench clears the SQL cache between
    * queries (intra-query persist hygiene) and a merely-cached fixture
    * would silently recompute inside every operator row; checkpointed
    * RDD blocks survive `catalog.clearCache()`. Oracle outputs are
    * unchanged: same edges, same content, only persistence moved. */
  private val graphEdgesCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  private[graft] def buildGraphEdges(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val df = Graph.symmetrize(Graph.knnGraph(
      Tables.embeddings(s, dir), "vec_id", "embedding", k = 3))
      .localCheckpoint()
    graphEdgesCache.put(dir, df)
    df
  }

  private def graphEdges(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    graphEdgesCache.computeIfAbsent(dir, d => buildGraphEdges(s, d))

  /** The symmetrized supplier<->customer RELATIONAL graph (distinct
    * lineitem x orders pairs, custkey offset by 1e6 to disjoint the
    * key spaces) that the watched relational rows consume — the same
    * fixture-vs-operator split [[graphEdgesCache]] got in r13: before
    * r15, graph_pagerank_watched and graph_ppr_watched each inlined
    * this build per bench run (together 16% of suite wall). The
    * graph_build_rel row rebuilds and re-registers it — NAMED to sort
    * before its consumers, because Bench runs queries in name order —
    * so the watched rows measure iteration cost only. Production
    * consumes persisted `--edges` (the CLI contract); oracle outputs
    * are unchanged (same edges, only persistence moved). */
  private val relEdgesCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()

  private[graft] def buildRelEdges(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").cast("long").as("src"),
        (col("o_custkey").cast("long") + 1000000L).as("dst"))
      .distinct()
    val df = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    relEdgesCache.put(dir, df)
    df
  }

  private def relEdges(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    relEdgesCache.computeIfAbsent(dir, d => buildRelEdges(s, d))

  /** Committed code fixtures for the chunk_ast oracle row (see the
    * query's comment): python exercises indent-block extraction, the
    * over-size `transform` function part-splits at chunkSize=160, the
    * class/methods overlap-dedupe, and module-level lines gap-fill;
    * rust exercises brace-block extraction; the txt file exercises the
    * extension dispatch to the simple chunker. */
  private[graft] val astFixturePy: String =
    """import os
      |
      |def load(path):
      |    with open(path) as f:
      |        return f.read()
      |
      |def transform(rows, keep_empty, marker):
      |    out = []
      |    for row in rows:
      |        cleaned = row.strip().lower().replace(marker, "")
      |        if cleaned or keep_empty:
      |            out.append(cleaned + marker + str(len(cleaned)))
      |    counts = {value: len(value) for value in out if value}
      |    return sorted(set(out)), counts
      |
      |class Store:
      |    def __init__(self, root):
      |        self.root = root
      |
      |    def get(self, key):
      |        return load(os.path.join(self.root, key))
      |
      |print("module ready")""".stripMargin

  private[graft] val astFixtureRs: String =
    """use std::fs;
      |
      |pub fn read_all(path: &str) -> String {
      |    fs::read_to_string(path).unwrap()
      |}
      |
      |pub struct Store {
      |    root: String,
      |}
      |
      |impl Store {
      |    pub fn new(root: String) -> Self {
      |        Store { root }
      |    }
      |}
      |
      |const VERSION: i32 = 1;""".stripMargin

  private[graft] val astFixtureTxt: String =
    "plain prose that the strategy dispatcher must route to the simple " +
      "chunker because txt is not a code extension."

  /** The shared image fixture for the dedup_phash / dedup_phash_clusters
    * queries: 200 grayscale 9x8 PNGs generated IN the plan from md5
    * pixel arithmetic — 25 groups x 8 one-pixel variants, so near-dup
    * structure is deterministic and SF-independent, and the DuckDB
    * oracle can replay the exact pixel values in SQL. Also consumed by
    * MultimodalSpec's fixture-diameter guard: the clusters oracle runs
    * exactly 8 rounds of min-label propagation, which is only exact
    * while every cluster's diameter stays < 8 — the spec pins that
    * invariant to this generator. */
  private[graft] def phashFixtureMedia(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val pngUdf = udf((px: Seq[Int]) => Multimodal.grayPng(px.toArray, 9, 8))
    val docs = Tables.documents(s, dir).select(col("doc_id"))
      .orderBy("doc_id").limit(200)
    val g = (col("doc_id") % 25).cast("string")
    val variant = floor(col("doc_id") / 25).cast("long")
    val ppos = conv(substring(md5(concat(lit("pxpos:"), g)), 1, 4), 16, 10)
      .cast("long") % 72
    val pixels = transform(sequence(lit(0L), lit(71L)), i => {
      val base = conv(substring(md5(concat(lit("px:"), g, lit(":"),
        i.cast("string"))), 1, 4), 16, 10).cast("long") % 256
      when(i === ppos, (base + variant * 37) % 256).otherwise(base).cast("int")
    })
    docs.select(col("doc_id").as("id"), pngUdf(pixels).as("content"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- relational core over the TPC-H-ish tables -----
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q3_join" -> ((s, dir) => {
      // Selective dimension side broadcast; fact table never shuffled
      // until the final (tiny) aggregation.
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    "q_semi_anti" -> ((s, dir) => {
      // EXISTS/NOT EXISTS as semi/anti joins: customers with vs without
      // open orders. Anti/semi never materialize the probe side's
      // payload — at scale this is the shape for "seen before" checks.
      val cust = Tables.customer(s, dir)
      val open = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        .select("o_custkey")
      val withOpen = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
        .select(col("c_mktsegment"), lit("with_open").as("kind"))
      val without = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_anti")
        .select(col("c_mktsegment"), lit("without_open").as("kind"))
      withOpen.union(without)
        .groupBy("c_mktsegment", "kind")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment", "kind")
    }),

    "q_distinct_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q_rollup" -> ((s, dir) => {
      // Hierarchical totals: (flag, status), (flag), (grand). At scale
      // this is one pass with partial aggregation per grouping set.
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q_cube" -> ((s, dir) => {
      // All four grouping sets in one pass (partial agg per set, same
      // one-shuffle shape as rollup); grouping_id() disambiguates the
      // NULL grouping markers from genuine NULL data values.
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q_pivot" -> ((s, dir) => {
      // Wide-format rollup: status columns pivoted out of rows. Values
      // are given explicitly, so the plan is ONE aggregate pass (no
      // extra distinct-values job + no collect) — the pivot becomes
      // conditional aggregation, same shuffle shape as q1_agg.
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .select(col("o_orderpriority"), col("F").as("total_f"),
          col("O").as("total_o"), col("P").as("total_p"))
        .orderBy("o_orderpriority")
    }),

    "q_window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // 30-day trailing spend per customer: a RANGE frame over event
      // time (epoch seconds), i.e. the moving aggregate every activity
      // dashboard needs. One shuffle on the partition key; decimal
      // accumulation keeps the running sums engine-exact. Peers (equal
      // timestamps) are all in-frame, so ties can't reorder results.
      // NTZ has no direct long cast; via TIMESTAMP under the session's
      // UTC zone = wall-clock epoch seconds, which is DuckDB's epoch().
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("spend_30d"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    "q_topn_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("o_custkey") < 100)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // ----- similarity search (SURVEY §2.4, J1-J3) -----
    "knn_exact" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.exactTopK(emb, Knn.queryVector(emb, 0L), 10)
    }),

    "knn_cosine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.cosineTopK(emb, Knn.queryVector(emb, 0L), 10)
    }),

    "knn_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pred = MetadataFilterDsl
        .toColumn("label not_in [3,4], vec_id>=10", emb).get
      Knn.filteredTopK(emb, Knn.queryVector(emb, 0L), pred, 10)
    }),

    "knn_ivf" -> ((s, dir) => {
      // The persisted-centroid production path: rank the STORED
      // centroids table (nprobe driver-side ints), then scan only the
      // probed partitions of the centroid-partitioned layout —
      // sub-linear in the corpus. (Knn.ivfTopK, which re-derives
      // centroids from the full table, remains the oracle-reproducible
      // formulation only — see its scaladoc.)
      val out = ivfLayoutDir(s, dir)
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      graft.pipeline.Index.searchIvf(s, out, qv, nprobe = 4, k = 10, idCol = "vec_id")
    }),

    "knn_ivf_plan" -> ((s, dir) => {
      // The Catalyst-extension ANN path: the query is the NAIVE exact
      // plan (scan, dot_product vs a literal query vector, ORDER BY
      // DESC LIMIT k) over the IVF layout; graft.plans.IvfTopKRewrite
      // injects the centroid pruning during optimization. Clusters are
      // label-assigned (not KMeans) so the SQL oracle can reproduce the
      // probe set — semantics identical to knn_ivf.
      GraftExtensions.install(s)
      val out = ivfLayoutDir(s, dir)
      s.conf.set("spark.graft.ivf.nprobe", "4")
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      graft.pipeline.Index.searchIvfDeclarative(s, out, qv, k = 10, idCol = "vec_id")
    }),

    "knn_batch" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("qv"))
      Knn.batchTopK(emb, queries, k = 5)
        .orderBy("qid", "rank")
    }),

    "knn_batch_agg" -> ((s, dir) => {
      // Same semantics as knn_batch via the bounded top-k Aggregator
      // (map-side partial aggregation) — both share one oracle.
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("qv"))
      Knn.batchTopKAgg(emb, queries, k = 5)
        .orderBy("qid", "rank")
    }),

    // Retrieval-quality evaluation (the TREC metrics harness over the
    // retrieval operators' own output): every 20th vector queries the
    // corpus, same-label others are the relevant set, and
    // Eval.retrievalMetrics reads recall/precision/MRR/nDCG@10 per
    // query. Eval-side joins/aggs are all qid-keyed and Q×k-sized.
    "eval_retrieval" -> ((s, dir) => {
      import graft.functions.VectorFunctions
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"),
          VectorFunctions.asDouble(col("embedding")).as("qv"))
      val results = Knn.batchTopKAgg(emb, queries, k = 10)
      val qrels = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("label").as("ql"))
        .join(emb.select(col("vec_id").as("rel_id"), col("label")),
          col("ql") === col("label"))
        .filter(col("qid") =!= col("rel_id"))
        .select(col("qid"), col("rel_id").as("vec_id"))
      graft.operators.Eval.retrievalMetrics(results, qrels, k = 10,
          docCol = "vec_id")
        .orderBy("qid")
    }),

    // The PRODUCTION retrieval arm through the same metrics harness
    // (r14): the IVF ladder's batched probe-then-scan
    // (Knn.batchIvfTopK over label clusters, nprobe 4 of 8 — the
    // knn_ivf probe discipline) feeds Eval.retrievalMetrics, so
    // recall-vs-truth of the path users actually run at scale is
    // itself a hash-gated number at any SF — not only the exact tier's.
    "eval_retrieval_ivf" -> ((s, dir) => {
      import graft.functions.VectorFunctions
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"),
          VectorFunctions.asDouble(col("embedding")).as("qv"))
      val results = Knn.batchIvfTopK(emb, queries, "label",
        nprobe = 4, k = 10)
      val qrels = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("label").as("ql"))
        .join(emb.select(col("vec_id").as("rel_id"), col("label")),
          col("ql") === col("label"))
        .filter(col("qid") =!= col("rel_id"))
        .select(col("qid"), col("rel_id").as("vec_id"))
      graft.operators.Eval.retrievalMetrics(results, qrels, k = 10,
          docCol = "vec_id")
        .orderBy("qid")
    }),

    // The IVF recall harness over a NATURAL clustering (r15): on the
    // label-blocked arm the IVF recall reads HIGHER than exact because
    // the label IS both the cluster and the relevance definition — a
    // fixture artifact. Here the corpus is blocked on the
    // deterministic k-means assignment (the cluster_kmeans recursion,
    // k = 8, 3 rounds — SQL-replayable), relevance stays label-based,
    // so the recall number reflects what centroid-probing actually
    // loses on the embedding distribution's own structure — the
    // representative production figure (BASELINE recall row).
    "eval_retrieval_ivf_kmeans" -> ((s, dir) => {
      import graft.functions.VectorFunctions
      val emb = Tables.embeddings(s, dir)
      val asg = graft.operators.Cluster.kmeansAssign(emb, "vec_id",
          "embedding", k = 8, iters = 3)
        .select(col("id").as("vec_id"), col("cluster").as("kc"))
      val embC = emb.join(asg, "vec_id")
      val queries = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"),
          VectorFunctions.asDouble(col("embedding")).as("qv"))
      val results = Knn.batchIvfTopK(embC, queries, "kc",
        nprobe = 4, k = 10)
      val qrels = emb.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("qid"), col("label").as("ql"))
        .join(emb.select(col("vec_id").as("rel_id"), col("label")),
          col("ql") === col("label"))
        .filter(col("qid") =!= col("rel_id"))
        .select(col("qid"), col("rel_id").as("vec_id"))
      graft.operators.Eval.retrievalMetrics(results, qrels, k = 10,
          docCol = "vec_id")
        .orderBy("qid")
    }),

    "knn_quantized" -> ((s, dir) => {
      import graft.functions.VectorFunctions._
      // Search over int8-quantized vectors: 4x smaller storage, ranked
      // by dequantized inner product. Scale is materialized behind a
      // projection boundary before the per-element lambdas touch it.
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"), dequantizeInt8(col("q")).as("dq"))
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("qv"))
      emb.crossJoin(broadcast(qv))
        .select(col("vec_id"), round(dot(col("dq"), col("qv")), 6).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(10)
    }),

    // Product quantization: encode every vector to m=8 codes against
    // k=16 per-subspace centroids, rank by the ADC lookup-table score.
    // Seed codebooks (slices of the 16 lowest-id rows — the ORACLE
    // FORMULATION, Pq.seedCodebooks) let DuckDB rebuild the identical
    // model from the table and check encode + ADC bit-for-bit; the
    // production path trains per-subspace KMeans (Pq.trainCodebooks,
    // pinned by PqSpec) and re-ranks exactly (Pq.ivfPqSearch).
    "knn_pq" -> ((s, dir) => {
      import graft.operators.Pq
      val emb = Tables.embeddings(s, dir)
      val cb = Pq.seedCodebooks(emb, "vec_id", "embedding", m = 8, k = 16)
      val q = emb.filter(col("vec_id") === 7)
        .select(graft.functions.VectorFunctions.asDouble(col("embedding")))
        .head.getSeq[Double](0).toArray
      emb.select(col("vec_id"), Pq.encodeCol(col("embedding"), cb).as("codes"))
        .select(col("vec_id"),
          round(Pq.adcScore(col("codes"), Pq.adcLut(cb, q)), 6).as("adc_score"))
        .orderBy(desc("adc_score"), col("vec_id")).limit(10)
    }),

    // Late-interaction (MaxSim) retrieval: label groups stand in for
    // multi-vector documents, vec_ids 0-2 for the query's token
    // vectors; score = sum over query vectors of the group's best
    // inner product.
    "knn_maxsim" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("qv"))
      graft.operators.Knn.maxSimTopK(emb, queries, groupCol = "label", k = 5)
    }),

    // MMR diversity re-rank over the exact top-50: distributed fetch,
    // then the inherently-sequential greedy loop on the driver's
    // k-bounded candidate set (the serving-layer scalar). Oracle is a
    // recursive CTE replaying the same greedy selection.
    "knn_mmr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Knn.mmrRerank(emb, graft.operators.Knn.queryVector(emb, 0L),
        k = 10, fetchK = 50, lambda = 0.7)
    }),

    // MMR COMPOSED over the IVF tier (r15): the λ = 0.7 greedy
    // diversity selection fetches its 50 candidates from the nprobe=4
    // probed label clusters (Knn.ivfCandidates — the knn_ivf probe
    // discipline) instead of the exact corpus scan, i.e. the serving
    // path's diversity pass at production candidate cost. The oracle
    // restricts the same probe set (the ivfOracle probed CTE) before
    // replaying the knn_mmr recursive greedy selection.
    "knn_mmr_ivf" -> ((s, dir) => {
      import graft.operators.Knn
      val emb = Tables.embeddings(s, dir)
      val q = Knn.queryVector(emb, 0L)
      Knn.mmrRerank(Knn.ivfCandidates(emb, q, "label", nprobe = 4), q,
        k = 10, fetchK = 50, lambda = 0.7)
    }),

    // The 1-bit tier: axis-sign binary sketches ranked by Hamming
    // similarity (integer xor+popcount over 8 bytes/vector), exact
    // re-rank of the top 50. Completes the compression ladder
    // float -> int8 -> PQ -> binary, all oracle-checked.
    "knn_hamming" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === 7)
        .select(graft.functions.VectorFunctions.asDouble(col("embedding")))
        .head.getSeq[Double](0).toArray
      graft.operators.Knn.hammingTopK(emb, q, dims = 64, k = 10, rerank = 50)
    }),

    // The PRODUCTION read path over the persisted 1-bit tier: sketch
    // words stored at build time (8 bytes/vector at 64 dims), so the
    // candidate scan is integer xor+popcount over the binary_sigs
    // table only; floats are touched just for the exact re-rank.
    // knn_hamming above measures sketch-on-the-fly (the build cost);
    // this measures what a query against a standing index pays.
    // Shares knn_hamming's oracle shape (the stored words equal the
    // recomputed ones by construction).
    "knn_hamming_stored" -> ((s, dir) => {
      val out = binaryLayoutDir(s, dir)
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 7)
        .select("embedding").head().getSeq[Float](0).toArray
      graft.pipeline.Index.searchBinary(s, out, qv,
        dims = 64, k = 10, rerank = 50, idCol = "vec_id")
    }),

    // The PRODUCTION read path over the persisted PQ tier: stored
    // centroids rank the probe set (partition pruning on pq_codes),
    // the ADC pass reads only the codes column, and the float vectors
    // are touched just for the exact re-rank of the rerank=50
    // candidates. knn_pq above measures encode+ADC from scratch (the
    // build cost); this measures what a query actually pays.
    "knn_pq_stored" -> ((s, dir) => {
      val out = pqLayoutDir(s, dir)
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 7)
        .select("embedding").head().getSeq[Float](0).toArray
      graft.pipeline.Index.searchPq(s, out, qv,
        nprobe = 4, k = 10, rerank = 50, idCol = "vec_id")
    }),

    "knn_ivf_quantized" -> ((s, dir) => {
      // Composition of the two approximate tiers: centroid-pruned scan
      // (IVF on label clusters, nprobe=4) ranking int8-dequantized
      // vectors — 4x smaller storage AND nprobe/K of the scan. At 100 TB
      // this is the production config: quantized vectors inside
      // partition-pruned cluster files.
      import graft.functions.VectorFunctions._
      val emb = Tables.embeddings(s, dir)
      val qv = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(asDouble(col("embedding")).as("qv"))
      val byPos = emb
        .select(col("label").as("cluster"), posexplode(asDouble(col("embedding"))).as(Seq("pos", "v")))
        .groupBy("cluster", "pos").agg(avg("v").as("cv"))
      val probed = byPos.join(broadcast(qv), expr("true"))
        .groupBy("cluster")
        .agg(round(sum(col("cv") * element_at(col("qv"), col("pos") + 1)), 6).as("cscore"))
        .orderBy(desc("cscore"), col("cluster")).limit(4).select("cluster")
      val pruned = emb.join(broadcast(probed), col("label") === col("cluster"), "left_semi")
        .select(col("vec_id"), quantizeInt8(col("embedding")).as("q"))
        .select(col("vec_id"), dequantizeInt8(col("q")).as("dq"))
      pruned.crossJoin(broadcast(qv))
        .select(col("vec_id"), round(dot(col("dq"), col("qv")), 6).as("score"))
        .orderBy(desc("score"), col("vec_id")).limit(10)
    }),

    // ----- BM25 / hybrid (SURVEY §2.5, A1-A4, J5) -----
    "bm25_stats" -> ((s, dir) => {
      val tf = BM25.termFrequencies(Tables.documents(s, dir), "doc_id", "text")
      BM25.docFrequencies(tf).orderBy(desc("df"), col("term")).limit(100)
    }),

    "bm25_topk" -> ((s, dir) => {
      BM25.topK(Tables.documents(s, dir), "doc_id", "text", "spark hash join stream", 10)
    }),

    "hybrid_search" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      BM25.hybridTopK(Tables.documents(s, dir), emb, "spark hash join",
        Knn.queryVector(emb, 0L), k = 10, alpha = 0.7, fetchK = 50)
    }),

    // ----- metadata filter DSL (SURVEY §2.3, F1-F12) -----
    "filter_dsl" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.filter(MetadataFilterDsl
          .toColumn("lang=en,n_chars>300 OR source^src1", docs).get)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    }),

    // ----- query expansion (SURVEY §2.5, A5/A6) -----
    "query_expansion" -> ((s, dir) => {
      Expansion.forQuery(Tables.documents(s, dir), "doc_id", "text",
        "table scan", topK = 5, maxTerms = 10)
    }),

    // ----- dedup operators (training-data pipeline) -----
    "dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("fp").limit(200)
    }),

    "dedup_jaccard" -> ((s, dir) => {
      // maxShingleDf caps the inverted-index fanout: a shingle shared by
      // d docs contributes d^2 join rows, so on a skewed real corpus the
      // hottest shingles dominate the shuffle. The benchmarked query
      // runs WITH the cap on (the 100 TB posture); the oracle computes
      // the same capped-set Jaccard.
      Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, minJ = 0.5, maxShingleDf = 20)
        .orderBy("id_a", "id_b")
    }),

    // Asymmetric containment pairs — the near-SUPERSET dedup read
    // (wrapper pages swallowing short docs score jaccard -> 0 but
    // containment 1.0 on the contained side); capped-set semantics
    // like dedup_jaccard, min-side normalizer.
    "dedup_containment" -> ((s, dir) => {
      Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
          n = 3, minC = 0.8, maxShingleDf = 20)
        .orderBy("id_a", "id_b")
    }),

    "dedup_minhash" -> ((s, dir) => {
      Dedup.minhashDedup(Tables.documents(s, dir), "doc_id", "text",
          n = 3, numHashes = 8, bandSize = 2, minJ = 0.3)
        .orderBy("id_a", "id_b")
    }),

    // Dedup-method eval harness: precision/recall/F1 of the banded
    // MinHash tier and the winnowing tier against the capped exact
    // Jaccard ground truth — the dedup ladder's eval_retrieval. The
    // corpus-scale work is the three dedup operators; the metric pass
    // touches only their pair outputs.
    "dedup_eval" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val truth = Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, minJ = 0.5, maxShingleDf = 20)
      val minhash = Dedup.minhashDedup(docs, "doc_id", "text",
        n = 3, numHashes = 8, bandSize = 2, minJ = 0.5)
      val winnow = Dedup.winnowPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2, maxFpDf = 20)
      graft.operators.Eval.pairMetricsMany(truth,
          Seq("minhash" -> minhash, "winnow" -> winnow))
        .orderBy("method")
    }),

    // Fuzzy decontamination: corpus docs near-duplicating a benchmark
    // doc (cross-corpus MinHash-LSH + true-Jaccard verify; broadcast
    // bench side). The "benchmark" is every 40th doc truncated to 80%
    // of its words — the paraphrased/truncated leakage exact n-gram
    // decontamination misses.
    "decontaminate_fuzzy" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ws = filter(split(col("text"), "\\s+"), w => length(w) > 0)
      val bench = docs.filter(col("doc_id") % 40 === 0)
        .select(col("doc_id").as("bench_id"),
          array_join(slice(ws, lit(1), ceil(size(ws) * lit(0.8)).cast("int")), " ")
            .as("text"))
      Dedup.minhashDecontaminate(docs, "doc_id", "text",
          bench, "bench_id", "text",
          n = 3, numHashes = 8, bandSize = 2, minJ = 0.3)
        .orderBy("id_a", "id_b")
    }),

    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhash(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("id").limit(100)
    }),

    // SimHash near-dup CLUSTERS (r15): the linear-output ownership
    // shape (Dedup.simhashClusters = class collapse on identical
    // signatures -> banded Hamming pairs over class reps -> CC ->
    // membership join) over the first 300 documents' NATURAL text at
    // maxDist = 3. The oracle replays the simhash bits, the oracle-
    // tier all-pairs Hamming graph, and resolves components by a
    // RECURSIVE reachability closure (component = min reachable id) —
    // diameter-free, so the replay is exact at any SF without a
    // bounded-rounds assumption (unlike the fixture-diameter phash
    // row); closure size is bounded by true near-dup cluster mass.
    "dedup_simhash_clusters" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .orderBy("doc_id").limit(300).select("doc_id", "text")
      Dedup.simhashClusters(docs, "doc_id", "text", maxDist = 3)
        .orderBy("id")
    }),

    // Image near-dup tier: perceptual dHash (PHash64 expression) +
    // the banded Hamming pair join shared with the simhash tier. The
    // media fixture is generated IN the plan from md5 pixel arithmetic
    // (9x8 grayscale PNGs; 25 groups x 8 one-pixel variants), so the
    // oracle can replay the exact pixel values and dHash bit fold in
    // SQL while Spark runs the full encode -> ImageIO decode -> hash
    // path — the lossless round-trip is precisely what's under test.
    "dedup_phash" -> ((s, dir) => {
      import graft.operators.Multimodal
      Multimodal.phashPairs(phashFixtureMedia(s, dir), "id", "content", maxDist = 3)
        .orderBy("id_a", "id_b")
    }),

    // Linear-output near-dup CLUSTERING over the same phash fixture:
    // identical sigs collapse to class reps, min-label CC runs over
    // class reps only, members join the component back
    // (Dedup.hammingClusters). The oracle replays the fingerprints and
    // the pair graph, then runs EIGHT rounds of min-label propagation
    // in chained CTEs — exact because the fixture's pair graph is
    // SF-independent (first 200 doc_ids + md5 arithmetic) and its
    // cluster diameter is bounded by the 8-variant group size.
    "dedup_phash_clusters" -> ((s, dir) => {
      import graft.operators.Multimodal
      Multimodal.phashClusters(phashFixtureMedia(s, dir), "id", "content", maxDist = 3)
        .orderBy("id")
    }),

    // INCREMENTAL connected components (Dedup.connectedComponentsWarm):
    // the daily-increment dedup mode — prior clusters enter as spanning
    // stars, so only the NEW pairs' structure pays propagation rounds.
    // Fixture (ids = first 200 doc_ids, dense 0..199, blocks of 8):
    // "prior" pairs chain positions 0..6 of each block ((i, i+1) for
    // i%8 <= 5); the "increment" attaches each block's position-7 tail
    // ((i, i+1) for i%8 == 6) and merges even blocks with their
    // successor head-to-head ((i, i+8) for i%16 == 0). Spark runs
    // cold CC over the prior pairs, then the WARM pass over increment +
    // prior assignment; the oracle replays a COLD min-label CC over the
    // full pair union in chained CTEs (9 rounds: merged components span
    // two 8-chains joined at the heads, so eccentricity from the min id
    // is 8) — passing proves warm == cold, the operator's contract.
    "dedup_components_warm" -> ((s, dir) => {
      import graft.operators.Dedup
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val prior = ids.filter(col("doc_id") % 8 <= 5)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      val tails = ids.filter(col("doc_id") % 8 === 6)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      val merges = ids.filter(col("doc_id") % 16 === 0 &&
          col("doc_id") + 8 <= 199)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 8).as("id_b"))
      Dedup.connectedComponentsWarm(
        tails.union(merges), Dedup.connectedComponents(prior))
        .orderBy("id")
    }),

    // Cross-source n-gram containment matrix (Dedup.sourceOverlap):
    // for every ordered source pair, shared distinct 3-gram shingles
    // and the A→B containment ratio — the provenance read before
    // mixture weighting (asymmetric by design: a mirror is ~1 both
    // ways, an aggregator is high one way only). Runs over the full
    // documents table; the oracle rebuilds the same tokenizer +
    // 3-gram shingle sets per source in SQL.
    "corpus_source_overlap" -> ((s, dir) => {
      import graft.operators.Dedup
      Dedup.sourceOverlap(Tables.documents(s, dir), "text", "source")
        .orderBy("src_a", "src_b")
    }),

    // The sketch tier: per-source wide-form MinHash signatures (one
    // groupBy pass, no seed cross join) → pairwise Jaccard estimates.
    // k/64 estimates are dyadic, so Spark and DuckDB agree exactly;
    // the oracle replays the md5-base + universal-hash family per
    // source in its long form (min over seed), which the wide form is
    // spec-pinned to equal.
    "corpus_source_overlap_sketch" -> ((s, dir) => {
      import graft.operators.Dedup
      Dedup.sourceOverlapSketch(Tables.documents(s, dir), "text", "source",
        numHashes = 64)
        .orderBy("src_a", "src_b")
    }),

    // The DOMAIN-CARDINALITY overlap tier under the hash gate: banded
    // per-source-signature candidate generation instead of the S×S
    // cross join (no maxSources guard — the millions-of-domains
    // regime). The fixture doubles the corpus under '__m'-suffixed
    // mirror source names, so identical-signature pairs exist and MUST
    // collide on every band (j_est = 1 rows), while the quadratic bulk
    // of near-zero cross pairs is exactly what banding refuses to
    // materialize. Membership is a pure function of the signatures
    // (full ordered band keys), so the oracle replays emit-or-not
    // exactly — not just the estimates.
    "corpus_source_overlap_banded" -> ((s, dir) => {
      import graft.operators.Dedup
      val d = Tables.documents(s, dir)
      val mirrored = d.unionByName(
        d.withColumn("source", concat(col("source"), lit("__m"))))
      Dedup.sourceOverlapBanded(mirrored, "text", "source",
        numHashes = 64, bandSize = 8)
        .orderBy("src_a", "src_b")
    }),

    // Audio near-dup tier: banded-energy fingerprint (AudioFp64
    // expression, the Haitsma-Kalker sign-of-energy-delta bit rule
    // over time-domain block energies) + the same banded Hamming pair
    // join as phash/simhash. The media fixture is generated IN the
    // plan from md5 sample arithmetic (1296-sample 16-bit PCM WAVs; 25
    // groups x 8 one-sample variants), so the oracle can replay the
    // exact samples, block energies and sign bits in SQL while Spark
    // runs the full WAV encode -> AudioSystem decode -> fingerprint
    // path — the lossless PCM round-trip is precisely what's under
    // test.
    "dedup_audio" -> ((s, dir) => {
      import graft.operators.Multimodal
      val wavUdf = udf((sm: Seq[Int]) => Multimodal.pcmWav(sm.toArray))
      val docs = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val g = (col("doc_id") % 25).cast("string")
      val variant = floor(col("doc_id") / 25).cast("long")
      val ppos = conv(substring(md5(concat(lit("aupos:"), g)), 1, 4), 16, 10)
        .cast("long") % 1296
      val samples = transform(sequence(lit(0L), lit(1295L)), i => {
        val base = conv(substring(md5(concat(lit("au:"), g, lit(":"),
          i.cast("string"))), 1, 4), 16, 10).cast("long") % 4001
        (when(i === ppos, (base + variant * 1237) % 4001).otherwise(base)
          - 2000).cast("int")
      })
      val media = docs.select(col("doc_id").as("id"), wavUdf(samples).as("content"))
      Multimodal.audioFpPairs(media, "id", "content", maxDist = 3)
        .orderBy("id_a", "id_b")
    }),

    // Video container metadata: the Mp4Meta ISO BMFF box parser behind
    // Multimodal.decode's video arm. Fixture MP4s (ftyp + moov/mvhd +
    // video/audio traks) are generated IN the plan from doc_id + md5
    // arithmetic, so the oracle can recompute the expected metadata
    // (incl. the duration*1000/timescale integer division) in SQL
    // while Spark runs the full box encode -> parse path.
    "multimodal_video" -> ((s, dir) => {
      import graft.operators.{Multimodal, Mp4Meta}
      val mp4Udf = udf((ts: Long, dur: Long, w: Int, h: Int, n: Long, audio: Boolean) =>
        Mp4Meta.minimalMp4(ts, dur, w, h, n, audio))
      val docs = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val ts = lit(1000L) + (col("doc_id") % 7) * 250L
      val dur = conv(substring(md5(concat(lit("vd:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long")
      val w = (lit(160) + (col("doc_id") % 16) * 16).cast("int")
      val h = (lit(90) + (col("doc_id") % 9) * 30).cast("int")
      val n = conv(substring(md5(concat(lit("vs:"),
        col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long") % 10000
      val audio = (col("doc_id") % 2) === 0
      val media = docs.select(col("doc_id").as("media_id"),
        lit("video").as("media_type"),
        mp4Udf(ts, dur, w, h, n, audio).as("content"))
      Multimodal.decode(media)
        .select(col("media_id").as("id"), col("decoded"), col("width"),
          col("height"), col("n_frames"), col("duration_ms"))
        .orderBy("id")
    }),

    // Pixel-level resize: exact integer block-average downscale
    // (Multimodal.resizeImages) of the dedup_phash PNG fixture from
    // 9x8 to 3x4, then re-decode and emit every resized gray value —
    // the oracle replays the per-block pixel sums with floor division,
    // so the match proves decode -> block-average -> PNG re-encode ->
    // decode end to end.
    "multimodal_resize" -> ((s, dir) => {
      import graft.operators.Multimodal
      val grayUdf = udf((bytes: Array[Byte]) => {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        (0 until img.getHeight).flatMap(y => (0 until img.getWidth).map(x =>
          img.getRGB(x, y) & 0xff)) // r=g=b for gray fixtures
      })
      Multimodal.resizeImages(phashFixtureMedia(s, dir), "id", "content",
          targetW = 3, targetH = 4)
        .select(col("id"), posexplode(grayUdf(col("resized"))).as(Seq("pos", "v")))
        .orderBy("id", "pos")
    }),

    "dedup_embed" -> ((s, dir) => {
      Dedup.embeddingTopPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", "label", topN = 20)
    }),

    // Winnowing (Schleimer et al. 2003): partial-overlap candidates via
    // shared local fingerprints — sliding-min over k-gram hashes, then
    // the jaccard-style inverted-index join with the hot-key cap on.
    "dedup_winnow" -> ((s, dir) => {
      Dedup.winnowPairs(Tables.documents(s, dir), "doc_id", "text",
          k = 3, w = 4, minShared = 2, maxFpDf = 20)
        .orderBy(desc("shared"), col("id_a"), col("id_b")).limit(100)
    }),

    // Hard-negative mining (contrastive training data): for each
    // anchor of a "training batch" (every 20th vector), the 5 most
    // cosine-similar OTHER-label vectors — exact tier as the oracle
    // formulation; the centroid-blocked production tier is pinned in
    // KnnSpec.
    "knn_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.operators.Knn.hardNegatives(
          emb.filter(col("vec_id") % 20 === 0), emb,
          "vec_id", "embedding", "label", k = 5)
        .orderBy("id", "rank")
    }),

    // The BLOCK-SCOPED hard-negative tier as its own hash-gated row
    // (r14): production passes a pre-clustering (IVF centroid) as
    // blockCol, so the plan the 100 TB path actually runs — class
    // collapse keyed on (block, label, vector), candidates scoped to
    // the anchor's block — must be oracle-checked, not only
    // drive-measured (HardNegDrive) and spec-pinned. The block is
    // vec_id modulo a CORPUS-SIZED block count (ceil(n/250) — the
    // auto-bits discipline: a FIXED count means block size grows with
    // the corpus and within-block pair mass grows n²; measured 186x at
    // the 100x sweep before this). Integer-exact, so DuckDB replays the
    // identical partition from count(*); the plan shape is
    // byte-for-byte the centroid-blocked one (blockKey stringifies
    // either), and production's analog is scaling the cluster count
    // with the corpus.
    "knn_hard_negatives_blocked" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val nb = math.max((emb.count() + 249) / 250, 1L)
      val withBlk = emb.withColumn("blkn", pmod(col("vec_id"), lit(nb)))
      graft.operators.Knn.hardNegatives(
          withBlk.filter(col("vec_id") % 20 === 0), withBlk,
          "vec_id", "embedding", "label", k = 5, blockCol = Some("blkn"))
        .orderBy("id", "rank")
    }),

    // Cross-document span REMOVAL (Lee et al. 2021 at winnow-window
    // granularity): spans whose fingerprint appears in >1 doc are cut
    // from every doc except the smallest-id owner; documents are
    // edited, not dropped.
    "dedup_span_removal" -> ((s, dir) => {
      Dedup.removeSharedSpans(Tables.documents(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // SemDeDup (Abbas et al. 2023): per-cluster cosine dedup decision
    // for EVERY row. tau=0.3 exercises both arms on the synthetic
    // embeddings (no true near-dups exist there: max cosine 0.47).
    "dedup_semantic" -> ((s, dir) => {
      Dedup.semanticDedup(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", tau = 0.3)
        .orderBy("id")
    }),

    // ----- similarity-graph analytics (curation signals) -----
    // Exact cosine kNN graph: the adjacency every graph-level curation
    // signal consumes. All-pairs tier = the oracle formulation; the
    // LSH-blocked production tier is recall-pinned in GraphSpec.
    "knn_graph" -> ((s, dir) => {
      Graph.knnGraph(Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 3)
        .orderBy("id", "rnk")
    }),

    // The shared graph FIXTURE as its own row: build + persist the
    // symmetrized kNN edge table the graph_* operator rows consume.
    // Splitting the rows makes the bench measure each operator's
    // iteration cost instead of re-paying the O(n^2) exact fixture
    // build per query (production consumes persisted --edges, the CLI
    // contract); this row REBUILDS unconditionally so its own timing
    // is always the build, and re-registers the cache for the rows
    // after it (bench executes queries in name order: graph_build
    // sorts before every other graph_* row).
    "graph_build" -> ((s, dir) =>
      SparkEntry.buildGraphEdges(s, dir).orderBy("src", "dst")),

    // PageRank centrality over the symmetrized kNN graph: a node whose
    // similarity neighborhood is dense and well-connected is a
    // template/mirror hub — a curation signal no per-document quality
    // score can see. 5 fixed power-iteration rounds; rank floors onto
    // the 2^-30 binary grid each round and every per-edge rank/outdeg
    // term floors onto the 2^-48 grid before summation, making the
    // contribution sum EXACT in doubles and thus order-independent
    // (engine-portable determinism — see Graph.quant/termQuant).
    "graph_pagerank" -> ((s, dir) => {
      Graph.pageRank(graphEdges(s, dir), damping = 0.85, iters = 5)
        .orderBy("id")
    }),

    // The production-tier LSH kNN graph as its own oracle-checked query
    // (same knobs GraphSpec measures recall at): multi-table sign-LSH
    // bucket candidates, exact cosine re-rank — the formulation that
    // replaces knn_graph's O(n^2) cross join at 100 TB.
    "knn_graph_lsh" -> ((s, dir) => {
      // bits = 0 -> AUTO-sized from the corpus count (smallest b in
      // [4, 16] with 2^b * 64 >= n — expected bucket occupancy <= 64).
      // The r12 sf1 sweep showed why the knob must scale with the
      // data: pinned bits=4 means pair mass grows n^2/16, and the 10x
      // corpus measured 61x (replicated) / 20x (perturbed). The oracle
      // replays the same integer-exact bit selection, so the hash gate
      // pins the auto path itself, at every SF.
      Graph.knnGraphLsh(Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 3, dims = 64, bits = 0, tables = 8)
        .orderBy("id", "rnk")
    }),

    // The block-scoped LSH kNN graph as its own hash-gated row (r14):
    // blockCol is the documented past-16-bits scale path (bucket keys
    // become (block, signature)), previously drive-measured
    // (GraphBlockDrive) and spec-pinned but not oracle-gated. `label`
    // is a deterministic column of the table, so the oracle replays
    // the same block scoping by adding the label equality to the
    // bucket self-join. Since r15 auto bits size from the LARGEST
    // BLOCK's count (per-block occupancy <= 64 — recall 0.450 vs the
    // global key's 0.312, GraphBlockDrive r14); the oracle's nb CTE
    // replays the same GROUP BY lbl + max scan.
    "knn_graph_lsh_blocked" -> ((s, dir) => {
      Graph.knnGraphLsh(Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 3, dims = 64, bits = 0, tables = 8, blockCol = Some("label"))
        .orderBy("id", "rnk")
    }),

    // Personalized PageRank: the walk teleports back to a 10-vector
    // seed set, so mass concentrates in the seeds' similarity
    // neighborhood — retrieval expansion (related documents the
    // retriever missed). Top-50 by rank, id tie-breaks.
    // Convergence-watched PageRank (the 100 TB production mode) over a
    // REAL relational graph: the supplier<->customer bipartite graph
    // from lineitem x orders (customer ids offset by 1e6 to disjoint
    // the key spaces), symmetrized. tol = 0.0 makes the watched loop
    // oracle-checkable at ANY knobs: it stops only at the exact grid
    // fixed point, where stopping is indistinguishable from running
    // the remaining rounds, so a fixed-maxIters DuckDB replay matches
    // whether or not the loop early-stops — including the
    // parity-preserving period-2 cycle stop (on this substrate the
    // quantized dynamics settle into an adjacent-cell 2-cycle around
    // round 31, not a fixed point; the watch catches the exact
    // two-rounds-back revisit and stops only on an even remaining
    // budget, which keeps fixed-round equality unconditional). At this
    // row's 10-round cap neither stop fires yet, so the row benches
    // the per-round watched overhead — the L1-delta and cycle-watch
    // 1-row aggregates; genuine early-stop behavior is spec-pinned in
    // GraphSpec on converging AND cycling fixtures.
    "graph_pagerank_watched" -> ((s, dir) => {
      // consumes the graph_build_rel fixture (r15 split): iteration
      // cost only, the build is the fixture row's own measurement
      Graph.pageRankWatched(relEdges(s, dir), damping = 0.5, maxIters = 10,
        tol = 0.0, quantBits = 26)._1.orderBy("id")
    }),

    // The relational-graph FIXTURE row (r15): builds + re-registers
    // the symmetrized supplier<->customer edge set the watched
    // relational rows consume (the r13 graph_build precedent — split
    // fixture from operator so each bench row measures its own cost;
    // together the two watched rows re-paid this join on every run,
    // 16% of suite wall). Output is the per-node degree table — a
    // compact full-build witness the oracle replays exactly.
    "graph_build_rel" -> ((s, dir) => {
      buildRelEdges(s, dir)
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
        .orderBy("id")
    }),

    // k-CORE under the hash gate: iterative peel over a sparsified
    // supplier<->customer graph ((src+dst) % 4 keeps ~1/4 of the
    // pairs, enough to make real peeling happen — half the sf0.001
    // nodes drop). The oracle unrolls a FIXED 8 peel rounds; rounds
    // past the settle point are identity on the settled edge set
    // (peeling is monotone), so the replay is valid at any cap >= the
    // measured depth (2 at every SF) — and if the Spark side ever
    // outlived its own cap it would THROW, failing the gate loudly
    // rather than hash-mismatching.
    "graph_kcore" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").cast("long").as("src"),
          (col("o_custkey").cast("long") + 1000000L).as("dst"))
        .distinct()
        .filter((col("src") + col("dst")) % 4 === 0)
      val edges = pairs.union(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.kCore(edges, k = 3, maxIters = 8)._1
        .orderBy("id")
    }),

    "graph_ppr" -> ((s, dir) => {
      val seeds = Tables.embeddings(s, dir)
        .filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("id"))
      Graph.personalizedPageRank(graphEdges(s, dir), seeds, iters = 5)
        .orderBy(desc("rank"), col("id")).limit(50)
    }),

    // The WATCHED personalized PageRank under the hash gate (r14 —
    // completes the watched family's oracle coverage; it was the one
    // spec-only member). Same relational supplier<->customer graph as
    // graph_pagerank_watched (scale-honest: no n² fixture), seeds =
    // every 50th node id drawn from the edge set itself so seed
    // membership is guaranteed at any SF. tol = 0 makes the watched
    // loop oracle-checkable at ANY knobs: it stops only at the exact
    // grid fixed point (or the even-remainder 2-cycle revisit, which
    // returns the bit-identical full-run state), where extra replay
    // rounds change nothing — so the 6-round recursive CTE is the
    // exact answer whether Spark stopped at round 4 or ran the cap.
    "graph_ppr_watched" -> ((s, dir) => {
      // consumes the graph_build_rel fixture (r15 split) — same
      // edges, only persistence moved; oracle unchanged
      val edges = relEdges(s, dir)
      val seeds = edges.select(col("src").as("id")).distinct()
        .filter(col("id") % 50 === 0)
      // cap 6 (not 10): the replay is exact at ANY cap — if Spark
      // stops early (fixed point / even-remainder cycle) the extra CTE
      // rounds are no-ops, if it runs the cap both sides computed the
      // same 6 rounds — so the cheaper cap buys suite time for free
      Graph.personalizedPageRankWatched(edges, seeds, damping = 0.5,
          maxIters = 6, tol = 0.0, quantBits = 26)._1
        .orderBy(desc("rank"), col("id")).limit(50)
    }),

    // Per-node triangle counts + local clustering coefficient over the
    // kNN graph — community-density signal (template farms / near-dup
    // neighborhoods show up as high-clustering regions). All-integer
    // wedge-join counting; each triangle counted once at its smallest
    // vertex, credited to all three corners.
    "graph_triangles" -> ((s, dir) => {
      Graph.triangleCounts(graphEdges(s, dir)).orderBy("id")
    }),

    // The degree-capped SAMPLED triangle tier under the oracle gate:
    // the kNN graph's degree is bounded at k x tables = 6, so a cap of
    // 64 keeps every center in the exact (w = 1) branch and the result
    // equals graph_triangles — but the PLAN is the capped one (the
    // per-center rank window, the sampled wedge generation, the weight
    // join), so the hash gate covers the production tier's machinery
    // end to end. The above-cap estimator arm is spec-pinned in
    // GraphSpec (its xxhash64 sampling is not DuckDB-replayable, and
    // doesn't need to be: below-cap exactness is the oracle contract).
    // Degree histogram of the symmetrized kNN graph — the graph-health
    // read that sizes triangleCountsCapped's cap (cap at the histogram
    // knee) and confirms the kNN composition's degree bound holds.
    "graph_degree_profile" -> ((s, dir) => {
      Graph.degreeProfile(graphEdges(s, dir)).orderBy("degree")
    }),

    "graph_triangles_capped" -> ((s, dir) => {
      Graph.triangleCountsCapped(graphEdges(s, dir), maxDegree = 64)
        .orderBy("id")
    }),

    // Unsupervised community detection (synchronous LPA, deterministic
    // max-count/min-label tie rule) on an analytic fixture where the
    // density structure is known: 25 8-clique blocks over the first
    // 200 doc_ids, consecutive blocks joined by ONE bridge edge.
    // Communities must be the BLOCKS — the bridge cannot outvote a
    // clique's internal majority — which is exactly what separates LPA
    // from connected components (CC would merge the whole chain of
    // blocks into one cluster; cf. dedup_components_warm's fixture).
    // 4 rounds: the blocks stabilize at round 2 (traced in the oracle
    // comment), so any fixed count >= 2 replays identically.
    "graph_communities" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val cliques = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")),
          floor(col("a") / 8) === floor(col("b") / 8) && col("a") < col("b"))
      val bridges = ids.filter(col("doc_id") % 8 === 7 &&
          col("doc_id") < 199)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      Graph.labelPropagation(
        Graph.symmetrize(cliques.union(bridges), "a", "b"), iters = 4)
        .orderBy("id")
    }),

    // CONVERGENCE-WATCHED community detection under the hash gate —
    // the same clique-block fixture with an 8-round cap. The watch
    // fires at the fixture's measured fixed point (round <= 4,
    // GraphSpec round-count-invariance arm), and the stop rules make
    // early-stop == the full run, so the 8-round unrolled replay is
    // valid at any knobs — the gate proves the watched machinery, not
    // just that the loop counts (the cluster_kmeans_watched stance).
    "graph_communities_watched" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val cliques = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")),
          floor(col("a") / 8) === floor(col("b") / 8) && col("a") < col("b"))
      val bridges = ids.filter(col("doc_id") % 8 === 7 &&
          col("doc_id") < 199)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      Graph.labelPropagationWatched(
        Graph.symmetrize(cliques.union(bridges), "a", "b"), maxIters = 8)._1
        .orderBy("id")
    }),

    // Community QUALITY composed under the hash gate: LPA labels on the
    // clique-block fixture scored by Newman modularity — per community
    // internal-edge fraction minus the degree-random expectation, the
    // did-the-split-mean-anything read the communities arm needs to be
    // trustworthy at scale (a near-zero Q says don't weight a mixture
    // by these labels).
    "graph_modularity" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val cliques = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")),
          floor(col("a") / 8) === floor(col("b") / 8) && col("a") < col("b"))
      val bridges = ids.filter(col("doc_id") % 8 === 7 &&
          col("doc_id") < 199)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"))
      val sym = Graph.symmetrize(cliques.union(bridges), "a", "b")
      Graph.modularity(sym, Graph.labelPropagation(sym, iters = 4))
        .orderBy("label")
    }),

    // WEIGHTED community detection on the same clique-block fixture,
    // with dyadic edge weights ((1 + (a+b)%3)/4 intra, 5/2 on bridges)
    // so every vote sum is exact in doubles on BOTH engines by
    // construction (termQuant is the identity on grid weights — the
    // operator still applies it for arbitrary inputs). The strong
    // bridges make weights MATTER: vote sums, not neighbor counts,
    // decide the tails — whatever partition the dynamics settle on,
    // the oracle replays the identical (max weight-sum, min label)
    // update, so the gate pins the weighted machinery end to end.
    "graph_communities_weighted" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val cliques = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")),
          floor(col("a") / 8) === floor(col("b") / 8) && col("a") < col("b"))
        .withColumn("w", (lit(1) + (col("a") + col("b")) % 3) * lit(0.25))
      val bridges = ids.filter(col("doc_id") % 8 === 7 &&
          col("doc_id") < 199)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"),
          lit(2.5).as("w"))
      Graph.labelPropagationWeighted(
        Graph.symmetrizeWeighted(cliques.union(bridges), "a", "b", "w"),
        iters = 4)
        .orderBy("id")
    }),

    // CONVERGENCE-WATCHED weighted community detection under the hash
    // gate — the graph_communities_watched contract carried to the
    // weighted tier that closed the family asymmetry: same dyadic-
    // weight fixture, 8-round cap. The stop rules (exact fixed point,
    // or an exact period-2 revisit on an even remaining budget) make
    // early-stop == the full run, so the 8-round unrolled weighted
    // replay is valid whatever round the watch fires at.
    "graph_communities_weighted_watched" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val cliques = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")),
          floor(col("a") / 8) === floor(col("b") / 8) && col("a") < col("b"))
        .withColumn("w", (lit(1) + (col("a") + col("b")) % 3) * lit(0.25))
      val bridges = ids.filter(col("doc_id") % 8 === 7 &&
          col("doc_id") < 199)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"),
          lit(2.5).as("w"))
      Graph.labelPropagationWeightedWatched(
        Graph.symmetrizeWeighted(cliques.union(bridges), "a", "b", "w"),
        maxIters = 8)._1
        .orderBy("id")
    }),

    // CONVERGENCE-WATCHED weighted PageRank under the hash gate: the
    // graph_pagerank_watched discipline (tol=0 L1 watch + period-2
    // cycle watch, early-stop == full run) over the rank*w/outw
    // update on the dyadic-weight fixture, 10-round cap — the oracle
    // unrolls exactly 10 weighted rounds.
    "graph_pagerank_weighted_watched" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val cliques = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")),
          floor(col("a") / 8) === floor(col("b") / 8) && col("a") < col("b"))
        .withColumn("w", (lit(1) + (col("a") + col("b")) % 3) * lit(0.25))
      val bridges = ids.filter(col("doc_id") % 8 === 7 &&
          col("doc_id") < 199)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"),
          lit(2.5).as("w"))
      Graph.pageRankWeightedWatched(
        Graph.symmetrizeWeighted(cliques.union(bridges), "a", "b", "w"),
        maxIters = 10, tol = 0.0)._1
        .orderBy("id")
    }),

    // WEIGHTED PageRank on the same dyadic-weight fixture: the surfer
    // follows edges in proportion to weight (rank * w / outw terms,
    // 2^-48-floored, 2^-30 state grid — the graph_pagerank discipline
    // with the division's numerator swapped), so the heavy 2.5 bridges
    // concentrate centrality on block tails in a way plain PageRank
    // (which treats all 8 block edges equally) cannot.
    "graph_pagerank_weighted" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
        .orderBy("doc_id").limit(200)
      val cliques = ids.select(col("doc_id").as("a"))
        .join(ids.select(col("doc_id").as("b")),
          floor(col("a") / 8) === floor(col("b") / 8) && col("a") < col("b"))
        .withColumn("w", (lit(1) + (col("a") + col("b")) % 3) * lit(0.25))
      val bridges = ids.filter(col("doc_id") % 8 === 7 &&
          col("doc_id") < 199)
        .select(col("doc_id").as("a"), (col("doc_id") + 1).as("b"),
          lit(2.5).as("w"))
      Graph.pageRankWeighted(
        Graph.symmetrizeWeighted(cliques.union(bridges), "a", "b", "w"),
        iters = 5)
        .orderBy("id")
    }),

    // Label spreading (Zhou et al. 2004) over the kNN graph: every 5th
    // vector seeds its label, 4 diffusion rounds, per-node argmax with
    // (score desc, label) tie-break — the classifier-bootstrapping step
    // that expands a small labeled set across the similarity structure.
    "graph_label_spread" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, dir)
      val seeds = emb.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id").as("id"), col("label"))
      val spread = Graph.labelSpread(graphEdges(s, dir), seeds,
        alpha = 0.85, iters = 4)
      val w = Window.partitionBy("id").orderBy(desc("score"), col("label"))
      spread.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("id", "label", "score")
        .orderBy("id")
    }),

    // Deterministic Lloyd k-means — the oracle-grade clustering tier
    // (spark.ml KMeans in ivfAssign stays the production IVF path):
    // init = the 4 lowest-id vectors, 3 fixed rounds, distances and
    // centroid means re-quantized to 6 decimals so another engine
    // replaying the update rule reproduces the clusters bit-for-bit.
    "cluster_kmeans" -> ((s, dir) => {
      graft.operators.Cluster.kmeansAssign(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 4, iters = 3)
        .orderBy("id")
    }),

    // WARM-START k-means under the hash gate: Spark derives centroids
    // from a prior assignment (kmeansAssign at 3 rounds) and re-assigns
    // with zero further rounds; because centroids-from-assignment IS
    // the next Lloyd update, this must equal a COLD 4-round run — which
    // is exactly what the oracle replays (the cluster_kmeans recursion
    // with one extra round). Passing proves the warm machinery
    // (centroidsOf + the resumed loop) bit-matches the fit path.
    "cluster_kmeans_warm" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val prior = graft.operators.Cluster.kmeansAssign(
        emb, "vec_id", "embedding", k = 4, iters = 3)
      graft.operators.Cluster.kmeansAssignWarm(
          emb, "vec_id", "embedding", prior, iters = 0)
        .orderBy("id")
    }),

    // CONVERGENCE-WATCHED k-means under the hash gate — the watched-
    // family discipline (graph_pagerank_watched) applied to clustering.
    // tol=0 stops only at the exact fixed point of the 6-decimal-
    // quantized update (or an even-remainder period-2 revisit), where
    // stopping is indistinguishable from running the remaining rounds —
    // so the oracle replays a FIXED 25-round recursion and the equality
    // is valid at any knobs. At sf0.01 the watch genuinely fires
    // (measured convergence at round 19 of the 25-round cap); the gate
    // therefore proves the early-stopped run == the full fixed-round
    // run, not just that the loop can count to 25.
    "cluster_kmeans_watched" -> ((s, dir) => {
      graft.operators.Cluster.kmeansAssignWatched(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 4, maxIters = 25, tol = 0.0)._1
        .orderBy("id")
    }),

    // Cluster-balanced sampling: exactly 30 embeddings per
    // deterministic k-means cluster (stratifiedSample composed over
    // kmeansAssign) — the topic-balancing draw that keeps a dominant
    // cluster from swamping a training mix. Same composition precedent
    // as tokenize_pack / curriculum_pack.
    "sample_cluster_balanced" -> ((s, dir) => {
      val clusters = graft.operators.Cluster.kmeansAssign(
        Tables.embeddings(s, dir), "vec_id", "embedding", k = 4, iters = 3)
      graft.operators.TrainExport.stratifiedSample(
          clusters, "id", "cluster", n = 30, seed = "r10")
        .select("id", "cluster").orderBy("id")
    }),

    // Distributed PCA: one-pass d x d centered scatter via the
    // map-side-combined GramAgg aggregator, fixed-round power iteration
    // on the driver (bounded d x d scalar), codegen'd projection.
    // (id, pc1, pc2) = each embedding's top-2 principal coordinates —
    // the rotation that makes int8/PQ compression cheap and the 2-D
    // corpus map for drift inspection.
    "embedding_pca" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = graft.operators.Pca.fit(emb, "embedding",
        numComponents = 2, powerIters = 40)
      graft.operators.Pca.transform(emb, "vec_id", "embedding", model)
        .withColumnRenamed("vec_id", "id")
        .orderBy("id")
    }),

    // ----- text analysis (training-data pipeline) -----
    "text_metrics" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      Tables.documents(s, dir).select(
        col("doc_id"),
        wordCount(col("text")).as("n_words"),
        approxBpeTokenCount(col("text")).as("n_tokens_est"),
        qualityScore(col("text")).as("quality"))
        .orderBy("doc_id").limit(200)
    }),

    "text_lang_fp" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      Tables.documents(s, dir).select(
        col("doc_id"),
        langId(col("text")).as("lang_pred"),
        fingerprint(col("text")).as("fp"))
        .orderBy("doc_id").limit(200)
    }),

    // Canonical text normalization (NFC + control strip + whitespace
    // canonicalization — the pass crawled text gets before any byte-
    // comparing operator). The ASCII corpus would make NFC a no-op, so
    // a suffix with a decomposed accent, a BEL control, tab runs and
    // blank-line spam is appended in BOTH engines — every normalization
    // arm fires on every row. NfcNormalize is a codegen'd Catalyst
    // expression: the whole pipeline fuses into one projection.
    "text_normalize" -> ((s, dir) => {
      import graft.functions.TextFunctions._
      // "cafe" + combining acute (decomposed e-acute), BEL between x
      // and y, tab before z, blank-line and space spam around it all
      val suffix = "\n\n\n  cafe\u0301  x\u0007y\tz  "
      Tables.documents(s, dir).select(
        col("doc_id"),
        normalizeText(concat(col("text"), lit(suffix))).as("text_norm"))
        .orderBy("doc_id").limit(200)
    }),

    // HTML → text extraction (the layer between a WARC crawl's raw
    // payloads and every text operator). A deterministic page is built
    // around each document's text — entity-bearing title, style/script/
    // comment noise (the script body contains a bare '<' that would
    // break naive tag-stripping), block structure, links — then
    // title/body/links are extracted. Pure zero-shuffle regexp_replace
    // chain; the oracle SQL is GENERATED from the same stage lists
    // (HtmlFunctions.htmlToTextSql), so engines cannot drift silently.
    "text_html_extract" -> ((s, dir) => {
      import graft.functions.HtmlFunctions._
      val html = concat(
        lit("<html><head><title> Doc "), col("doc_id"),
        lit(" &amp; notes </title><style>p { color: red }</style></head>"),
        lit("<body><!-- nav bar --><h1>Doc "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><script>var x = 1 < 2;</script>"),
        lit("<a href=\"https://example.com/a?b=1\">A</a> &lt;end&gt;</body></html>"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        htmlTitle(html).as("title"),
        htmlToText(html).as("body_text"),
        // joined, not array-typed: the driver compare sorts column
        // values, and array cells defeat the hash path
        concat_ws("|", htmlLinks(html)).as("links"))
        .orderBy("doc_id").limit(200)
    }),

    // URL canonicalization + registered-domain extraction (the layer
    // between a WARC crawl and URL-dedup / domain-mixing). Three URL
    // shapes constructed deterministically per doc_id: case/port/www/
    // tracking-param/fragment junk, a two-level ccTLD suffix, and a
    // deep subdomain with a trailing slash — every canonicalization arm
    // fires. Pure zero-shuffle projection.
    "url_canonical" -> ((s, dir) => {
      import graft.functions.UrlFunctions._
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/Path/"),
            col("doc_id"), lit("/?utm_source=feed&b=2&a=1#sec")))
        .when(col("doc_id") % 3 === 1,
          // non-default port: kept in the canonical URL, stripped from
          // the registered domain (the r6 ADVICE port-fragmentation fix)
          concat(lit("http://"), col("source"), lit(".co.uk:8080/path?z=9&y=8")))
        .otherwise(concat(lit("https://sub."), col("source"), lit(".example.com/a/b/")))
      Tables.documents(s, dir).select(
          col("doc_id"),
          canonicalizeUrl(url).as("url_canon"),
          urlDomain(url).as("domain"))
        .orderBy("doc_id").limit(300)
    }),

    // ----- corpus cleaning (pretraining-data pipeline) -----
    // Gopher document-quality rules: zero-shuffle per-row projection.
    "quality_gopher" -> ((s, dir) => {
      graft.operators.CorpusClean.gopherFlags(
          Tables.documents(s, dir), "doc_id", "text", minWords = 50)
        .orderBy("doc_id").limit(500)
    }),

    // The CCNet deployment shape of the LM scorer: model trained on the
    // even-id half of the corpus, odd-id half scored under it — unseen
    // bigrams exercise the Laplace backoff (model-miss → ln(1/(ctx+37)),
    // context-miss → ln(1/37)), the path quality_lm can't reach.
    "quality_lm_apply" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.operators.CorpusClean.lmModel(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      graft.operators.CorpusClean.lmScoreWith(model,
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .orderBy("doc_id").limit(500)
    }),

    // Trainable Naive Bayes document classifier (the GPT-3/CCNet
    // quality-classifier shape, closed-form so train AND apply are
    // oracle-checked): fit on the even-id half predicting lang, argmax
    // posterior on the held-out odd-id half.
    "quality_nb" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.operators.TextClassifier.train(
        docs.filter(col("doc_id") % 2 === 0), "lang", "text")
      graft.operators.TextClassifier.predict(
          docs.filter(col("doc_id") % 2 === 1), model, "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Gopher's within-document repetition rules (duplicate lines, top
    // 2-gram coverage, duplicated 5-gram coverage) — the companion to
    // quality_gopher's length/symbol/stopword subset. Every rollup is
    // doc-keyed with map-side combine.
    "quality_repetition" -> ((s, dir) => {
      graft.operators.CorpusClean.repetitionFlags(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id").limit(500)
    }),

    // C4's line-level cleaning rules (Raffel et al. 2020 §2.2) over the
    // deterministically linified corpus: terminal-punctuation + word
    // count + blocklist per line, block-phrase / brace / min-kept-lines
    // per doc. Blocklists use corpus vocabulary ("dup" lines, the
    // "slow slow" phrase) so both rule arms fire on real data. Pure
    // zero-shuffle projection.
    "quality_c4" -> ((s, dir) => {
      graft.operators.CorpusClean.c4LineFlags(
          Tables.documents(s, dir)
            .select(col("doc_id"), linified(col("text")).as("text")),
          "doc_id", "text",
          minLineWords = 5, minKeptLines = 3,
          lineBlocklist = Seq("dup"), docBlockPhrases = Seq("slow slow"))
        .orderBy("doc_id").limit(500)
    }),

    // Curriculum ordering: short-to-long schedule (n_chars as the
    // difficulty score), 3 quantile strata, deterministic md5 shuffle
    // within each stratum, global position from the distributed prefix
    // sum — one range-partition shuffle total.
    "curriculum_order" -> ((s, dir) => {
      graft.operators.TrainExport.curriculumOrder(
          Tables.documents(s, dir).select("doc_id", "n_chars"),
          "doc_id", "n_chars", buckets = 3, seed = "curr5")
        .select("doc_id", "n_chars", "bucket", "pos")
        .orderBy("pos")
    }),

    // Curriculum → packing composition: the training-export chain laid
    // out easy-to-hard. packSequences' order key is the curriculum
    // position, so sequence boundaries follow the schedule, not doc id
    // (the tokenize_pack precedent for operator composition). Two
    // range-partition shuffles total (curriculum's + packing's prefix
    // sums); doc_id/bucket ride through packing as passenger columns —
    // no join back, the curriculum computes exactly once.
    "curriculum_pack" -> ((s, dir) => {
      val curr = graft.operators.TrainExport.curriculumOrder(
          Tables.documents(s, dir).select("doc_id", "n_chars"),
          "doc_id", "n_chars", buckets = 3, seed = "curr5")
        .select(col("pos"), col("doc_id"), col("bucket"),
          ceil(col("n_chars") / lit(4.0)).cast("long").as("n_tokens"))
      graft.operators.TrainExport.packSequences(
          curr, "pos", "n_tokens", budget = 2048)
        .select("pos", "doc_id", "bucket", "n_tokens", "seq_id", "seq_offset")
        .orderBy("pos")
    }),

    // Exact line-granular cross-document dedup (C4's repeated-span
    // discard at line granularity): each repeated line survives only at
    // its first (doc, pos) occurrence. Linear plan — ownership agg +
    // key join back, no pair join.
    "dedup_lines" -> ((s, dir) => {
      Dedup.dedupLines(
          Tables.documents(s, dir)
            .select(col("doc_id"), linified(col("text")).as("text")),
          "doc_id", "text", minWords = 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Char-bigram LM quality score (CCNet's perplexity filter without
    // the external model): corpus-trained Laplace-smoothed bigram
    // conditionals, each doc scored by mean ln p over its bigram
    // occurrences. Model fits in KBs and broadcasts; the doc-side
    // shuffle is capped at 37^2 rows/doc by map-side combine.
    "quality_lm" -> ((s, dir) => {
      graft.operators.CorpusClean.lmScore(
          Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id").limit(500)
    }),

    // CCNet's selection stage: head/middle/tail terciles of the LM
    // score per language (thresholds broadcast, assignment map-side).
    "quality_ppl_buckets" -> ((s, dir) => {
      graft.operators.CorpusClean.perplexityBuckets(
          Tables.documents(s, dir), "doc_id", "text", "lang")
        .orderBy("doc_id")
    }),

    // Cross-document repeated 5-grams -> per-doc boilerplate coverage
    // (Lee et al. 2021). One groupBy on the gram + a broadcast join of
    // the (small, head-of-distribution) repeated set back to docs.
    "boilerplate_ngrams" -> ((s, dir) => {
      graft.operators.CorpusClean.boilerplateCoverage(
          Tables.documents(s, dir), "doc_id", "text", n = 5, minDocs = 2)
        .orderBy("doc_id").limit(500)
    }),

    // Corpus vocabulary profile via the SpaceSaving heavy-hitters
    // Aggregator: capacity-bounded state per task instead of shuffling
    // every distinct term. Capacity (10k) >> this vocabulary, so the
    // summary is EXACT (err=0) and hash-checkable; the approximation
    // regime (eviction, error bounds) is pinned in HeavyHittersSpec.
    "corpus_top_terms" -> ((s, dir) => {
      import s.implicits._
      val hh = new graft.functions.HeavyHitters(capacity = 10000)
      Tables.documents(s, dir)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
        .as[String]
        .select(hh.toColumn) // typed select — the Aggregator needs the input encoder
        .toDF("summary")
        .select(explode(col("summary")).as("tc"))
        .select(col("tc.term").as("term"), col("tc.count").as("n"))
        .orderBy(desc("n"), col("term")).limit(50)
    }),

    // First BPE iteration's merge candidates: adjacent-char pair
    // weights over the word-frequency table (the corpus is touched
    // once; pair stats run on the aggregated vocab). The iterative
    // trainer (Bpe.trainMerges) is spec-checked; this declarative
    // round-1 is the oracle surface.
    "bpe_pair_stats" -> ((s, dir) => {
      graft.operators.Bpe.pairStats(
          graft.operators.Bpe.wordFreqs(Tables.documents(s, dir), "text"))
        .orderBy(desc("weight"), col("a"), col("b")).limit(50)
    }),

    // Tokenizer APPLY: segment every doc under a fixed merge list (the
    // encode semantics are what's oracle-checked — training is covered
    // by bpe_pair_stats + BpeSpec). Segmentation runs per DISTINCT
    // word; occurrences recover subwords through a word-keyed join.
    "bpe_encode" -> ((s, dir) => {
      graft.operators.Bpe.encodeDocs(
          Tables.documents(s, dir), "doc_id", "text", BpeDemoMerges)
        .select(col("id").as("doc_id"), col("n_tokens"),
          concat_ws(" ", col("tokens")).as("tokens_str"))
        .orderBy("doc_id").limit(500)
    }),

    // Tokenizer FERTILITY per source: tokens per raw character under
    // the fixed merge list — the tokenizer-health read (a source that
    // compresses badly under the vocab is the wrong language/domain
    // for it, or noise); feeds the scorecard -> plan loop when the
    // budget is counted in TOKENS of a specific tokenizer rather than
    // chars. Composes the bpe_encode path with a source rollup.
    "bpe_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val enc = graft.operators.Bpe.encodeDocs(
        docs, "doc_id", "text", BpeDemoMerges)
      enc.join(docs.select(col("doc_id").as("id"), col("source"),
          col("n_chars")), "id")
        .groupBy("source")
        .agg(sum("n_tokens").as("n_tokens"),
          sum("n_chars").as("n_chars"))
        .select(col("source"), col("n_tokens"), col("n_chars"),
          round(col("n_tokens") / col("n_chars"), 6).as("fertility"))
        .orderBy("source")
    }),

    // Token-ID encoding: the trainer-consumable output. Vocab = base
    // chars + one symbol per merge, a pure function of the merge list;
    // the id lookup is a zero-shuffle literal-map transform.
    "bpe_encode_ids" -> ((s, dir) => {
      graft.operators.Bpe.encodeDocsIds(
          Tables.documents(s, dir), "doc_id", "text", BpeDemoMerges)
        .select(col("id").as("doc_id"), col("n_tokens"),
          concat_ws(" ", transform(col("token_ids"), i => i.cast("string")))
            .as("ids_str"))
        .orderBy("doc_id").limit(500)
    }),

    // The tokenize→pack composition: sequence packing over REAL BPE
    // token counts (pack_sequences uses the chars/4 proxy) — encode
    // feeds the distributed prefix sum directly.
    "tokenize_pack" -> ((s, dir) => {
      val enc = graft.operators.Bpe.encodeDocs(
        Tables.documents(s, dir), "doc_id", "text", BpeDemoMerges)
      graft.operators.TrainExport.packSequences(
          enc.select(col("id").as("doc_id"), col("n_tokens")),
          "doc_id", "n_tokens", budget = 2048)
        .orderBy("doc_id")
    }),

    // Which sources skew the token mix: per-slice unigram KL divergence
    // vs the corpus distribution. One corpus-scale shuffle (the
    // map-side-combined (slice, term) count); all later stages run on
    // aggregated term tables.
    "corpus_divergence" -> ((s, dir) => {
      graft.operators.Profile.tokenDivergence(
        Tables.documents(s, dir), "source", "text")
    }),

    // Embedding-modality drift: per-slice centroid vs corpus centroid
    // (L2 + cosine). One (slice, dim) aggregate over the exploded
    // vectors; the corpus centroid derives from the slice sums.
    "embedding_drift" -> ((s, dir) => {
      graft.operators.Profile.embeddingDrift(
        Tables.embeddings(s, dir), "label", "embedding")
    }),

    // Test-set decontamination: every 50th doc plays the benchmark set;
    // corpus docs sharing a 5-gram with it are flagged with their
    // overlap count (the anti-join input for a clean training split).
    "decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.CorpusClean.decontaminate(
          docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
          docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 5)
        .orderBy("doc_id").limit(500)
    }),

    // ----- training-data export (TrainExport) -----
    // GPT-style concatenate-and-cut packing over the documents table.
    // The naive SQL is a single-partition window; the operator is the
    // two-pass distributed prefix sum (range partition + tiny
    // partition-sum collect + per-partition running sum), so the oracle
    // checks the scalable formulation against the naive one. Token
    // counts use the chars/4 proxy — tokenization itself is covered by
    // text_metrics.
    "pack_sequences" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        ceil(col("n_chars") / lit(4.0)).cast("long").as("n_tokens"))
      graft.operators.TrainExport.packSequences(
          docs, "doc_id", "n_tokens", budget = 2048)
        .orderBy("doc_id")
    }),

    // Mixture-balanced downsampling: every doc of the rarest lang plus
    // an md5-uniform fraction of the others. One tiny count agg
    // broadcast back; the keep decision is a map-side filter, so the
    // operator has no full shuffle at any corpus size.
    "sample_mixture" -> ((s, dir) => {
      graft.operators.TrainExport.mixtureSample(
          Tables.documents(s, dir), "doc_id", "lang", "mix42")
        .select("doc_id", "lang", "source").orderBy("doc_id")
    }),

    // Token-budget mixture PLAN (water-filling): per-source
    // allocations at target weights under a total budget, capped
    // sources spilling their quota — the closed-form pivot scan under
    // the hash gate. Weights cycle powers of two over the sorted
    // source list (dyadic raw weights -> exact integer sum -> the
    // normalization divides identically in both engines); budget =
    // half the corpus chars (integer division both sides). The skewed
    // weights force real cascading caps at every SF.
    "mixture_plan" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sources = docs.select("source").where(col("source").isNotNull)
        .distinct().collect().map(_.getString(0)).sorted
      val weights = sources.zipWithIndex
        .map { case (src, i) => src -> (1L << (i % 4)).toDouble }.toMap
      val budget = docs.agg(sum("n_chars")).collect()(0).getLong(0) / 2
      graft.operators.TrainExport.mixturePlan(
        docs, "source", "n_chars", weights, budget)
    }),

    // The epoch knob under the hash gate: full-total budget with
    // maxRate 2.5 makes the heavy-weight sources OVERSUBSCRIBE their
    // supply — capped rows land at rate 2.5 (upsampled epochs), the
    // rest absorb the spill. 2.5 is dyadic, so cap products are exact
    // in both engines.
    "mixture_plan_epochs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sources = docs.select("source").where(col("source").isNotNull)
        .distinct().collect().map(_.getString(0)).sorted
      val weights = sources.zipWithIndex
        .map { case (src, i) => src -> (1L << (i % 4)).toDouble }.toMap
      val budget = docs.agg(sum("n_chars")).collect()(0).getLong(0)
      graft.operators.TrainExport.mixturePlan(
        docs, "source", "n_chars", weights, budget, maxRate = 2.5)
    }),

    // Epoch DRAW composed: floor(rate) full copies per doc plus an
    // md5-fractional extra — the repeat-high-quality-sources recipe
    // materialized, with the copy index as an epoch column.
    "sample_plan_epochs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sources = docs.select("source").where(col("source").isNotNull)
        .distinct().collect().map(_.getString(0)).sorted
      val weights = sources.zipWithIndex
        .map { case (src, i) => src -> (1L << (i % 4)).toDouble }.toMap
      val budget = docs.agg(sum("n_chars")).collect()(0).getLong(0)
      val plan = graft.operators.TrainExport.mixturePlan(
        docs, "source", "n_chars", weights, budget, maxRate = 2.5)
      graft.operators.TrainExport.rateSampleEpochs(
          docs, "doc_id", "source", plan, "epoch42")
        .select("doc_id", "source", "epoch").orderBy("doc_id", "epoch")
    }),

    // Plan -> DRAW composed under the hash gate: the mixture_plan
    // rates applied by rateSample's md5-hex-threshold keep — the
    // training draw a planned recipe actually executes. Capped sources
    // (rate 1) survive whole; the rest thin at their planned rate.
    "sample_plan_draw" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sources = docs.select("source").where(col("source").isNotNull)
        .distinct().collect().map(_.getString(0)).sorted
      val weights = sources.zipWithIndex
        .map { case (src, i) => src -> (1L << (i % 4)).toDouble }.toMap
      val budget = docs.agg(sum("n_chars")).collect()(0).getLong(0) / 2
      val plan = graft.operators.TrainExport.mixturePlan(
        docs, "source", "n_chars", weights, budget)
      graft.operators.TrainExport.rateSample(
          docs, "doc_id", "source", plan, "plan42")
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // Temperature-reweighted mixture (target class mass ∝ n^alpha):
    // alpha=0.5 thins common languages less aggressively than the
    // uniform mixture; same no-full-shuffle plan.
    "sample_mixture_temp" -> ((s, dir) => {
      graft.operators.TrainExport.mixtureSampleTemperature(
          Tables.documents(s, dir), "doc_id", "lang", alpha = 0.5, "t5")
        .select("doc_id", "lang", "source").orderBy("doc_id")
    }),

    // Fixed-SIZE per-class draw (mixtureSample is the fixed-RATE one):
    // n smallest md5 keys per class via the bounded top-k Aggregator —
    // the exchange carries at most n pairs per (task, class), never a
    // per-class sort of the corpus.
    "sample_stratified" -> ((s, dir) => {
      graft.operators.TrainExport.stratifiedSample(
          Tables.documents(s, dir), "doc_id", "lang", n = 20, seed = "r5")
        .select("doc_id", "lang", "source").orderBy("doc_id")
    }),

    // DSIR importance resampling (Xie et al. 2023): weight every doc by
    // the hashed-ngram log-likelihood ratio of an English target slice
    // vs the raw corpus, then draw 100 docs without replacement via
    // Gumbel top-k. Bucket counts aggregate onto 10k-bounded keys; the
    // per-doc rollup is the one doc-keyed shuffle (NB-scoring shape).
    "sample_dsir" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.TrainExport.dsirSample(
          docs, "doc_id", "text",
          docs.filter(col("lang") === "en"), "text",
          k = 100, seed = "dsir9", buckets = 10000)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // Deterministic global shuffle + round-robin sharding: reproducible
    // md5-keyed permutation, global position via the distributed prefix
    // sum (row_number without the single-partition window), shard
    // sizes equal to ±1 by construction.
    "shuffle_export" -> ((s, dir) => {
      graft.operators.TrainExport.deterministicShuffle(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "doc_id", "shuf7", nShards = 8)
        .select("doc_id", "pos", "shard").orderBy("pos")
    }),

    // PII redaction: the payload is derived deterministically from event
    // keys so the regex parity (email/phone/IPv4, Java regex vs RE2) is
    // actually exercised — the raw synthetic tables contain no PII.
    "pii_scrub" -> ((s, dir) => {
      val ev = Tables.eventsWithTs(s, dir)
        .filter(col("event_id") < 2000)
        .select(col("event_id"), col("user_id"))
      val payload = concat(
        lit("user"), col("user_id"), lit("@example.com said hi from 10.0."),
        col("user_id") % 256, lit("."), col("event_id") % 256,
        lit(" call 555-"),
        lpad((col("event_id") % 1000).cast("string"), 3, "0"), lit("-0199"))
      graft.operators.CorpusClean.piiScrub(
          ev.withColumn("payload", payload), "payload", keep = Seq("event_id"))
        .orderBy("event_id").limit(1000)
    }),

    // ----- as-of join: enrich events with dimension history -----
    "events_asof_order" -> ((s, dir) => {
      // For each event, the customer's most recent order at or before
      // the event time — the union+window as-of join (one shuffle on
      // the key; no pair-join blowup).
      val ev = Tables.eventsWithTs(s, dir).filter(col("user_id") < 10)
        .select("event_id", "user_id", "ts")
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      graft.operators.AsofJoin.latestAtOrBefore(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey")
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id").limit(1000)
    }),

    "events_asof_native" -> ((s, dir) => {
      // Same as-of semantics through the custom plan node
      // (AsofJoinNode -> AsofJoinStrategy -> AsofJoinExec): each side
      // shuffles only its own columns; an O(n) per-partition merge
      // carries one payload row per key. Shares events_asof_order's
      // oracle — the custom physical operator is DuckDB-checked.
      val ev = Tables.eventsWithTs(s, dir).filter(col("user_id") < 10)
        .select("event_id", "user_id", "ts")
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          // NTZ -> TZ is wall-clock identity in the UTC session; the
          // union formulation gets the same coercion implicitly
          col("o_orderdate").cast("timestamp").as("o_orderdate"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      graft.operators.AsofJoin.latestAtOrBeforeNative(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey")
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id").limit(1000)
    }),

    // ----- range join: orders landing inside 30-day transit windows -----
    "range_join_transit" -> ((s, dir) => {
      val usPerDay = 86400L * 1000000
      // session TZ is UTC, so the NTZ->TZ cast is wall-clock identity,
      // matching DuckDB's epoch_us over the naive timestamps
      val li = Tables.lineitem(s, dir).filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("w_start"),
          (unix_micros(col("l_shipdate").cast("timestamp")) + lit(30 * usPerDay)).as("w_end"))
      val ords = Tables.orders(s, dir)
        .select(unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
      graft.operators.RangeJoin.pointInInterval(ords, li,
          pointCol = "o_us", startCol = "w_start", endCol = "w_end",
          bucketWidth = 30 * usPerDay)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ----- corpus profiling (exact oracle tier + sketch tier) -----
    "q_percentiles" -> ((s, dir) => {
      graft.operators.Profile.exactPercentiles(Tables.documents(s, dir))
    }),

    // Sketch tier: HLL++ distinct + approximate quantiles — constant
    // state per group, no SQL-portable oracle (sketch algorithms differ
    // across engines) → driver records the rows-only check; ProfileSpec
    // bounds the sketches against the exact tier.
    "corpus_profile" -> ((s, dir) => {
      graft.operators.Profile.corpusProfile(Tables.documents(s, dir))
    }),

    // Per-source curation scorecard — the drop-this-source-wholesale
    // decision table (volume, mean length, exact-dup pressure, Gopher
    // pass-rate per source). Flags + fingerprint in one zero-shuffle
    // projection, ONE (source, fp)-keyed corpus exchange, rollup
    // cardinality = sources; no countDistinct (the Expand trap) — the
    // second stage counts distinct fingerprints as plain count(1).
    "corpus_source_scorecard" -> ((s, dir) => {
      graft.operators.Profile.sourceScorecard(Tables.documents(s, dir))
    }),

    // ----- multimodal: binary columns with byte-level stats -----
    "multimodal_stats" -> ((s, dir) => {
      import graft.operators.Multimodal
      Tables.documents(s, dir).select(
        col("doc_id"),
        Multimodal.sizeBytes(col("text").cast("binary")).as("size_bytes"),
        Multimodal.contentDigest(col("text").cast("binary")).as("digest"))
        .orderBy("doc_id").limit(200)
    }),

    // Weekly cohort retention (the growth-analytics staple): users
    // grouped by first-seen ISO week, retained(w) = distinct users of
    // the cohort active w weeks after their first event. ONE user-keyed
    // shuffle (min-ts + active-day set in the same aggregate; per-user
    // state bounded by distinct active days) + the tiny
    // (cohort, offset) rollup — the agg/join/distinct/rollup chain this
    // replaces was 4 shuffles for the same answer.
    "events_retention" -> ((s, dir) => {
      val perUser = Tables.eventsWithTs(s, dir)
        .groupBy("user_id")
        .agg(min("ts").as("first_ts"),
          collect_set(to_date(col("ts"))).as("days"))
      perUser
        .select(
          date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
          explode(array_distinct(transform(col("days"),
            d => floor(datediff(d, to_date(col("first_ts"))) / lit(7.0)))))
            .as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("retained"))
        .orderBy("cohort_week", "week_offset")
    }),

    "events_funnel" -> ((s, dir) => {
      // Conversion funnel: of users who signed up, how many purchased
      // *after* their first signup. One pass: conditional min-timestamps
      // per user, then a corpus-level rollup.
      val perUser = Tables.eventsWithTs(s, dir)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        count(col("first_signup")).as("n_signup"),
        sum(when(col("first_signup").isNotNull && col("first_purchase").isNotNull &&
          col("first_purchase") > col("first_signup"), 1).otherwise(0)).as("n_converted"))
    }),

    // ----- events: windowed agg / JSON props / sessionization -----
    "events_window" -> ((s, dir) => {
      Tables.eventsWithTs(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("hour", "event_type")
    }),

    "events_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(get_json_object(col("props"), "$.k").cast("int") > 80)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("event_type")
    }),

    "events_session_native" -> ((s, dir) => {
      // Spark's native session_window operator; semantics checked
      // against the portable lag+cumsum SQL (no exact-1800s gaps exist
      // in the data, where the open/closed boundary would differ).
      Tables.eventsWithTs(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
        .orderBy("user_id")
    }),

    "events_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.eventsWithTs(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ----- index lifecycle: build + end-to-end search (SURVEY §3) -----
    // No SQL oracle (the deterministic hash embedder has no DuckDB
    // equivalent) → driver records the weaker rows-only check.
    "build_index" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_idx_${math.abs(dir.hashCode)}"
      val docs = Tables.documents(s, dir)
        .select(col("text"),
          concat(col("source"), lit("/"), col("doc_id")).as("source"))
      val meta = graft.pipeline.Index.build(docs, out,
        new graft.embedding.HashEmbedder(64), strategy = "simple")
      import s.implicits._
      Seq((meta.passageCount, meta.dimensions.toLong, meta.embeddingModel))
        .toDF("passage_count", "dimensions", "model")
    }),

    "index_search" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_search_${math.abs(dir.hashCode)}"
      val docs = Tables.documents(s, dir)
        .select(col("text"),
          concat(col("source"), lit("/"), col("doc_id")).as("source"))
      val provider = new graft.embedding.HashEmbedder(64)
      graft.pipeline.Index.build(docs, out, provider, strategy = "simple")
      graft.pipeline.Index.search(s, out, "spark hash join", provider,
        topK = 5, filterStr = Some("source^src"), hybrid = true)
    }),

    // ----- chunking (SURVEY §2.2, T1) -----
    // T2 (AST-aware code chunker) under the hash gate: a COMMITTED
    // code fixture (python indent blocks incl. an over-size function
    // that part-splits, rust brace blocks, and a .txt that must
    // dispatch to the simple chunker) runs through the real
    // strategy="ast" path; the oracle replays the expected chunks from
    // a golden VALUES table, so any chunker drift — block detection,
    // gap fill, id derivation, metadata — trips the gate, not just the
    // CodeChunkerSpec goldens. SF-independent by design (the fixture
    // is the contract, not the corpus).
    "chunk_ast" -> ((s, dir) => {
      import s.implicits._
      val docs = Seq(
        (SparkEntry.astFixturePy, "fixture/store.py"),
        (SparkEntry.astFixtureRs, "fixture/store.rs"),
        (SparkEntry.astFixtureTxt, "fixture/notes.txt"))
        .toDF("text", "source")
      graft.pipeline.Index.chunkDocs(docs, "text", "source",
          strategy = "ast", chunkSize = 64, chunkOverlap = 16)
        .toDF()
        .select(col("id"), col("text").as("chunk_text"),
          col("metadata.source").as("source"),
          col("metadata.chunk_type").as("chunk_type"),
          col("metadata.block_type").as("block_type"),
          col("metadata.name").as("name"),
          col("metadata.language").as("language"),
          col("metadata.start_line").as("start_line"),
          col("metadata.end_line").as("end_line"),
          col("metadata.part").as("part"))
        .orderBy("id")
    }),

    "chunk_fixed" -> ((s, dir) => {
      val size = 128
      val step = 96
      Tables.documents(s, dir)
        .filter(length(col("text")) >= 1)
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(0), floor((length(col("text")) - 1) / step).cast("int")),
            i => col("text").substr(i * step + 1, lit(size))))
          .as(Seq("chunk_index", "chunk_text")))
        .orderBy("doc_id", "chunk_index")
    }),
  )

  /** Fixed merge list shared verbatim by the bpe_encode query and its
    * oracle: the encode semantics (greedy left-to-right per rule, rules
    * in order) are what's being checked, so the list itself need not be
    * corpus-optimal. Later rules reference symbols earlier ones create. */
  private[graft] val BpeDemoMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e", "s" -> "t")

  def oracleSql: Map[String, String] = OracleSql.all
}

/** DuckDB-dialect oracle SQL for each query above. Shares the constants
  * (k, rounding, decimal casts, query strings) with the Spark plans. */
private object OracleSql {

  /** Unrolled synchronous-LPA replay rounds for the communities
    * oracles: `n` chained (count, struct-min pick) CTE pairs from
    * `l0` — round i reads l(i-1), exactly the graph_communities text
    * generalized to any round count. */
  /** [[lpaRounds]] with weighted votes: sum(w) instead of count(*),
    * same (wv DESC, nl) row_number pick — the
    * [[graft.operators.Graph.labelPropagationWeighted]] update. */
  private def lpaWeightedRounds(n: Int): String =
    (1 to n).map { i =>
      s"""c$i AS (SELECT e.s AS id, n.label AS nl, sum(e.w) AS wv
         |       FROM e JOIN l${i - 1} n ON n.id = e.d GROUP BY e.s, n.label),
         |l$i AS (SELECT id, nl AS label FROM (
         |         SELECT id, nl,
         |                row_number() OVER (PARTITION BY id ORDER BY wv DESC, nl) AS rn
         |         FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  private def lpaRounds(n: Int): String =
    (1 to n).map { i =>
      s"""c$i AS (SELECT e.s AS id, n.label AS nl, count(*) AS c
         |       FROM e JOIN l${i - 1} n ON n.id = e.d GROUP BY e.s, n.label),
         |l$i AS (SELECT id, nl AS label FROM (
         |         SELECT id, nl,
         |                row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
         |         FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** The mixture_plan water-filling CTE chain (shared by the plan and
    * draw oracles): per-source available tokens, the dyadic weight
    * family over sorted sources, integer-division budget
    * (total // budgetDiv), capacities `available * maxRate` (the epoch
    * knob — pass dyadic maxRate literals so the products are exact),
    * and the cross-multiplied capped-prefix scan
    * (TrainExport.mixturePlan's proof-sketch scaladoc). Ends at `flag`
    * (per-source is_capped) and `agg` (capped sums). */
  private def mixturePlanCtes(budgetDiv: Int, maxRate: String): String =
    s"""a AS (SELECT source, sum(n_chars)::BIGINT AS available
      |      FROM documents WHERE source IS NOT NULL GROUP BY source),
      |wr AS (SELECT source,
      |         (CASE (row_number() OVER (ORDER BY source) - 1) % 4
      |            WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8
      |          END)::DOUBLE AS wraw
      |       FROM a),
      |ws AS (SELECT sum(wraw) AS tot FROM wr),
      |w AS (SELECT source, wraw / tot AS w FROM wr, ws),
      |b AS (SELECT (sum(available) // $budgetDiv)::BIGINT AS budget FROM a),
      |s AS (SELECT a.source, a.available, a.available * $maxRate AS cap,
      |             w.w, round(a.available * $maxRate / w.w, 6) AS r
      |      FROM a JOIN w USING (source)),
      |scan AS (SELECT *,
      |    coalesce(sum(cap) OVER (ORDER BY r, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pc,
      |    coalesce(sum(w) OVER (ORDER BY r, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pw
      |  FROM s),
      |flag AS (SELECT scan.*, b.budget,
      |    (cap * (1.0 - pw) <= (budget - pc) * w) AS is_capped
      |  FROM scan, b),
      |agg AS (SELECT
      |    sum(CASE WHEN is_capped THEN cap ELSE 0.0 END) AS cc,
      |    sum(CASE WHEN is_capped THEN w ELSE 0.0 END) AS cw FROM flag)""".stripMargin

  /** The per-source allocation expression over `flag f, agg` (capped =
    * the full capacity; else the final water level times the weight). */
  private val mixturePlanAllocated =
    """CASE WHEN f.is_capped THEN round(f.cap, 6)
      |       ELSE round((CASE WHEN agg.cw >= 1.0 THEN 0.0
      |              ELSE (f.budget - agg.cc) / (1.0 - agg.cw) END) * f.w, 6)
      |  END""".stripMargin

  /** Unrolled k-core peel rounds: each round recomputes degrees from
    * the prior edge set, keeps nodes at >= k, and filters both edge
    * endpoints — identity once the set settles, which is what lets a
    * fixed unroll replay Graph.kCore's converged result. */
  private def kcoreRounds(n: Int, k: Int): String =
    (1 to n).map { i =>
      // each round reads e(i-1) TWICE (degree count + edge filter):
      // MATERIALIZED stops DuckDB's default CTE inlining from doubling
      // the plan per round (2^n base scans — observed as an fd blowup)
      s"""d$i AS (SELECT s, count(*) AS c FROM e${i - 1} GROUP BY s),
         |a$i AS (SELECT s FROM d$i WHERE c >= $k),
         |e$i AS MATERIALIZED (SELECT e.s, e.d FROM e${i - 1} e
         |        JOIN a$i x ON e.s = x.s JOIN a$i y ON e.d = y.s)""".stripMargin
    }.mkString(",\n")

  /** DuckDB CTEs reproducing BM25 stats over `documents` with the
    * reference tokenizer (`[a-zA-Z0-9]+` lowercased, len>1). */
  private val bm25Ctes =
    """toks AS (
      |  SELECT doc_id AS id,
      |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                            t -> length(t) > 1)) AS term
      |  FROM documents),
      |tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |g AS (SELECT (SELECT count(*) FROM documents) AS num_docs,
      |             ((SELECT count(*) FROM toks)::DOUBLE /
      |              (SELECT count(*) FROM documents)) AS avgdl)""".stripMargin

  private def bm25ScoreCte(termsValues: String) =
    s"""$bm25Ctes,
       |q AS (SELECT * FROM (VALUES $termsValues) AS t(term, qn)),
       |s AS (
       |  SELECT tf.id,
       |         sum(q.qn * ln((g.num_docs::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
       |             * (tf.tf * (1.2 + 1.0))
       |             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl.dl::DOUBLE / g.avgdl)))) AS score
       |  FROM tf
       |  JOIN q USING (term)
       |  JOIN dfreq USING (term)
       |  JOIN dl USING (id), g
       |  GROUP BY tf.id)""".stripMargin

  private val discPrice =
    "l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))"

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  private val stopList = sqlList(graft.functions.TextFunctions.stopwords)
  private val kwList = sqlList(graft.functions.TextFunctions.codeKeywords)

  /** The bpe_encode oracle's per-word segmentation expression: each
    * symbol wrapped as `_sym_` (so every rule match is anchored on BOTH
    * symbol boundaries — a bare separator would let a rule match across
    * a shared boundary or inside a multi-char symbol), one non-
    * overlapping left-to-right `replace` per merge rule, which is
    * exactly the greedy single-pass semantics of Bpe.applyMerge. */
  private val bpeEncodeExpr: String =
    SparkEntry.BpeDemoMerges.foldLeft("regexp_replace(word, '(.)', '_\\1_', 'g')") {
      case (e, (a, b)) => s"replace($e, '_${a}__${b}_', '_${a}${b}_')"
    }

  /** The induced vocab as SQL VALUES rows — same pure function of the
    * merge list the Scala side uses (Bpe.vocab). */
  private val bpeVocabValues: String =
    graft.operators.Bpe.vocab(SparkEntry.BpeDemoMerges)
      .map { case (t, i) => s"('$t', $i)" }.mkString(", ")

  /** CTEs rebuilding SparkEntry.linified's deterministic line
    * structure in SQL — `lnf` = (doc_id, lines) with lines of 10
    * whitespace words, '.' appended iff the first word sorts before
    * 'n'. Shared by the line-granular oracles (quality_c4,
    * dedup_lines). */
  private val linifiedCtes =
    """tkw AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS ws
      |  FROM documents),
      |lnf AS (
      |  SELECT doc_id,
      |         CASE WHEN len(ws) > 0 THEN
      |           list_transform(generate_series(0, CAST(ceil(len(ws) / 10.0) AS BIGINT) - 1),
      |             i -> array_to_string(list_slice(ws, i*10 + 1, i*10 + 10), ' ') ||
      |                  CASE WHEN ws[i*10 + 1] < 'n' THEN '.' ELSE '' END)
      |         ELSE []::VARCHAR[] END AS lines
      |  FROM tkw)""".stripMargin

  /** Shared shingle/size/jaccard CTEs over `documents` (3-gram, set
    * semantics) used by the jaccard and minhash oracles. */
  private val shingleCtes =
    """tk AS (
      |  SELECT doc_id AS id,
      |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |                     t -> length(t) > 1) AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT id,
      |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
      |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
      |  FROM tk),
      |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b USING (s)
      |  WHERE a.id < b.id
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT id_a, id_b,
      |         round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
      |  FROM pairs
      |  JOIN sz sa ON id_a = sa.id
      |  JOIN sz sb ON id_b = sb.id)""".stripMargin


  // ----- index_search oracle: the full build+search path in SQL -----
  //
  // The hash embedder is pure integer/float math, so DuckDB can
  // reproduce it bit-for-bit: Java String.hashCode over the (ASCII)
  // text, splitmix64 mixing emulated in HUGEINT arithmetic mod 2^64
  // (xor/floordiv are native; the 64x64->64 multiply is split 32/32 to
  // stay under 128 bits), float32 truncation via ::FLOAT. Each mix
  // stage is its own list_transform CTE so no expression blows up.
  // The chunker is the identity at gate scales (every documents.text
  // fits one 1024-char chunk and is ASCII — both preconditions asserted
  // in ParitySpec's "index_search oracle preconditions"), so chunk id =
  // source || '/' || doc_id || '#0'.

  /** `(a * c) mod 2^64` over HUGEINT, `c` a 64-bit constant split into
    * 32-bit halves at generation time. */
  private def umul64(a: String, c: BigInt): String = {
    val lo = c & 0xFFFFFFFFL
    val hi = c >> 32
    s"((($a) % 4294967296) * $lo + (((($a) % 4294967296) * $hi + " +
      s"(($a) // 4294967296) * $lo) % 4294967296) * 4294967296) % 18446744073709551616"
  }

  /** CTE chain computing the HashEmbedder(64, seed=42) vector for
    * column `text` of CTE `in` carrying key column(s) `keep`; emits CTEs
    * `<p>0..<p>b` and a final `<p>emb(keep..., dv DOUBLE[])`. */
  private def hashEmbedCtes(p: String, in: String, keep: String): String = {
    val M = "18446744073709551616"
    val C1 = BigInt("9e3779b97f4a7c15", 16)
    val C2 = BigInt("bf58476d1ce4e5b9", 16)
    val C3 = BigInt("94d049bb133111eb", 16)
    s"""${p}hc AS (
       |  SELECT $keep, text,
       |    list_reduce(list_prepend(0::BIGINT, list_transform(generate_series(1, length(text)),
       |      i -> unicode(substr(text, i, 1))::BIGINT)),
       |      (h, c) -> (h * 31 + c) % 4294967296) AS hcu
       |  FROM $in),
       |${p}sx AS (
       |  SELECT $keep, xor(42::BIGINT,
       |    CASE WHEN hcu < 2147483648 THEN hcu ELSE hcu - 4294967296 END) AS sxv
       |  FROM ${p}hc),
       |${p}b0 AS (SELECT $keep, (CASE WHEN sxv < 0 THEN sxv::HUGEINT + $M ELSE sxv::HUGEINT END + $C1) % $M AS z FROM ${p}sx),
       |${p}b1 AS (SELECT $keep, xor(z, z // 1073741824) AS z FROM ${p}b0),
       |${p}b2 AS (SELECT $keep, ${umul64("z", C2)} AS z FROM ${p}b1),
       |${p}b3 AS (SELECT $keep, xor(z, z // 134217728) AS z FROM ${p}b2),
       |${p}b4 AS (SELECT $keep, ${umul64("z", C3)} AS z FROM ${p}b3),
       |${p}bb AS (SELECT $keep, xor(z, z // 2147483648) AS base FROM ${p}b4),
       |${p}e0 AS (SELECT $keep, list_transform(generate_series(0, 63), i -> (base + i + $C1) % $M) AS l FROM ${p}bb),
       |${p}e1 AS (SELECT $keep, list_transform(l, z -> xor(z, z // 1073741824)) AS l FROM ${p}e0),
       |${p}e2 AS (SELECT $keep, list_transform(l, z -> ${umul64("z", C2)}) AS l FROM ${p}e1),
       |${p}e3 AS (SELECT $keep, list_transform(l, z -> xor(z, z // 134217728)) AS l FROM ${p}e2),
       |${p}e4 AS (SELECT $keep, list_transform(l, z -> ${umul64("z", C3)}) AS l FROM ${p}e3),
       |${p}e5 AS (SELECT $keep, list_transform(l, z -> xor(z, z // 2147483648)) AS l FROM ${p}e4),
       |${p}xs AS (SELECT $keep, list_transform(l,
       |    m -> (CASE WHEN m >= 9223372036854775808 THEN m - $M ELSE m END)::DOUBLE
       |         / 9223372036854775807) AS xs FROM ${p}e5),
       |${p}nn AS (SELECT $keep, xs, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(xs, x -> x * x)), (a, b) -> a + b)) AS n FROM ${p}xs),
       |${p}emb AS (SELECT $keep,
       |    list_transform(xs, x -> (((x::FLOAT)::DOUBLE / n)::FLOAT)::DOUBLE) AS dv
       |  FROM ${p}nn)""".stripMargin
  }

  /** The query vector is a constant of the query — inlined as a literal
    * (same stance as the query string itself). */
  private val indexSearchQv: String =
    new graft.embedding.HashEmbedder(64).embedOne("spark hash join")
      .map(f => f.toDouble.toString).mkString("[", ", ", "]")

  private val indexSearchOracle: String =
    s"""WITH chunks AS (
       |  SELECT source || '/' || doc_id || '#0' AS id, text,
       |         source || '/' || doc_id AS src
       |  FROM documents),
       |fil AS (SELECT * FROM chunks WHERE starts_with(src, 'src')),
       |${hashEmbedCtes("h", "fil", "id")},
       |q AS (SELECT $indexSearchQv::DOUBLE[] AS qv),
       |vs AS (
       |  SELECT id, round(list_reduce(list_prepend(0.0::DOUBLE,
       |    list_transform(generate_series(1, 64), i -> dv[i] * qv[i])),
       |    (a, b) -> a + b), 6) AS vscore
       |  FROM hemb, q),
       |vec AS (SELECT id, vscore FROM vs ORDER BY vscore DESC, id LIMIT 25),
       |toks AS (
       |  SELECT id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |                                t -> length(t) > 1)) AS term
       |  FROM chunks),
       |tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
       |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |g AS (SELECT (SELECT count(*) FROM chunks) AS num_docs,
       |             (SELECT coalesce(sum(tf), 0) FROM tf)::DOUBLE
       |               / (SELECT count(*) FROM chunks) AS avgdl),
       |qt AS (SELECT * FROM (VALUES ('spark', 1), ('hash', 1), ('join', 1)) t(term, qn)),
       |bm AS (
       |  SELECT tf.id,
       |         sum(qn * ln((num_docs - df + 0.5) / (df + 0.5) + 1.0)
       |             * (tf * (1.2 + 1.0))
       |             / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))) AS score
       |  FROM tf JOIN qt USING (term) JOIN dfq USING (term) JOIN dl USING (id)
       |  CROSS JOIN g
       |  GROUP BY tf.id),
       |bmall AS (
       |  SELECT f.id, round(coalesce(bm.score, 0.0), 6) AS bscore
       |  FROM fil f LEFT JOIN bm ON f.id = bm.id),
       |bmtop AS (SELECT id FROM bmall WHERE bscore > 0 ORDER BY bscore DESC, id LIMIT 25),
       |cand AS (
       |  SELECT coalesce(v.id, t.id) AS id, coalesce(v.vscore, 0.0) AS vscore
       |  FROM vec v FULL OUTER JOIN bmtop t ON v.id = t.id),
       |vstat AS (SELECT min(vscore) AS vmin, max(vscore) AS vmax FROM cand),
       |bstat AS (SELECT min(bscore) AS bmin, max(bscore) AS bmax FROM bmall),
       |fused AS (
       |  SELECT c.id,
       |         round(0.7 * (c.vscore - vmin) / greatest(vmax - vmin, 1e-6)
       |             + (1.0 - 0.7) * (coalesce(b.bscore, 0.0) - bmin)
       |               / greatest(bmax - bmin, 1e-6), 6) AS score
       |  FROM cand c LEFT JOIN bmall b ON c.id = b.id
       |  CROSS JOIN vstat CROSS JOIN bstat
       |  ORDER BY score DESC, c.id LIMIT 5)
       |SELECT f.id, f.score, c.text, c.src AS source
       |FROM fused f JOIN chunks c ON f.id = c.id
       |ORDER BY f.score DESC, f.id""".stripMargin

  /** The as-of join as left-join-of-rank-1 — shared by the union+window
    * formulation (events_asof_order) and the custom physical operator
    * (events_asof_native). */
  private val asofOracle: String =
    """WITH ev AS (SELECT event_id, user_id, ts FROM events WHERE user_id < 10),
      |cand AS (
      |  SELECT ev.event_id, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
      |         row_number() OVER (PARTITION BY ev.event_id
      |                            ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
      |  FROM ev JOIN orders o ON o.o_custkey = ev.user_id
      |                       AND epoch_us(o.o_orderdate) <= epoch_us(ev.ts))
      |SELECT ev.event_id, ev.user_id, c.o_orderkey, c.o_totalprice
      |FROM ev LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c USING (event_id)
      |ORDER BY event_id
      |LIMIT 1000""".stripMargin

  /** Label-clustered IVF probe + exact search within probed clusters
    * (nprobe=4, k=10) — shared by knn_ivf and knn_ivf_plan. */
  private val ivfOracle =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
      |cent AS (
      |  SELECT label AS cluster, i AS pos, avg(embedding[i]::DOUBLE) AS cv
      |  FROM embeddings CROSS JOIN range(1, 65) t(i)
      |  GROUP BY 1, 2),
      |cs AS (SELECT cluster, round(sum(cv * qv[pos]), 6) AS cscore FROM cent, q GROUP BY cluster),
      |probed AS (SELECT cluster FROM cs ORDER BY cscore DESC, cluster LIMIT 4)
      |SELECT e.vec_id, round(list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS score
      |FROM embeddings e, q
      |WHERE e.label IN (SELECT cluster FROM probed)
      |ORDER BY score DESC, e.vec_id
      |LIMIT 10""".stripMargin

  val all: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
         |       CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
         |       CAST(sum($discPrice) AS DOUBLE) AS sum_disc_price,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      s"""SELECT o_orderpriority,
         |       CAST(sum($discPrice) AS DOUBLE) AS revenue,
         |       count(*) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q_semi_anti" ->
      """WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |tagged AS (
        |  SELECT c_mktsegment, 'with_open' AS kind FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM open)
        |  UNION ALL
        |  SELECT c_mktsegment, 'without_open' AS kind FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM open))
        |SELECT c_mktsegment, kind, count(*) AS n
        |FROM tagged
        |GROUP BY c_mktsegment, kind
        |ORDER BY c_mktsegment, kind""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS gid,
        |       l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F'
        |                     THEN o_totalprice::DECIMAL(18,2) END) AS DOUBLE) AS total_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O'
        |                     THEN o_totalprice::DECIMAL(18,2) END) AS DOUBLE) AS total_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P'
        |                     THEN o_totalprice::DECIMAL(18,2) END) AS DOUBLE) AS total_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(o_totalprice::DECIMAL(18,2)) OVER (
        |              PARTITION BY o_custkey
        |              ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        |FROM orders
        |WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_topn_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 AND o_custkey < 100
        |ORDER BY o_custkey""".stripMargin,

    "knn_exact" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, round(list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS score
        |FROM embeddings e, q
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    "knn_cosine" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |       round(list_inner_product(e.embedding::DOUBLE[], q.qv) /
        |             (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        |              sqrt(list_inner_product(q.qv, q.qv))), 6) AS score
        |FROM embeddings e, q
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    "knn_filtered" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, round(list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS score
        |FROM embeddings e, q
        |WHERE (e.label IS NULL OR NOT (e.label::DOUBLE = 3.0 OR e.label::DOUBLE = 4.0))
        |  AND (e.vec_id IS NOT NULL AND e.vec_id::DOUBLE >= 10.0)
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    "knn_ivf" -> ivfOracle,

    // The declarative-plan variant probes the same label clusters with
    // the same nprobe/k — one oracle covers both.
    "knn_ivf_plan" -> ivfOracle,

    "knn_ivf_quantized" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |cent AS (
        |  SELECT label AS cluster, i AS pos, avg(embedding[i]::DOUBLE) AS cv
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)
        |  GROUP BY 1, 2),
        |cs AS (SELECT cluster, round(sum(cv * qv[pos]), 6) AS cscore FROM cent, q GROUP BY cluster),
        |probed AS (SELECT cluster FROM cs ORDER BY cscore DESC, cluster LIMIT 4),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |      WHERE label IN (SELECT cluster FROM probed)),
        |sc AS (SELECT vec_id, v,
        |              list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |       FROM e),
        |dq AS (SELECT vec_id,
        |              CASE WHEN scale > 0
        |                   THEN list_transform(v, x -> round(x / scale)::INT * scale)
        |                   ELSE list_transform(v, x -> 0.0) END AS dqv
        |       FROM sc)
        |SELECT d.vec_id, round(list_inner_product(d.dqv, q.qv), 6) AS score
        |FROM dq d, q
        |ORDER BY score DESC, d.vec_id
        |LIMIT 10""".stripMargin,

    "bm25_stats" ->
      s"""WITH $bm25Ctes
         |SELECT term, df FROM dfreq
         |ORDER BY df DESC, term
         |LIMIT 100""".stripMargin,

    "bm25_topk" ->
      s"""WITH ${bm25ScoreCte("('spark', 1.0), ('hash', 1.0), ('join', 1.0), ('stream', 1.0)")}
         |SELECT id, round(score, 6) AS score FROM s
         |ORDER BY score DESC, id
         |LIMIT 10""".stripMargin,

    "index_search" -> indexSearchOracle,

    "hybrid_search" ->
      s"""WITH ${bm25ScoreCte("('spark', 1.0), ('hash', 1.0), ('join', 1.0)")},
         |qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |vec AS (
         |  SELECT e.vec_id AS id, round(list_inner_product(e.embedding::DOUBLE[], qv.qv), 6) AS vscore
         |  FROM embeddings e, qv
         |  ORDER BY vscore DESC, id LIMIT 50),
         |ball AS (
         |  SELECT d.doc_id AS id, round(coalesce(s.score, 0.0), 6) AS bscore
         |  FROM documents d LEFT JOIN s ON d.doc_id = s.id),
         |btop AS (SELECT id FROM ball WHERE bscore > 0 ORDER BY bscore DESC, id LIMIT 50),
         |cand AS (
         |  SELECT coalesce(vec.id, btop.id) AS id, coalesce(vec.vscore, 0.0) AS vscore
         |  FROM vec FULL OUTER JOIN btop ON vec.id = btop.id),
         |vstats AS (SELECT min(vscore) AS vmin, max(vscore) AS vmax FROM cand),
         |bstats AS (SELECT min(bscore) AS bmin, max(bscore) AS bmax FROM ball)
         |SELECT cand.id,
         |       round(0.7 * (cand.vscore - vmin) / greatest(vmax - vmin, 1e-6) +
         |             (1.0 - 0.7) * (coalesce(b.bscore, 0.0) - bmin) / greatest(bmax - bmin, 1e-6),
         |             6) AS score
         |FROM cand LEFT JOIN ball b ON cand.id = b.id, vstats, bstats
         |ORDER BY score DESC, cand.id
         |LIMIT 10""".stripMargin,

    "filter_dsl" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE (lang IS NOT NULL AND lang = 'en'
        |       AND n_chars IS NOT NULL AND n_chars::DOUBLE > 300.0)
        |   OR (source IS NOT NULL AND source LIKE 'src1%')
        |ORDER BY doc_id""".stripMargin,

    "query_expansion" ->
      s"""WITH ${bm25ScoreCte("('table', 1.0), ('scan', 1.0)")},
         |top5 AS (SELECT id, round(score, 6) AS score FROM s
         |         ORDER BY score DESC, id LIMIT 5),
         |ex AS (
         |  SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |           t -> length(t) >= 4
         |                AND t NOT IN $stopList
         |                AND NOT regexp_matches(t, '^[0-9]+$$')
         |                AND NOT (regexp_matches(t, '[0-9]') AND regexp_matches(t, '[a-z]'))
         |                AND t NOT IN $kwList
         |                AND t NOT IN ('table', 'scan'))) AS term
         |  FROM documents WHERE doc_id IN (SELECT id FROM top5))
         |SELECT term, count(*) AS freq FROM ex
         |GROUP BY term
         |ORDER BY freq DESC, term
         |LIMIT 10""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |       count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM documents
        |GROUP BY 1
        |ORDER BY fp
        |LIMIT 200""".stripMargin,

    "dedup_jaccard" ->
      // Capped-set semantics (maxShingleDf=20), mirroring jaccardPairs:
      // intersections AND set sizes both come from the retained shingles.
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |sh0 AS (
        |  SELECT DISTINCT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |  FROM tk),
        |dfs AS (SELECT s, count(*) AS shdf FROM sh0 GROUP BY 1),
        |sh AS (SELECT sh0.id, sh0.s FROM sh0 JOIN dfs USING (s) WHERE shdf <= 20),
        |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b USING (s)
        |  WHERE a.id < b.id
        |  GROUP BY 1, 2),
        |jac AS (
        |  SELECT id_a, id_b,
        |         round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
        |  FROM pairs
        |  JOIN sz sa ON id_a = sa.id
        |  JOIN sz sb ON id_b = sb.id)
        |SELECT id_a, id_b, jaccard FROM jac
        |WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // The dedup_jaccard recursion with the min-side normalizer: both
    // directional containments, kept when either reaches the floor.
    "dedup_containment" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |sh0 AS (
        |  SELECT DISTINCT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |  FROM tk),
        |dfs AS (SELECT s, count(*) AS shdf FROM sh0 GROUP BY 1),
        |sh AS (SELECT sh0.id, sh0.s FROM sh0 JOIN dfs USING (s) WHERE shdf <= 20),
        |sz AS (SELECT id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b USING (s)
        |  WHERE a.id < b.id
        |  GROUP BY 1, 2),
        |cont AS (
        |  SELECT id_a, id_b,
        |         round(inter / sa.sz, 6) AS c_a,
        |         round(inter / sb.sz, 6) AS c_b
        |  FROM pairs
        |  JOIN sz sa ON id_a = sa.id
        |  JOIN sz sb ON id_b = sb.id)
        |SELECT id_a, id_b, c_a, c_b FROM cont
        |WHERE greatest(c_a, c_b) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "dedup_minhash" ->
      s"""WITH $shingleCtes,
         |sig AS (
         |  SELECT id, seed,
         |         min(((h % 2147483647) * (2 * seed + 1) + seed + 1) % 2147483647) AS minh
         |  FROM (SELECT id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh)
         |  CROSS JOIN range(0, 8) r(seed)
         |  GROUP BY id, seed),
         |bands AS (
         |  SELECT id, seed // 2 AS band, min(minh) AS b_lo, max(minh) AS b_hi
         |  FROM sig GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM bands a JOIN bands b USING (band, b_lo, b_hi)
         |  WHERE a.id < b.id)
         |SELECT jac.id_a, jac.id_b, jac.jaccard
         |FROM jac JOIN cand USING (id_a, id_b)
         |WHERE jaccard >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    // The three pair generators replayed (capped jaccard = truth,
    // banded minhash with uncapped verify, winnow fingerprint pairs),
    // then scalar-subquery counts per method; f1 computed FROM the
    // rounded precision/recall exactly as pairMetrics does.
    // "precision" is quoted — bare, DuckDB reads it as the DOUBLE
    // PRECISION type keyword.
    "dedup_eval" ->
      s"""WITH $shingleCtes,
         |tr AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT p.id_a, p.id_b,
         |           round(p.inter / (sa.sz + sb.sz - p.inter), 6) AS jaccard
         |    FROM (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
         |          FROM (SELECT sh.id, sh.s FROM sh
         |                JOIN (SELECT s, count(*) AS shdf FROM sh GROUP BY 1) d
         |                  USING (s) WHERE d.shdf <= 20) a
         |          JOIN (SELECT sh.id, sh.s FROM sh
         |                JOIN (SELECT s, count(*) AS shdf FROM sh GROUP BY 1) d
         |                  USING (s) WHERE d.shdf <= 20) b USING (s)
         |          WHERE a.id < b.id GROUP BY 1, 2) p
         |    JOIN (SELECT id, count(*) AS sz FROM
         |            (SELECT sh.id, sh.s FROM sh
         |             JOIN (SELECT s, count(*) AS shdf FROM sh GROUP BY 1) d
         |               USING (s) WHERE d.shdf <= 20)
         |          GROUP BY 1) sa ON p.id_a = sa.id
         |    JOIN (SELECT id, count(*) AS sz FROM
         |            (SELECT sh.id, sh.s FROM sh
         |             JOIN (SELECT s, count(*) AS shdf FROM sh GROUP BY 1) d
         |               USING (s) WHERE d.shdf <= 20)
         |          GROUP BY 1) sb ON p.id_b = sb.id)
         |  WHERE jaccard >= 0.5),
         |sig AS (
         |  SELECT id, seed,
         |         min(((h % 2147483647) * (2 * seed + 1) + seed + 1) % 2147483647) AS minh
         |  FROM (SELECT id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh)
         |  CROSS JOIN range(0, 8) r(seed)
         |  GROUP BY id, seed),
         |bands AS (
         |  SELECT id, seed // 2 AS band, min(minh) AS b_lo, max(minh) AS b_hi
         |  FROM sig GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM bands a JOIN bands b USING (band, b_lo, b_hi)
         |  WHERE a.id < b.id),
         |mh AS (
         |  SELECT jac.id_a, jac.id_b
         |  FROM jac JOIN cand USING (id_a, id_b)
         |  WHERE jaccard >= 0.5),
         |shp AS (
         |  SELECT id,
         |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
         |           i -> struct_pack(pos := i,
         |                  h := CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT)))) AS ph
         |  FROM tk),
         |sh2 AS (SELECT id, ph.pos AS pos, ph.h AS h FROM shp),
         |wmin AS (
         |  SELECT id,
         |         min(h) OVER (PARTITION BY id ORDER BY pos
         |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         |         count(*) OVER (PARTITION BY id ORDER BY pos
         |                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
         |  FROM sh2),
         |fps0 AS (SELECT DISTINCT id, fp FROM wmin WHERE wn = 4),
         |dfc AS (SELECT fp, count(*) AS c FROM fps0 GROUP BY 1),
         |fps AS (SELECT fps0.id, fps0.fp FROM fps0 JOIN dfc USING (fp) WHERE c <= 20),
         |wp AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
         |    FROM fps a JOIN fps b USING (fp) WHERE a.id < b.id GROUP BY 1, 2)
         |  WHERE shared >= 2),
         |m AS (
         |  SELECT 'minhash' AS method,
         |         (SELECT count(*) FROM tr) AS n_truth,
         |         (SELECT count(*) FROM mh) AS n_cand,
         |         (SELECT count(*) FROM mh JOIN tr USING (id_a, id_b)) AS n_hit
         |  UNION ALL
         |  SELECT 'winnow',
         |         (SELECT count(*) FROM tr),
         |         (SELECT count(*) FROM wp),
         |         (SELECT count(*) FROM wp JOIN tr USING (id_a, id_b))),
         |pr AS (
         |  SELECT method, n_truth, n_cand, n_hit,
         |         round(CASE WHEN n_cand > 0 THEN n_hit::DOUBLE / n_cand ELSE 0.0 END, 6) AS "precision",
         |         round(CASE WHEN n_truth > 0 THEN n_hit::DOUBLE / n_truth ELSE 0.0 END, 6) AS recall
         |  FROM m)
         |SELECT method, n_truth, n_cand, n_hit, "precision", recall,
         |       round(CASE WHEN "precision" + recall > 0
         |                  THEN 2.0 * "precision" * recall / ("precision" + recall)
         |                  ELSE 0.0 END, 6) AS f1
         |FROM pr
         |ORDER BY method""".stripMargin,

    // Cross-corpus variant of the dedup_minhash machinery: the A side
    // reuses the shared shingle CTEs, the B side rebuilds them over the
    // truncated bench docs (0.8 is forced to DOUBLE — DuckDB would
    // otherwise do exact DECIMAL arithmetic where Spark does IEEE
    // doubles, and ceil could land differently).
    "decontaminate_fuzzy" ->
      s"""WITH $shingleCtes,
         |bench AS (
         |  SELECT doc_id AS bid,
         |         array_to_string(list_slice(ws, 1,
         |           CAST(ceil(len(ws) * 0.8::DOUBLE) AS BIGINT)), ' ') AS text
         |  FROM (SELECT doc_id,
         |          list_filter(string_split_regex(text, '\\s+'), w -> length(w) > 0) AS ws
         |        FROM documents WHERE doc_id % 40 = 0)),
         |tkb AS (
         |  SELECT bid,
         |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                     t -> length(t) > 1) AS toks
         |  FROM bench),
         |shb AS (
         |  SELECT DISTINCT bid,
         |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
         |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
         |  FROM tkb),
         |siga AS (
         |  SELECT id, seed,
         |         min(((h % 2147483647) * (2 * seed + 1) + seed + 1) % 2147483647) AS minh
         |  FROM (SELECT id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh)
         |  CROSS JOIN range(0, 8) r(seed)
         |  GROUP BY id, seed),
         |sigb AS (
         |  SELECT bid, seed,
         |         min(((h % 2147483647) * (2 * seed + 1) + seed + 1) % 2147483647) AS minh
         |  FROM (SELECT bid, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM shb)
         |  CROSS JOIN range(0, 8) r(seed)
         |  GROUP BY bid, seed),
         |bandsa AS (
         |  SELECT id, seed // 2 AS band, min(minh) AS b_lo, max(minh) AS b_hi
         |  FROM siga GROUP BY 1, 2),
         |bandsb AS (
         |  SELECT bid, seed // 2 AS band, min(minh) AS b_lo, max(minh) AS b_hi
         |  FROM sigb GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.bid AS id_b
         |  FROM bandsa a JOIN bandsb b USING (band, b_lo, b_hi)),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS inter
         |  FROM cand c
         |  JOIN sh sa ON sa.id = c.id_a
         |  JOIN shb sb ON sb.bid = c.id_b AND sb.s = sa.s
         |  GROUP BY 1, 2),
         |szb AS (SELECT bid, count(*) AS sz FROM shb GROUP BY 1)
         |SELECT i.id_a, i.id_b,
         |       round(i.inter / (sza.sz + szb.sz - i.inter), 6) AS jaccard
         |FROM inter i
         |JOIN sz sza ON i.id_a = sza.id
         |JOIN szb ON i.id_b = szb.bid
         |WHERE round(i.inter / (sza.sz + szb.sz - i.inter), 6) >= 0.3
         |ORDER BY id_a, id_b""".stripMargin,

    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id AS id,
        |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 1)) AS term
        |  FROM documents),
        |th AS (
        |  SELECT id, term, count(*) AS f,
        |         CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h
        |  FROM toks GROUP BY id, term),
        |bits AS (
        |  SELECT id, i, sum(f * (((h >> i) & 1) * 2 - 1)) AS s
        |  FROM th CROSS JOIN range(0, 60) r(i)
        |  GROUP BY 1, 2)
        |SELECT id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits
        |GROUP BY id
        |ORDER BY id
        |LIMIT 100""".stripMargin,

    // dedup_simhash's bit replay over the first 300 docs, the oracle-
    // tier all-pairs Hamming graph at dist <= 3 (banding is complete
    // there, so Spark's banded candidates match), then components via
    // a RECURSIVE reachability closure: walk dedups on UNION, so it
    // runs to the true fixpoint — no fixture-diameter assumption —
    // and component = min reachable id, exactly the min-label CC
    // Spark computes over class reps (class members share their rep's
    // component; the min over reps is the min over members).
    "dedup_simhash_clusters" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 300),
        |toks AS (
        |  SELECT doc_id AS id,
        |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 1)) AS term
        |  FROM docs),
        |th AS (
        |  SELECT id, term, count(*) AS f,
        |         CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h
        |  FROM toks GROUP BY id, term),
        |bits AS (
        |  SELECT id, i, sum(f * (((h >> i) & 1) * 2 - 1)) AS s
        |  FROM th CROSS JOIN range(0, 60) r(i)
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT id, CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY id),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        |e AS (SELECT id_a AS s, id_b AS d FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |walk(id, reach) AS (
        |  SELECT id, id AS reach FROM sh
        |  UNION
        |  SELECT w.id, e.d AS reach FROM walk w JOIN e ON e.s = w.reach)
        |SELECT id, min(reach) AS component, (min(reach) = id) AS keep
        |FROM walk
        |GROUP BY id
        |ORDER BY id""".stripMargin,

    // Replays dedup_phash's full arithmetic: the fixture pixels (md5
    // values, one perturbed position per group), the dHash bit fold
    // (bit r*8+c set iff the right neighbor of cell (r,c) is brighter)
    // and the Hamming filter. Spark's path additionally round-trips the
    // pixels through PNG encode + ImageIO decode — lossless, so the
    // hashes must agree bit-for-bit. The oracle pair join is the full
    // cross product (200 docs — fine at oracle scale) while Spark's is
    // banded; banding is complete for dist <= 3, so the results match
    // exactly. Bit 63 can't be built as 1<<63 in DuckDB (overflow
    // check); the CASE supplies the min-long constant directly.
    "dedup_phash" ->
      """WITH docs AS (
        |  SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200),
        |px AS (
        |  SELECT d.doc_id, t.i,
        |    CASE WHEN t.i = CAST(('0x' || substr(md5('pxpos:' || (d.doc_id % 25)), 1, 4)) AS BIGINT) % 72
        |         THEN (CAST(('0x' || substr(md5('px:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 256
        |               + (d.doc_id // 25) * 37) % 256
        |         ELSE CAST(('0x' || substr(md5('px:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 256
        |    END AS v
        |  FROM docs d CROSS JOIN generate_series(0, 71) t(i)),
        |bits AS (
        |  SELECT a.doc_id, (a.i // 9) * 8 + (a.i % 9) AS k,
        |         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  WHERE a.i % 9 < 8),
        |ph AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN bit = 0 THEN 0
        |                       WHEN k = 63 THEN -9223372036854775807 - 1
        |                       ELSE (1::BIGINT << k) END) AS BIGINT) AS phash
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.phash, b.phash)) AS dist
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.phash, b.phash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // Replays dedup_phash's fingerprints + pair graph, then resolves
    // connected components by EIGHT rounds of min-label propagation in
    // chained CTEs — exact because the fixture's pair graph is
    // SF-independent (first 200 doc_ids, md5 arithmetic) and cluster
    // diameter is bounded by the 8-variant group size, so the labels
    // are at fixpoint by round 8. Spark runs the class-level CC
    // (hammingClusters); labels coincide because class reps are class
    // minima and the min over reps is the min over members.
    "dedup_phash_clusters" ->
      """WITH docs AS (
        |  SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200),
        |px AS (
        |  SELECT d.doc_id, t.i,
        |    CASE WHEN t.i = CAST(('0x' || substr(md5('pxpos:' || (d.doc_id % 25)), 1, 4)) AS BIGINT) % 72
        |         THEN (CAST(('0x' || substr(md5('px:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 256
        |               + (d.doc_id // 25) * 37) % 256
        |         ELSE CAST(('0x' || substr(md5('px:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 256
        |    END AS v
        |  FROM docs d CROSS JOIN generate_series(0, 71) t(i)),
        |bits AS (
        |  SELECT a.doc_id, (a.i // 9) * 8 + (a.i % 9) AS k,
        |         CASE WHEN b.v > a.v THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i + 1
        |  WHERE a.i % 9 < 8),
        |ph AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN bit = 0 THEN 0
        |                       WHEN k = 63 THEN -9223372036854775807 - 1
        |                       ELSE (1::BIGINT << k) END) AS BIGINT) AS phash
        |  FROM bits GROUP BY doc_id),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
        |e AS (SELECT id_a AS s, id_b AS d FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |n0 AS (SELECT doc_id AS id, doc_id AS comp FROM ph),
        |n1 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n0 n LEFT JOIN e ON e.s = n.id LEFT JOIN n0 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n2 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n1 n LEFT JOIN e ON e.s = n.id LEFT JOIN n1 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n3 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n2 n LEFT JOIN e ON e.s = n.id LEFT JOIN n2 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n4 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n3 n LEFT JOIN e ON e.s = n.id LEFT JOIN n3 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n5 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n4 n LEFT JOIN e ON e.s = n.id LEFT JOIN n4 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n6 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n5 n LEFT JOIN e ON e.s = n.id LEFT JOIN n5 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n7 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n6 n LEFT JOIN e ON e.s = n.id LEFT JOIN n6 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n8 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n7 n LEFT JOIN e ON e.s = n.id LEFT JOIN n7 m ON m.id = e.d
        |  GROUP BY n.id, n.comp)
        |SELECT id, comp AS component, (comp = id) AS keep
        |FROM n8 ORDER BY id""".stripMargin,

    // COLD replay of the warm-start CC fixture: the full pair union
    // (prior chains + tail attachments + head-to-head block merges)
    // resolved by NINE rounds of min-label propagation — the merged
    // components are two 8-chains joined at the heads, so the farthest
    // member sits 8 hops from the component-min id and labels are at
    // fixpoint by n8 (n9 is margin). Equality against Spark's warm pass
    // is the operator's contract: warm(init, increment) == cold(union).
    "dedup_components_warm" ->
      """WITH ids AS (
        |  SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT id AS id_a, id + 1 AS id_b FROM ids WHERE id % 8 <= 5
        |  UNION ALL
        |  SELECT id, id + 1 FROM ids WHERE id % 8 = 6
        |  UNION ALL
        |  SELECT id, id + 8 FROM ids WHERE id % 16 = 0 AND id + 8 <= 199),
        |e AS (SELECT id_a AS s, id_b AS d FROM p
        |      UNION ALL SELECT id_b, id_a FROM p),
        |n0 AS (SELECT DISTINCT s AS id, s AS comp FROM e),
        |n1 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n0 n LEFT JOIN e ON e.s = n.id LEFT JOIN n0 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n2 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n1 n LEFT JOIN e ON e.s = n.id LEFT JOIN n1 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n3 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n2 n LEFT JOIN e ON e.s = n.id LEFT JOIN n2 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n4 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n3 n LEFT JOIN e ON e.s = n.id LEFT JOIN n3 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n5 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n4 n LEFT JOIN e ON e.s = n.id LEFT JOIN n4 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n6 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n5 n LEFT JOIN e ON e.s = n.id LEFT JOIN n5 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n7 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n6 n LEFT JOIN e ON e.s = n.id LEFT JOIN n6 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n8 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n7 n LEFT JOIN e ON e.s = n.id LEFT JOIN n7 m ON m.id = e.d
        |  GROUP BY n.id, n.comp),
        |n9 AS (
        |  SELECT n.id, least(n.comp, coalesce(min(m.comp), n.comp)) AS comp
        |  FROM n8 n LEFT JOIN e ON e.s = n.id LEFT JOIN n8 m ON m.id = e.d
        |  GROUP BY n.id, n.comp)
        |SELECT id, comp AS component FROM n9 ORDER BY id""".stripMargin,

    // Same tokenizer + 3-gram shingle construction as dedup_jaccard's
    // oracle, aggregated per SOURCE instead of per doc; containment =
    // shared / |A| (integer counts; DuckDB's int/int division is
    // float, matching Spark's long/long → double), rounded to 6 like
    // every ratio under the hash gate.
    // Per-source MinHash in long form: one md5-derived base hash per
    // distinct (source, shingle) — duplicates across docs are harmless
    // under min — seeded by the same universal family as dedup_minhash;
    // eq/64.0 is dyadic so round(,6) agrees with Spark bit-for-bit.
    "corpus_source_overlap_sketch" ->
      """WITH tk AS (
        |  SELECT source AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |sh AS (
        |  SELECT DISTINCT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |  FROM tk),
        |sig AS (
        |  SELECT id, seed,
        |         min(((h % 2147483647) * (2 * seed + 1) + seed + 1) % 2147483647) AS minh
        |  FROM (SELECT id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh)
        |  CROSS JOIN range(0, 64) r(seed)
        |  GROUP BY id, seed),
        |m AS (
        |  SELECT a.id AS src_a, b.id AS src_b,
        |         sum(CASE WHEN a.minh = b.minh THEN 1 ELSE 0 END) AS eq
        |  FROM sig a JOIN sig b ON a.seed = b.seed AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, round(eq / 64.0, 6) AS j_est
        |FROM m ORDER BY src_a, src_b""".stripMargin,

    // The banded tier replayed exactly: same long-form signature CTE
    // over the mirror-doubled corpus, band keys = the 8 ordered minh
    // values per (id, seed // 8) group, candidates = pairs agreeing on
    // at least one full band, estimates = the sketch formula on the
    // candidate set only. List equality on the ordered band key is the
    // same predicate Spark's struct join key evaluates.
    "corpus_source_overlap_banded" ->
      """WITH tk AS (
        |  SELECT source AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
        |  UNION ALL
        |  SELECT source || '__m' AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |sh AS (
        |  SELECT DISTINCT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |  FROM tk),
        |sig AS (
        |  SELECT id, seed,
        |         min(((h % 2147483647) * (2 * seed + 1) + seed + 1) % 2147483647) AS minh
        |  FROM (SELECT id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh)
        |  CROSS JOIN range(0, 64) r(seed)
        |  GROUP BY id, seed),
        |bk AS (
        |  SELECT id, seed // 8 AS band, list(minh ORDER BY seed) AS key
        |  FROM sig GROUP BY id, seed // 8),
        |cand AS (
        |  SELECT DISTINCT a.id AS src_a, b.id AS src_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
        |                     AND a.id < b.id),
        |m AS (
        |  SELECT a.id AS src_a, b.id AS src_b,
        |         sum(CASE WHEN a.minh = b.minh THEN 1 ELSE 0 END) AS eq
        |  FROM sig a JOIN sig b ON a.seed = b.seed AND a.id < b.id
        |  JOIN cand c ON c.src_a = a.id AND c.src_b = b.id
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, round(eq / 64.0, 6) AS j_est
        |FROM m ORDER BY src_a, src_b""".stripMargin,

    "corpus_source_overlap" ->
      """WITH tk AS (
        |  SELECT source,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL),
        |sh AS (
        |  SELECT DISTINCT source,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
        |  FROM tk),
        |sz AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
        |  FROM sh a JOIN sh b USING (s)
        |  WHERE a.source <> b.source
        |  GROUP BY 1, 2)
        |SELECT p.src_a, p.src_b, p.shared,
        |       round(p.shared / z.sz, 6) AS containment
        |FROM pairs p JOIN sz z ON z.source = p.src_a
        |ORDER BY p.src_a, p.src_b""".stripMargin,

    // Replays dedup_audio's full arithmetic: the fixture samples (md5
    // values in [-2000, 2000], one perturbed position per group), the
    // 9x9 block energies (n = 1296 is divisible by 81, so the block
    // index is simply i // 16 on both sides), the Haitsma-Kalker sign
    // bits (bit (f-1)*8+b set iff the band-delta grew vs the previous
    // frame) and the Hamming filter. Spark's path additionally
    // round-trips the samples through WAV encode + AudioSystem decode
    // — lossless 16-bit PCM, so the fingerprints must agree
    // bit-for-bit. The oracle pair join is the full cross product (200
    // docs — fine at oracle scale) while Spark's is banded; banding is
    // complete for dist <= 3, so the results match exactly. Bit 63
    // can't be built as 1<<63 in DuckDB (overflow check); the CASE
    // supplies the min-long constant directly.
    "dedup_audio" ->
      """WITH docs AS (
        |  SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200),
        |smp AS (
        |  SELECT d.doc_id, t.i,
        |    CASE WHEN t.i = CAST(('0x' || substr(md5('aupos:' || (d.doc_id % 25)), 1, 4)) AS BIGINT) % 1296
        |         THEN (CAST(('0x' || substr(md5('au:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 4001
        |               + (d.doc_id // 25) * 1237) % 4001 - 2000
        |         ELSE CAST(('0x' || substr(md5('au:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 4001 - 2000
        |    END AS s
        |  FROM docs d CROSS JOIN generate_series(0, 1295) t(i)),
        |en AS (
        |  SELECT doc_id, i // 16 AS k, sum(s * s) AS e FROM smp GROUP BY 1, 2),
        |dd AS (
        |  SELECT a.doc_id, a.k // 9 AS f, a.k % 9 AS b, a.e - n.e AS d
        |  FROM en a JOIN en n ON n.doc_id = a.doc_id AND n.k = a.k + 1
        |  WHERE a.k % 9 < 8),
        |bits AS (
        |  SELECT c.doc_id, (c.f - 1) * 8 + c.b AS k,
        |         CASE WHEN c.d > p.d THEN 1 ELSE 0 END AS bit
        |  FROM dd c JOIN dd p ON p.doc_id = c.doc_id AND p.f = c.f - 1 AND p.b = c.b
        |  WHERE c.f >= 1),
        |fp AS (
        |  SELECT doc_id,
        |         CAST(sum(CASE WHEN bit = 0 THEN 0
        |                       WHEN k = 63 THEN -9223372036854775807 - 1
        |                       ELSE (1::BIGINT << k) END) AS BIGINT) AS afp
        |  FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.afp, b.afp)) AS dist
        |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.afp, b.afp)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // Recomputes multimodal_video's fixture metadata directly: Spark's
    // values went through MP4 box encode + the Mp4Meta parser, so the
    // match proves the container round-trip (incl. 16.16 fixed-point
    // dims and the duration*1000/timescale integer division).
    "multimodal_video" ->
      """WITH docs AS (
        |  SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200)
        |SELECT doc_id AS id, true AS decoded,
        |       CAST(160 + (doc_id % 16) * 16 AS INT) AS width,
        |       CAST(90 + (doc_id % 9) * 30 AS INT) AS height,
        |       CAST(CAST(('0x' || substr(md5('vs:' || doc_id), 1, 4)) AS BIGINT) % 10000 AS INT) AS n_frames,
        |       CAST(('0x' || substr(md5('vd:' || doc_id), 1, 4)) AS BIGINT) * 1000
        |         // (1000 + (doc_id % 7) * 250) AS duration_ms
        |FROM docs ORDER BY id""".stripMargin,

    // Replays multimodal_resize's block-average arithmetic: the md5
    // fixture pixels grouped into 3x2 blocks (9x8 -> 3x4 has exact
    // integer boundaries), summed and floor-divided per block. Spark's
    // path additionally round-trips through PNG encode -> ImageIO
    // decode -> integer resize -> PNG re-encode -> decode; every step
    // is lossless/exact, so the values match bit-for-bit.
    "multimodal_resize" ->
      """WITH docs AS (
        |  SELECT doc_id FROM documents ORDER BY doc_id LIMIT 200),
        |px AS (
        |  SELECT d.doc_id, t.i,
        |    CASE WHEN t.i = CAST(('0x' || substr(md5('pxpos:' || (d.doc_id % 25)), 1, 4)) AS BIGINT) % 72
        |         THEN (CAST(('0x' || substr(md5('px:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 256
        |               + (d.doc_id // 25) * 37) % 256
        |         ELSE CAST(('0x' || substr(md5('px:' || (d.doc_id % 25) || ':' || t.i), 1, 4)) AS BIGINT) % 256
        |    END AS v
        |  FROM docs d CROSS JOIN generate_series(0, 71) t(i)),
        |grp AS (
        |  SELECT doc_id, (i // 9) // 2 AS r, (i % 9) // 3 AS c, v FROM px)
        |SELECT doc_id AS id, CAST(r * 3 + c AS INT) AS pos,
        |       CAST(sum(v) // 6 AS INT) AS v
        |FROM grp GROUP BY doc_id, r, c
        |ORDER BY id, pos""".stripMargin,

    "dedup_embed" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_inner_product(a.v, b.v) /
        |             (sqrt(list_inner_product(a.v, a.v)) *
        |              sqrt(list_inner_product(b.v, b.v))), 6) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY cosine DESC, id_a, id_b
        |LIMIT 20""".stripMargin,

    "knn_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (
        |  SELECT a.vec_id AS id, c.vec_id AS neg_id,
        |         round(list_inner_product(a.v, c.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(c.v, c.v))), 6) AS cosine
        |  FROM e a JOIN e c ON a.label <> c.label
        |  WHERE a.vec_id % 20 = 0),
        |r AS (
        |  SELECT id, neg_id, cosine,
        |         row_number() OVER (PARTITION BY id
        |                            ORDER BY cosine DESC, neg_id) AS rank
        |  FROM s)
        |SELECT id, rank, neg_id, cosine
        |FROM r WHERE rank <= 5
        |ORDER BY id, rank""".stripMargin,

    // The blocked tier: identical to knn_hard_negatives plus the block
    // equality in the candidate join. The block count replays the Spark
    // side's integer-exact ceil(count/250) — bounded block SIZE at any
    // corpus scale, so the row's cost is linear where a fixed count
    // would be quadratic.
    "knn_hard_negatives_blocked" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |nb AS (SELECT greatest((count(*) + 249) // 250, 1) AS b FROM e),
        |s AS (
        |  SELECT a.vec_id AS id, c.vec_id AS neg_id,
        |         round(list_inner_product(a.v, c.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(c.v, c.v))), 6) AS cosine
        |  FROM e a JOIN e c ON a.label <> c.label
        |                   AND a.vec_id % (SELECT b FROM nb) = c.vec_id % (SELECT b FROM nb)
        |  WHERE a.vec_id % 20 = 0),
        |r AS (
        |  SELECT id, neg_id, cosine,
        |         row_number() OVER (PARTITION BY id
        |                            ORDER BY cosine DESC, neg_id) AS rank
        |  FROM s)
        |SELECT id, rank, neg_id, cosine
        |FROM r WHERE rank <= 5
        |ORDER BY id, rank""".stripMargin,

    "dedup_winnow" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |shp AS (
        |  SELECT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
        |           i -> struct_pack(pos := i,
        |                  h := CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT)))) AS ph
        |  FROM tk),
        |sh2 AS (SELECT id, ph.pos AS pos, ph.h AS h FROM shp),
        |wmin AS (
        |  SELECT id,
        |         min(h) OVER (PARTITION BY id ORDER BY pos
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |         count(*) OVER (PARTITION BY id ORDER BY pos
        |                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
        |  FROM sh2),
        |fps0 AS (SELECT DISTINCT id, fp FROM wmin WHERE wn = 4),
        |dfc AS (SELECT fp, count(*) AS c FROM fps0 GROUP BY 1),
        |fps AS (SELECT fps0.id, fps0.fp FROM fps0 JOIN dfc USING (fp) WHERE c <= 20),
        |p AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
        |      FROM fps a JOIN fps b USING (fp) WHERE a.id < b.id GROUP BY 1, 2)
        |SELECT id_a, id_b, shared FROM p WHERE shared >= 2
        |ORDER BY shared DESC, id_a, id_b
        |LIMIT 100""".stripMargin,

    // The winnow window CTEs with positions kept; ownership = min id
    // among the ≥2 distinct docs carrying the fingerprint; marks =
    // each non-owner window's token span [pos, pos+5] (w+k-2 = 5 at
    // k=3, w=4); string_agg skips NULLed (removed) words.
    "dedup_span_removal" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |shp AS (
        |  SELECT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
        |           i -> struct_pack(pos := i,
        |                  h := CAST(('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15)) AS BIGINT)))) AS ph
        |  FROM tk),
        |sh2 AS (SELECT id, ph.pos AS pos, ph.h AS h FROM shp),
        |wmin AS (
        |  SELECT id, pos,
        |         min(h) OVER (PARTITION BY id ORDER BY pos
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
        |         count(*) OVER (PARTITION BY id ORDER BY pos
        |                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
        |  FROM sh2),
        |wins AS (SELECT id, pos, fp FROM wmin WHERE wn = 4),
        |own AS (
        |  SELECT fp, min(id) AS owner
        |  FROM (SELECT DISTINCT id, fp FROM wins)
        |  GROUP BY fp HAVING count(*) >= 2),
        |marks AS (
        |  SELECT DISTINCT id, tpos FROM (
        |    SELECT w.id, unnest(generate_series(w.pos, w.pos + 5)) AS tpos
        |    FROM wins w JOIN own o USING (fp) WHERE w.id <> o.owner)),
        |toks2 AS (
        |  SELECT id, pos AS tpos, toks[pos] AS word
        |  FROM (SELECT id, toks, unnest(generate_series(1, len(toks))) AS pos
        |        FROM tk)),
        |j AS (
        |  SELECT t.id, t.tpos, t.word, m.tpos IS NOT NULL AS rm
        |  FROM toks2 t LEFT JOIN marks m ON t.id = m.id AND t.tpos = m.tpos)
        |SELECT id AS doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN rm THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
        |       coalesce(string_agg(CASE WHEN rm THEN NULL ELSE word END, ' '
        |                           ORDER BY tpos), '') AS text_deduped
        |FROM j GROUP BY id
        |ORDER BY doc_id""".stripMargin,

    "dedup_semantic" ->
      """WITH e AS (SELECT vec_id, label,
        |                  coalesce(label::VARCHAR, chr(0) || 'null') AS blk,
        |                  embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT a.vec_id AS id, a.label AS cluster,
        |       EXISTS (SELECT 1 FROM e b
        |               WHERE b.blk = a.blk AND b.vec_id < a.vec_id
        |                 AND round(list_inner_product(a.v, b.v) /
        |                       (sqrt(list_inner_product(a.v, a.v)) *
        |                        sqrt(list_inner_product(b.v, b.v))), 6) >= 0.3) AS is_dup
        |FROM e a
        |ORDER BY id""".stripMargin,

    // Exact cosine kNN graph: same all-pairs scoring, per-node rank by
    // (score desc, nb) — the window formulation IS the oracle for the
    // bounded-aggregator plan (identical output by construction).
    "knn_graph" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb, score,
        |        row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |      FROM p)
        |SELECT id, nb, rnk, score FROM r WHERE rnk <= 3
        |ORDER BY id, rnk""".stripMargin,

    // The persisted graph fixture row: the same kNN window, then the
    // symmetrize union-distinct — the edge table every graph_* oracle
    // re-derives inline.
    "graph_build" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb FROM (
        |        SELECT id, nb,
        |               row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |        FROM p) WHERE rnk <= 3)
        |SELECT DISTINCT src, dst FROM (
        |  SELECT id AS src, nb AS dst FROM r
        |  UNION ALL
        |  SELECT nb AS src, id AS dst FROM r)
        |ORDER BY src, dst""".stripMargin,

    // PageRank over the symmetrized kNN graph, replayed as a recursive
    // CTE: 5 rounds, rank FLOORED onto the 2^-30 binary grid per round
    // (matching Graph.quant — floor(x * 2^30) / 2^30, no decimal tie
    // rule), each rank/outdeg term floored onto the 2^-48 grid BEFORE
    // the sum (matching Graph.termQuant) so the summation is exact in
    // doubles and immune to either engine's aggregation order, and the
    // teleport spelled (1.0 - 0.85) COMPUTED because 1.0-0.85 != 0.15
    // in doubles. The inner-join GROUP BY form assumes every node has
    // an in-edge — guaranteed here: symmetrization gives each node
    // in-degree >= k.
    "graph_pagerank" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb FROM (
        |        SELECT id, nb,
        |               row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |        FROM p) WHERE rnk <= 3),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |            SELECT id AS src, nb AS dst FROM r
        |            UNION ALL SELECT nb, id FROM r)),
        |deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |pr(iter, id, rank) AS (
        |  SELECT 0, id, floor((1.0::DOUBLE / (SELECT count(*) FROM nodes))
        |                 * 1073741824.0) / 1073741824.0
        |  FROM nodes
        |  UNION ALL
        |  SELECT p.iter + 1, e2.dst,
        |         floor(((1.0::DOUBLE - 0.85) / (SELECT count(*) FROM nodes)
        |               + 0.85 * (sum(floor(p.rank / d.outdeg * 281474976710656.0) / 281474976710656.0) + 0.0))
        |               * 1073741824.0) / 1073741824.0
        |  FROM pr p
        |  JOIN edges e2 ON e2.src = p.id
        |  JOIN deg d ON d.src = p.id
        |  WHERE p.iter < 5
        |  GROUP BY p.iter, e2.dst
        |)
        |SELECT id, rank FROM pr WHERE iter = 5
        |ORDER BY id""".stripMargin,

    // The watched variant replayed as a FIXED 10-round recursive CTE:
    // valid because the Spark loop's tol = 0.0 stops only at the exact
    // grid fixed point, where the remaining rounds change nothing —
    // early-stopped or not, the round-10 state is identical. Same
    // 2^-26 state grid / 2^-48 term grid discipline as graph_pagerank;
    // the supplier<->customer edge derivation replayed relationally.
    // Unrolled 8-round peel replay over the sparsified graph (see the
    // queries-side comment for why a fixed unroll is valid).
    "graph_kcore" ->
      ("""WITH
        |cs AS (SELECT DISTINCT l.l_suppkey::BIGINT AS src,
        |              (o.o_custkey::BIGINT + 1000000) AS dst
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |sp AS (SELECT src, dst FROM cs WHERE (src + dst) % 4 = 0),
        |e0 AS MATERIALIZED (SELECT src AS s, dst AS d FROM sp
        |       UNION ALL SELECT dst, src FROM sp),
        |""".stripMargin + kcoreRounds(8, 3) + """
        |SELECT s AS id, count(*) AS deg FROM e8 GROUP BY s ORDER BY id"""
        .stripMargin),

    // The relational-graph fixture row (r15 split): the same distinct
    // supplier<->customer pair build the watched oracles replay,
    // witnessed by the per-node degree table of the symmetrized edges.
    "graph_build_rel" ->
      """WITH cs AS (SELECT DISTINCT l.l_suppkey::BIGINT AS src,
        |              (o.o_custkey::BIGINT + 1000000) AS dst
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM cs UNION ALL SELECT dst, src FROM cs)
        |SELECT src AS id, count(*) AS degree FROM e GROUP BY src
        |ORDER BY id""".stripMargin,

    "graph_pagerank_watched" ->
      """WITH RECURSIVE
        |cs AS (SELECT DISTINCT l.l_suppkey::BIGINT AS src,
        |              (o.o_custkey::BIGINT + 1000000) AS dst
        |       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT src, dst FROM cs UNION ALL SELECT dst, src FROM cs),
        |deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |pr(iter, id, rank) AS (
        |  SELECT 0, id, floor((1.0::DOUBLE / (SELECT count(*) FROM nodes))
        |                 * 67108864.0) / 67108864.0
        |  FROM nodes
        |  UNION ALL
        |  SELECT p.iter + 1, e2.dst,
        |         floor(((1.0::DOUBLE - 0.5) / (SELECT count(*) FROM nodes)
        |               + 0.5 * (sum(floor(p.rank / d.outdeg * 281474976710656.0) / 281474976710656.0) + 0.0))
        |               * 67108864.0) / 67108864.0
        |  FROM pr p
        |  JOIN edges e2 ON e2.src = p.id
        |  JOIN deg d ON d.src = p.id
        |  WHERE p.iter < 10
        |  GROUP BY p.iter, e2.dst
        |)
        |SELECT id, rank FROM pr WHERE iter = 10
        |ORDER BY id""".stripMargin,

    // The LSH-blocked kNN graph replayed end to end: splitmix64 plane
    // derivation in HUGEINT mod-2^64 arithmetic (the hashEmbedCtes
    // machinery), per-(table, bit) projections, bucket keys, bucket
    // self-join candidates, exact cosine re-rank. The oracle's plane
    // weights skip the final /2^63 scaling (sign-equivalent: only
    // proj > 0 matters, and the HUGEINT->DOUBLE cast is last-ulp
    // portable where the scaled division is not). The `nb` CTE replays
    // Graph.autoLshBits's integer-exact bit selection (smallest b in
    // [4,16] with 2^b*64 >= n); the `e` CTE mirrors the Spark side's
    // base filter (non-null id/vector, non-zero norm) so the two
    // counts agree BY CONSTRUCTION — a single null or zero vector in
    // the table must not flip the selected bit width between engines.
    //
    // RESIDUAL RISK (documented, accepted): sign-equivalence holds in
    // exact arithmetic only. Spark's dot() sums the 64 products in
    // fixed sequential order; DuckDB's sum() order is unspecified, and
    // the per-term scaling differs — so a projection landing within
    // ~64 ulps of zero (|proj| ~ 1e4 against magnitudes ~1e17, odds
    // ~1e-13 per projection, ~1e-7 per full sf0.1 run) could flip one
    // bucket bit between engines. We accept that over quantizing proj
    // to a coarse grid, which merely relocates the same measure-zero
    // boundary from 0 to the grid edges without shrinking it.
    "knn_graph_lsh" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        |             AND list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
        |nb AS (SELECT coalesce(
        |         (SELECT min(c.b) FROM (SELECT unnest(generate_series(4, 16)) AS b) c
        |          WHERE (1::BIGINT << c.b) * 64 >= (SELECT count(*) FROM e)), 16) AS bits),
        |bt AS (SELECT t.t, b.b, d.d, (1000 + t.t + b.b * 1000003 + d.d)::HUGEINT AS z0
        |       FROM (SELECT unnest(generate_series(0, 7)) AS t) t,
        |            (SELECT unnest(generate_series(0, (SELECT bits - 1 FROM nb))) AS b) b,
        |            (SELECT unnest(generate_series(0, 63)) AS d) d),
        |p0 AS (SELECT t, b, d, (z0 + 11400714819323198485) % 18446744073709551616 AS z FROM bt),
        |p1 AS (SELECT t, b, d, xor(z, z // 1073741824) AS z FROM p0),
        |p2 AS (SELECT t, b, d, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM p1),
        |p3 AS (SELECT t, b, d, xor(z, z // 134217728) AS z FROM p2),
        |p4 AS (SELECT t, b, d, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM p3),
        |p5 AS (SELECT t, b, d, xor(z, z // 2147483648) AS z FROM p4),
        |pl AS (SELECT t, b, d,
        |        (CASE WHEN z >= 9223372036854775808 THEN z - 18446744073709551616 ELSE z END)::DOUBLE AS w
        |       FROM p5),
        |ev AS (SELECT vec_id, d.d, v[d.d + 1] AS val
        |       FROM e, (SELECT unnest(generate_series(0, 63)) AS d) d),
        |pj AS (SELECT ev.vec_id, pl.t, pl.b, sum(ev.val * pl.w) AS proj
        |       FROM ev JOIN pl USING (d) GROUP BY 1, 2, 3),
        |ky AS (SELECT vec_id, t,
        |        sum(CASE WHEN proj > 0 THEN (1::BIGINT << b) ELSE 0 END) AS key
        |       FROM pj GROUP BY 1, 2),
        |cand AS (SELECT DISTINCT a.vec_id AS id, b.vec_id AS nb
        |         FROM ky a JOIN ky b ON a.t = b.t AND a.key = b.key AND a.vec_id <> b.vec_id),
        |sc AS (SELECT c.id, c.nb,
        |        round(list_inner_product(ea.v, eb.v) /
        |              (sqrt(list_inner_product(ea.v, ea.v)) *
        |               sqrt(list_inner_product(eb.v, eb.v))), 6) AS score
        |       FROM cand c JOIN e ea ON ea.vec_id = c.id JOIN e eb ON eb.vec_id = c.nb),
        |r AS (SELECT id, nb, score,
        |        row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk FROM sc)
        |SELECT id, nb, rnk, score FROM r WHERE rnk <= 3 ORDER BY id, rnk""".stripMargin,

    // The block-scoped variant: the same splitmix64 plane replay, with
    // the label equality added to the bucket self-join — bucket keys
    // are (block, table, signature) on the Spark side, so the oracle
    // scopes candidates identically. The lbl CTE mirrors
    // Knn.blockKey's null sentinel (chr(0) || 'null') so a null label
    // would form its own block in BOTH engines rather than dropping
    // from one. Auto bits size from the LARGEST block's count (r15
    // default — per-block occupancy <= 64): the mb CTE is the same
    // GROUP BY lbl + max the Spark side computes, integer-exact.
    "knn_graph_lsh_blocked" ->
      """WITH e AS (SELECT vec_id, coalesce(label::VARCHAR, chr(0) || 'null') AS lbl,
        |                  embedding::DOUBLE[] AS v FROM embeddings
        |           WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
        |             AND list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0),
        |mb AS (SELECT coalesce(max(cnt), 0) AS mx FROM
        |         (SELECT count(*) AS cnt FROM e GROUP BY lbl)),
        |nb AS (SELECT coalesce(
        |         (SELECT min(c.b) FROM (SELECT unnest(generate_series(4, 16)) AS b) c
        |          WHERE (1::BIGINT << c.b) * 64 >= (SELECT mx FROM mb)), 16) AS bits),
        |bt AS (SELECT t.t, b.b, d.d, (1000 + t.t + b.b * 1000003 + d.d)::HUGEINT AS z0
        |       FROM (SELECT unnest(generate_series(0, 7)) AS t) t,
        |            (SELECT unnest(generate_series(0, (SELECT bits - 1 FROM nb))) AS b) b,
        |            (SELECT unnest(generate_series(0, 63)) AS d) d),
        |p0 AS (SELECT t, b, d, (z0 + 11400714819323198485) % 18446744073709551616 AS z FROM bt),
        |p1 AS (SELECT t, b, d, xor(z, z // 1073741824) AS z FROM p0),
        |p2 AS (SELECT t, b, d, (((z) % 4294967296) * 484763065 + ((((z) % 4294967296) * 3210233709 + ((z) // 4294967296) * 484763065) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM p1),
        |p3 AS (SELECT t, b, d, xor(z, z // 134217728) AS z FROM p2),
        |p4 AS (SELECT t, b, d, (((z) % 4294967296) * 321982955 + ((((z) % 4294967296) * 2496678331 + ((z) // 4294967296) * 321982955) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM p3),
        |p5 AS (SELECT t, b, d, xor(z, z // 2147483648) AS z FROM p4),
        |pl AS (SELECT t, b, d,
        |        (CASE WHEN z >= 9223372036854775808 THEN z - 18446744073709551616 ELSE z END)::DOUBLE AS w
        |       FROM p5),
        |ev AS (SELECT vec_id, d.d, v[d.d + 1] AS val
        |       FROM e, (SELECT unnest(generate_series(0, 63)) AS d) d),
        |pj AS (SELECT ev.vec_id, pl.t, pl.b, sum(ev.val * pl.w) AS proj
        |       FROM ev JOIN pl USING (d) GROUP BY 1, 2, 3),
        |ky AS (SELECT pj.vec_id, e2.lbl, pj.t,
        |        sum(CASE WHEN proj > 0 THEN (1::BIGINT << b) ELSE 0 END) AS key
        |       FROM pj JOIN e e2 ON e2.vec_id = pj.vec_id GROUP BY 1, 2, 3),
        |cand AS (SELECT DISTINCT a.vec_id AS id, b.vec_id AS nb
        |         FROM ky a JOIN ky b ON a.t = b.t AND a.key = b.key
        |                            AND a.lbl = b.lbl AND a.vec_id <> b.vec_id),
        |sc AS (SELECT c.id, c.nb,
        |        round(list_inner_product(ea.v, eb.v) /
        |              (sqrt(list_inner_product(ea.v, ea.v)) *
        |               sqrt(list_inner_product(eb.v, eb.v))), 6) AS score
        |       FROM cand c JOIN e ea ON ea.vec_id = c.id JOIN e eb ON eb.vec_id = c.nb),
        |r AS (SELECT id, nb, score,
        |        row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk FROM sc)
        |SELECT id, nb, rnk, score FROM r WHERE rnk <= 3 ORDER BY id, rnk""".stripMargin,

    // Personalized PageRank replayed recursively: sparse rank state
    // seeded at 1/|S|, the clamped seed term re-injected per round via
    // the full-outer (the label-spread pattern), binary-grid
    // requantization, final top-50.
    "graph_ppr" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb FROM (
        |        SELECT id, nb,
        |               row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |        FROM p) WHERE rnk <= 3),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |            SELECT id AS src, nb AS dst FROM r
        |            UNION ALL SELECT nb, id FROM r)),
        |deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY 1),
        |seeds AS (SELECT DISTINCT vec_id AS id FROM embeddings WHERE vec_id % 50 = 0),
        |ns AS (SELECT count(*)::DOUBLE AS n FROM seeds),
        |st(iter, id, rank) AS (
        |  SELECT 0, id,
        |         floor((1.0::DOUBLE / (SELECT n FROM ns)) * 1073741824.0) / 1073741824.0
        |  FROM seeds
        |  UNION ALL
        |  SELECT coalesce(c.iter, (SELECT min(iter) FROM st)) + 1,
        |         coalesce(c.id, s2.id),
        |         floor((0.85 * coalesce(c.contrib, 0.0) + coalesce(s2.sw, 0.0))
        |               * 1073741824.0) / 1073741824.0
        |  FROM (SELECT p2.iter, e2.dst AS id, sum(floor(p2.rank / d.outdeg * 281474976710656.0) / 281474976710656.0) AS contrib
        |        FROM st p2 JOIN edges e2 ON e2.src = p2.id JOIN deg d ON d.src = p2.id
        |        WHERE p2.iter < 5
        |        GROUP BY p2.iter, e2.dst) c
        |  FULL OUTER JOIN (SELECT id, (1.0::DOUBLE - 0.85) / (SELECT n FROM ns) AS sw
        |                   FROM seeds
        |                   WHERE (SELECT min(iter) FROM st) < 5) s2
        |    ON s2.id = c.id
        |)
        |SELECT id, rank FROM st WHERE iter = 5
        |ORDER BY rank DESC, id
        |LIMIT 50""".stripMargin,

    // Watched PPR replay over the relational graph: the graph_ppr CTE
    // shape (sparse state, clamped seed re-injection via full-outer,
    // 2^-48 term grid) at the watched row's knobs — damping 0.5, 2^-26
    // rank grid (67108864), 6 rounds == maxIters. Valid at any knobs:
    // tol = 0 stops only where remaining rounds change nothing.
    "graph_ppr_watched" ->
      """WITH RECURSIVE
        |pairs AS (
        |  SELECT DISTINCT l.l_suppkey::BIGINT AS src,
        |         (o.o_custkey::BIGINT + 1000000) AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |            SELECT src, dst FROM pairs
        |            UNION ALL SELECT dst, src FROM pairs)),
        |deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY 1),
        |seeds AS (SELECT DISTINCT src AS id FROM edges WHERE src % 50 = 0),
        |ns AS (SELECT count(*)::DOUBLE AS n FROM seeds),
        |st(iter, id, rank) AS (
        |  SELECT 0, id,
        |         floor((1.0::DOUBLE / (SELECT n FROM ns)) * 67108864.0) / 67108864.0
        |  FROM seeds
        |  UNION ALL
        |  SELECT coalesce(c.iter, (SELECT min(iter) FROM st)) + 1,
        |         coalesce(c.id, s2.id),
        |         floor((0.5 * coalesce(c.contrib, 0.0) + coalesce(s2.sw, 0.0))
        |               * 67108864.0) / 67108864.0
        |  FROM (SELECT p2.iter, e2.dst AS id, sum(floor(p2.rank / d.outdeg * 281474976710656.0) / 281474976710656.0) AS contrib
        |        FROM st p2 JOIN edges e2 ON e2.src = p2.id JOIN deg d ON d.src = p2.id
        |        WHERE p2.iter < 6
        |        GROUP BY p2.iter, e2.dst) c
        |  FULL OUTER JOIN (SELECT id, (1.0::DOUBLE - 0.5) / (SELECT n FROM ns) AS sw
        |                   FROM seeds
        |                   WHERE (SELECT min(iter) FROM st) < 6) s2
        |    ON s2.id = c.id
        |)
        |SELECT id, rank FROM st WHERE iter = 6
        |ORDER BY rank DESC, id
        |LIMIT 50""".stripMargin,

    // Triangle counting replayed relationally: oriented wedge join
    // (a<b<c), each triangle credited to its three corners; integer
    // counts, coefficient rounded at the end only.
    "graph_triangles" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb FROM (
        |        SELECT id, nb,
        |               row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |        FROM p) WHERE rnk <= 3),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |            SELECT id AS src, nb AS dst FROM r
        |            UNION ALL SELECT nb, id FROM r)),
        |deg AS (SELECT src AS id, count(*) AS degree FROM edges GROUP BY 1),
        |fwd AS (SELECT src AS a, dst AS b FROM edges WHERE src < dst),
        |tris AS (
        |  SELECT w.a, w.b, w.c
        |  FROM (SELECT f1.a, f1.b AS b, f2.b AS c
        |        FROM fwd f1 JOIN fwd f2 USING (a) WHERE f1.b < f2.b) w
        |  JOIN fwd f3 ON f3.a = w.b AND f3.b = w.c),
        |tc AS (SELECT id, count(*) AS triangles FROM (
        |         SELECT a AS id FROM tris
        |         UNION ALL SELECT b FROM tris
        |         UNION ALL SELECT c FROM tris) GROUP BY 1)
        |SELECT d.id, d.degree, coalesce(tc.triangles, 0) AS triangles,
        |       CASE WHEN d.degree < 2 THEN 0.0
        |            ELSE round(2.0 * coalesce(tc.triangles, 0)
        |                       / (d.degree * (d.degree - 1)), 6) END AS clustering
        |FROM deg d LEFT JOIN tc USING (id)
        |ORDER BY d.id""".stripMargin,

    // Degree histogram over the same symmetrized kNN edge derivation.
    "graph_degree_profile" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb FROM (
        |        SELECT id, nb,
        |               row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |        FROM p) WHERE rnk <= 3),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |            SELECT id AS src, nb AS dst FROM r
        |            UNION ALL SELECT nb, id FROM r)),
        |deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1)
        |SELECT degree, count(*) AS nodes FROM deg GROUP BY 1
        |ORDER BY degree""".stripMargin,

    // Same relational replay as graph_triangles — the capped tier with
    // every center under the cap IS exact counting; `triangles` casts
    // to DOUBLE because the estimator column is a weighted sum.
    "graph_triangles_capped" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb FROM (
        |        SELECT id, nb,
        |               row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |        FROM p) WHERE rnk <= 3),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |            SELECT id AS src, nb AS dst FROM r
        |            UNION ALL SELECT nb, id FROM r)),
        |deg AS (SELECT src AS id, count(*) AS degree FROM edges GROUP BY 1),
        |fwd AS (SELECT src AS a, dst AS b FROM edges WHERE src < dst),
        |tris AS (
        |  SELECT w.a, w.b, w.c
        |  FROM (SELECT f1.a, f1.b AS b, f2.b AS c
        |        FROM fwd f1 JOIN fwd f2 USING (a) WHERE f1.b < f2.b) w
        |  JOIN fwd f3 ON f3.a = w.b AND f3.b = w.c),
        |tc AS (SELECT id, count(*) AS triangles FROM (
        |         SELECT a AS id FROM tris
        |         UNION ALL SELECT b FROM tris
        |         UNION ALL SELECT c FROM tris) GROUP BY 1)
        |SELECT d.id, d.degree, coalesce(tc.triangles, 0)::DOUBLE AS triangles,
        |       CASE WHEN d.degree < 2 THEN 0.0
        |            ELSE round(2.0 * coalesce(tc.triangles, 0)
        |                       / (d.degree * (d.degree - 1)), 6) END AS clustering
        |FROM deg d LEFT JOIN tc USING (id)
        |ORDER BY d.id""".stripMargin,

    // Synchronous LPA replay, 4 chained (count, pick) rounds — all
    // INTEGER arithmetic, so no float parity rules apply. Per round:
    // count neighbor labels per node, then pick (max count, min label)
    // via a row_number window — the same total-order tie rule Spark
    // implements as a struct-min. Fixture trace: round 1 gives every
    // non-min clique member its block minimum (all neighbor labels
    // distinct, min wins) while node 8k briefly adopts its bridge
    // neighbor 8k-1; round 2 the clique majority (count 6-7 vs 1)
    // overwhelms every bridge label and all 25 blocks sit at label 8k,
    // a state that reproduces itself — so the fixed 4-round replay is
    // stable and engine-portable.
    "graph_communities" ->
      """WITH ids AS (
        |  SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT x.id AS a, y.id AS b FROM ids x JOIN ids y
        |    ON x.id // 8 = y.id // 8 AND x.id < y.id
        |  UNION ALL
        |  SELECT id, id + 1 FROM ids WHERE id % 8 = 7 AND id < 199),
        |e AS (SELECT DISTINCT s, d FROM (
        |        SELECT a AS s, b AS d FROM p UNION ALL SELECT b, a FROM p)),
        |l0 AS (SELECT DISTINCT s AS id, s AS label FROM e),
        |c1 AS (SELECT e.s AS id, n.label AS nl, count(*) AS c
        |       FROM e JOIN l0 n ON n.id = e.d GROUP BY e.s, n.label),
        |l1 AS (SELECT id, nl AS label FROM (
        |         SELECT id, nl,
        |                row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
        |         FROM c1) WHERE rn = 1),
        |c2 AS (SELECT e.s AS id, n.label AS nl, count(*) AS c
        |       FROM e JOIN l1 n ON n.id = e.d GROUP BY e.s, n.label),
        |l2 AS (SELECT id, nl AS label FROM (
        |         SELECT id, nl,
        |                row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
        |         FROM c2) WHERE rn = 1),
        |c3 AS (SELECT e.s AS id, n.label AS nl, count(*) AS c
        |       FROM e JOIN l2 n ON n.id = e.d GROUP BY e.s, n.label),
        |l3 AS (SELECT id, nl AS label FROM (
        |         SELECT id, nl,
        |                row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
        |         FROM c3) WHERE rn = 1),
        |c4 AS (SELECT e.s AS id, n.label AS nl, count(*) AS c
        |       FROM e JOIN l3 n ON n.id = e.d GROUP BY e.s, n.label),
        |l4 AS (SELECT id, nl AS label FROM (
        |         SELECT id, nl,
        |                row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
        |         FROM c4) WHERE rn = 1)
        |SELECT id, label FROM l4 ORDER BY id""".stripMargin,

    // Watched-LPA replay: the graph_communities recursion unrolled to
    // the full 8-round cap (lpaRounds) — valid at any knobs because
    // the watch stops only at an exact fixed point or an even-
    // remainder 2-cycle revisit, where the remaining rounds change
    // nothing (Graph.labelPropagationWatched scaladoc).
    // LPA (the graph_communities 4-round replay via lpaRounds) + the
    // modularity aggregates: per community, directed edge-ends and
    // internal ends, Q = internal/rows − (ends/rows)².
    "graph_modularity" ->
      ("""WITH ids AS (
        |  SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT x.id AS a, y.id AS b FROM ids x JOIN ids y
        |    ON x.id // 8 = y.id // 8 AND x.id < y.id
        |  UNION ALL
        |  SELECT id, id + 1 FROM ids WHERE id % 8 = 7 AND id < 199),
        |e AS (SELECT DISTINCT s, d FROM (
        |        SELECT a AS s, b AS d FROM p UNION ALL SELECT b, a FROM p)),
        |l0 AS (SELECT DISTINCT s AS id, s AS label FROM e),
        |""".stripMargin + lpaRounds(4) + """,
        |st AS (SELECT ls.label AS c_s, ld.label AS c_d
        |       FROM e JOIN l4 ls ON e.s = ls.id JOIN l4 ld ON e.d = ld.id),
        |per AS (SELECT c_s AS label, count(*) AS ends,
        |               sum(CASE WHEN c_s = c_d THEN 1 ELSE 0 END)::BIGINT
        |                 AS internal_ends
        |        FROM st GROUP BY c_s),
        |tot AS (SELECT sum(ends) AS rows2m FROM per)
        |SELECT label, internal_ends, ends,
        |       round(internal_ends / rows2m
        |             - (ends / rows2m) * (ends / rows2m), 6) AS q
        |FROM per, tot ORDER BY label""".stripMargin),

    "graph_communities_watched" ->
      ("""WITH ids AS (
        |  SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT x.id AS a, y.id AS b FROM ids x JOIN ids y
        |    ON x.id // 8 = y.id // 8 AND x.id < y.id
        |  UNION ALL
        |  SELECT id, id + 1 FROM ids WHERE id % 8 = 7 AND id < 199),
        |e AS (SELECT DISTINCT s, d FROM (
        |        SELECT a AS s, b AS d FROM p UNION ALL SELECT b, a FROM p)),
        |l0 AS (SELECT DISTINCT s AS id, s AS label FROM e),
        |""".stripMargin + lpaRounds(8) +
       "\nSELECT id, label FROM l8 ORDER BY id"),

    // Weighted-PageRank replay: the graph_pagerank recursion with
    // sum(w)-normalized weighted contributions (floor-grid of
    // rank * w / outw per term). The weighted fixture is symmetric, so
    // every node receives mass every round and the GROUP BY dst covers
    // all nodes — the same property the kNN replay relies on.
    "graph_pagerank_weighted" ->
      """WITH RECURSIVE
        |ids AS (SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT x.id AS a, y.id AS b,
        |         (1 + (x.id + y.id) % 3) * 0.25::DOUBLE AS w
        |  FROM ids x JOIN ids y
        |    ON x.id // 8 = y.id // 8 AND x.id < y.id
        |  UNION ALL
        |  SELECT id, id + 1, 2.5::DOUBLE FROM ids WHERE id % 8 = 7 AND id < 199),
        |edges AS (SELECT src, dst, max(w) AS w FROM (
        |            SELECT a AS src, b AS dst, w FROM p
        |            UNION ALL SELECT b, a, w FROM p) GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |pr(iter, id, rank) AS (
        |  SELECT 0, id, floor((1.0::DOUBLE / (SELECT count(*) FROM nodes))
        |                 * 1073741824.0) / 1073741824.0
        |  FROM nodes
        |  UNION ALL
        |  SELECT p.iter + 1, e2.dst,
        |         floor(((1.0::DOUBLE - 0.85) / (SELECT count(*) FROM nodes)
        |               + 0.85 * (sum(floor(p.rank * e2.w / d.outw * 281474976710656.0) / 281474976710656.0) + 0.0))
        |               * 1073741824.0) / 1073741824.0
        |  FROM pr p
        |  JOIN edges e2 ON e2.src = p.id
        |  JOIN ow d ON d.src = p.id
        |  WHERE p.iter < 5
        |  GROUP BY p.iter, e2.dst
        |)
        |SELECT id, rank FROM pr WHERE iter = 5
        |ORDER BY id""".stripMargin,

    // Weighted LPA replay: sum(w) votes instead of count(*), same
    // row_number (wv DESC, nl) pick. The fixture's dyadic weights make
    // every sum exact, so no quantization CTE is needed — engine
    // parity is by construction.
    "graph_communities_weighted" ->
      ("""WITH ids AS (
        |  SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT x.id AS a, y.id AS b,
        |         (1 + (x.id + y.id) % 3) * 0.25::DOUBLE AS w
        |  FROM ids x JOIN ids y
        |    ON x.id // 8 = y.id // 8 AND x.id < y.id
        |  UNION ALL
        |  SELECT id, id + 1, 2.5::DOUBLE FROM ids WHERE id % 8 = 7 AND id < 199),
        |e AS (SELECT s, d, max(w) AS w FROM (
        |        SELECT a AS s, b AS d, w FROM p
        |        UNION ALL SELECT b, a, w FROM p) GROUP BY 1, 2),
        |l0 AS (SELECT DISTINCT s AS id, s AS label FROM e),
        |""".stripMargin + lpaWeightedRounds(4) +
      "\nSELECT id, label FROM l4 ORDER BY id"),

    // Watched weighted LPA: the graph_communities_watched replay
    // stance over the weighted fixture — the stop rules make the
    // watched run equal the full 8-round unroll at any firing round.
    "graph_communities_weighted_watched" ->
      ("""WITH ids AS (
        |  SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT x.id AS a, y.id AS b,
        |         (1 + (x.id + y.id) % 3) * 0.25::DOUBLE AS w
        |  FROM ids x JOIN ids y
        |    ON x.id // 8 = y.id // 8 AND x.id < y.id
        |  UNION ALL
        |  SELECT id, id + 1, 2.5::DOUBLE FROM ids WHERE id % 8 = 7 AND id < 199),
        |e AS (SELECT s, d, max(w) AS w FROM (
        |        SELECT a AS s, b AS d, w FROM p
        |        UNION ALL SELECT b, a, w FROM p) GROUP BY 1, 2),
        |l0 AS (SELECT DISTINCT s AS id, s AS label FROM e),
        |""".stripMargin + lpaWeightedRounds(8) +
       "\nSELECT id, label FROM l8 ORDER BY id"),

    // Watched weighted PageRank: the graph_pagerank_weighted recursion
    // run to the watched tier's 10-round cap — early-stop == full run
    // by the tol=0 / period-2 stop rules.
    "graph_pagerank_weighted_watched" ->
      """WITH RECURSIVE
        |ids AS (SELECT doc_id AS id FROM documents ORDER BY doc_id LIMIT 200),
        |p AS (
        |  SELECT x.id AS a, y.id AS b,
        |         (1 + (x.id + y.id) % 3) * 0.25::DOUBLE AS w
        |  FROM ids x JOIN ids y
        |    ON x.id // 8 = y.id // 8 AND x.id < y.id
        |  UNION ALL
        |  SELECT id, id + 1, 2.5::DOUBLE FROM ids WHERE id % 8 = 7 AND id < 199),
        |edges AS (SELECT src, dst, max(w) AS w FROM (
        |            SELECT a AS src, b AS dst, w FROM p
        |            UNION ALL SELECT b, a, w FROM p) GROUP BY 1, 2),
        |ow AS (SELECT src, sum(w) AS outw FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |pr(iter, id, rank) AS (
        |  SELECT 0, id, floor((1.0::DOUBLE / (SELECT count(*) FROM nodes))
        |                 * 1073741824.0) / 1073741824.0
        |  FROM nodes
        |  UNION ALL
        |  SELECT p.iter + 1, e2.dst,
        |         floor(((1.0::DOUBLE - 0.85) / (SELECT count(*) FROM nodes)
        |               + 0.85 * (sum(floor(p.rank * e2.w / d.outw * 281474976710656.0) / 281474976710656.0) + 0.0))
        |               * 1073741824.0) / 1073741824.0
        |  FROM pr p
        |  JOIN edges e2 ON e2.src = p.id
        |  JOIN ow d ON d.src = p.id
        |  WHERE p.iter < 10
        |  GROUP BY p.iter, e2.dst
        |)
        |SELECT id, rank FROM pr WHERE iter = 10
        |ORDER BY id""".stripMargin,

    // Label spreading replayed recursively: sparse (id, label, score)
    // state; the FULL OUTER join re-injects the clamped seed term each
    // round (seed weight spelled (1.0 - 0.85) COMPUTED); per-round
    // 2^-30 binary-grid floor with 2^-48-floored summation terms (the
    // graph_pagerank stance); final per-node argmax.
    "graph_label_spread" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS id, b.vec_id AS nb,
        |         round(list_inner_product(a.v, b.v) /
        |               (sqrt(list_inner_product(a.v, a.v)) *
        |                sqrt(list_inner_product(b.v, b.v))), 6) AS score
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |r AS (SELECT id, nb FROM (
        |        SELECT id, nb,
        |               row_number() OVER (PARTITION BY id ORDER BY score DESC, nb) AS rnk
        |        FROM p) WHERE rnk <= 3),
        |edges AS (SELECT DISTINCT src, dst FROM (
        |            SELECT id AS src, nb AS dst FROM r
        |            UNION ALL SELECT nb, id FROM r)),
        |deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY 1),
        |seeds AS (SELECT vec_id AS id, label FROM embeddings WHERE vec_id % 5 = 0),
        |st(iter, id, label, score) AS (
        |  SELECT 0, id, label, 1.0::DOUBLE FROM seeds
        |  UNION ALL
        |  SELECT coalesce(c.iter, (SELECT min(iter) FROM st)) + 1,
        |         coalesce(c.id, s.id), coalesce(c.label, s.label),
        |         floor((0.85 * coalesce(c.contrib, 0.0) + coalesce(s.sw, 0.0))
        |               * 1073741824.0) / 1073741824.0
        |  FROM (SELECT p2.iter, e2.dst AS id, p2.label,
        |               sum(floor(p2.score / d.outdeg * 281474976710656.0) / 281474976710656.0) AS contrib
        |        FROM st p2 JOIN edges e2 ON e2.src = p2.id JOIN deg d ON d.src = p2.id
        |        WHERE p2.iter < 4
        |        GROUP BY p2.iter, e2.dst, p2.label) c
        |  FULL OUTER JOIN (SELECT id, label, (1.0::DOUBLE - 0.85) AS sw FROM seeds
        |                   WHERE (SELECT min(iter) FROM st) < 4) s
        |    ON s.id = c.id AND s.label = c.label
        |)
        |SELECT id, label, score FROM (
        |  SELECT id, label, score,
        |         row_number() OVER (PARTITION BY id ORDER BY score DESC, label) AS rn
        |  FROM st WHERE iter = 4)
        |WHERE rn = 1
        |ORDER BY id""".stripMargin,

    // Deterministic Lloyd k-means replayed as a recursive CTE: the same
    // init (4 lowest-id vectors), the same `v.v - 2(v.c) + c.c` rounded
    // distance with (dist, cluster) struct-min tie-breaks, the same
    // 6-decimal centroid re-quantization per round. An empty cluster
    // simply produces no centroid row — both engines drop it.
    "cluster_kmeans" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |init AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cluster, v
        |         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
        |cent(iter, cluster, c) AS (
        |  SELECT 0, cluster, v FROM init
        |  UNION ALL
        |  SELECT iter + 1, cluster, list(cm ORDER BY pos)
        |  FROM (
        |    SELECT a.iter, a.cluster, p.pos, round(avg(a.v[p.pos]), 6) AS cm
        |    FROM (
        |      SELECT c.iter, e.vec_id, e.v,
        |             min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                    - 2 * list_inner_product(e.v, c.c)
        |                    + list_inner_product(c.c, c.c), 6),
        |                 cl := c.cluster)).cl AS cluster
        |      FROM cent c, e
        |      WHERE c.iter < 3
        |      GROUP BY c.iter, e.vec_id, e.v
        |    ) a, (SELECT unnest(generate_series(1, 64)) AS pos) p
        |    GROUP BY a.iter, a.cluster, p.pos
        |  )
        |  GROUP BY iter, cluster
        |),
        |fin AS (SELECT cluster, c FROM cent WHERE iter = 3)
        |SELECT vec_id AS id, m.cl AS cluster, m.d AS dist
        |FROM (
        |  SELECT e.vec_id,
        |         min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                - 2 * list_inner_product(e.v, fin.c)
        |                + list_inner_product(fin.c, fin.c), 6),
        |             cl := fin.cluster)) AS m
        |  FROM e, fin
        |  GROUP BY e.vec_id)
        |ORDER BY id""".stripMargin,

    // Cold 4-round replay of the warm fixture (see the queries-side
    // comment: warm(A3, 0) == cold(4) because centroids-from-assignment
    // is the Lloyd update).
    "cluster_kmeans_warm" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |init AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cluster, v
        |         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
        |cent(iter, cluster, c) AS (
        |  SELECT 0, cluster, v FROM init
        |  UNION ALL
        |  SELECT iter + 1, cluster, list(cm ORDER BY pos)
        |  FROM (
        |    SELECT a.iter, a.cluster, p.pos, round(avg(a.v[p.pos]), 6) AS cm
        |    FROM (
        |      SELECT c.iter, e.vec_id, e.v,
        |             min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                    - 2 * list_inner_product(e.v, c.c)
        |                    + list_inner_product(c.c, c.c), 6),
        |                 cl := c.cluster)).cl AS cluster
        |      FROM cent c, e
        |      WHERE c.iter < 4
        |      GROUP BY c.iter, e.vec_id, e.v
        |    ) a, (SELECT unnest(generate_series(1, 64)) AS pos) p
        |    GROUP BY a.iter, a.cluster, p.pos
        |  )
        |  GROUP BY iter, cluster
        |),
        |fin AS (SELECT cluster, c FROM cent WHERE iter = 4)
        |SELECT vec_id AS id, m.cl AS cluster, m.d AS dist
        |FROM (
        |  SELECT e.vec_id,
        |         min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                - 2 * list_inner_product(e.v, fin.c)
        |                + list_inner_product(fin.c, fin.c), 6),
        |             cl := fin.cluster)) AS m
        |  FROM e, fin
        |  GROUP BY e.vec_id)
        |ORDER BY id""".stripMargin,

    // Fixed 25-round replay of the watched run (see the queries-side
    // comment: tol=0 stops only where the remaining rounds change
    // nothing, so watched(<=25) == cold(25) at any data).
    "cluster_kmeans_watched" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |init AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cluster, v
        |         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
        |cent(iter, cluster, c) AS (
        |  SELECT 0, cluster, v FROM init
        |  UNION ALL
        |  SELECT iter + 1, cluster, list(cm ORDER BY pos)
        |  FROM (
        |    SELECT a.iter, a.cluster, p.pos, round(avg(a.v[p.pos]), 6) AS cm
        |    FROM (
        |      SELECT c.iter, e.vec_id, e.v,
        |             min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                    - 2 * list_inner_product(e.v, c.c)
        |                    + list_inner_product(c.c, c.c), 6),
        |                 cl := c.cluster)).cl AS cluster
        |      FROM cent c, e
        |      WHERE c.iter < 25
        |      GROUP BY c.iter, e.vec_id, e.v
        |    ) a, (SELECT unnest(generate_series(1, 64)) AS pos) p
        |    GROUP BY a.iter, a.cluster, p.pos
        |  )
        |  GROUP BY iter, cluster
        |),
        |fin AS (SELECT cluster, c FROM cent WHERE iter = 25)
        |SELECT vec_id AS id, m.cl AS cluster, m.d AS dist
        |FROM (
        |  SELECT e.vec_id,
        |         min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                - 2 * list_inner_product(e.v, fin.c)
        |                + list_inner_product(fin.c, fin.c), 6),
        |             cl := fin.cluster)) AS m
        |  FROM e, fin
        |  GROUP BY e.vec_id)
        |ORDER BY id""".stripMargin,

    // Cluster-balanced sampling replayed: the full k-means recursion,
    // then the md5-hex-key row_number draw per cluster (the
    // sample_stratified oracle shape).
    "sample_cluster_balanced" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |init AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cluster, v
        |         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 4)),
        |cent(iter, cluster, c) AS (
        |  SELECT 0, cluster, v FROM init
        |  UNION ALL
        |  SELECT iter + 1, cluster, list(cm ORDER BY pos)
        |  FROM (
        |    SELECT a.iter, a.cluster, p.pos, round(avg(a.v[p.pos]), 6) AS cm
        |    FROM (
        |      SELECT c.iter, e.vec_id, e.v,
        |             min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                    - 2 * list_inner_product(e.v, c.c)
        |                    + list_inner_product(c.c, c.c), 6),
        |                 cl := c.cluster)).cl AS cluster
        |      FROM cent c, e
        |      WHERE c.iter < 3
        |      GROUP BY c.iter, e.vec_id, e.v
        |    ) a, (SELECT unnest(generate_series(1, 64)) AS pos) p
        |    GROUP BY a.iter, a.cluster, p.pos
        |  )
        |  GROUP BY iter, cluster
        |),
        |fin AS (SELECT cluster, c FROM cent WHERE iter = 3),
        |asg AS (
        |  SELECT vec_id AS id, m.cl AS cluster
        |  FROM (
        |    SELECT e.vec_id,
        |           min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                  - 2 * list_inner_product(e.v, fin.c)
        |                  + list_inner_product(fin.c, fin.c), 6),
        |               cl := fin.cluster)) AS m
        |    FROM e, fin
        |    GROUP BY e.vec_id))
        |SELECT id, cluster FROM (
        |  SELECT id, cluster,
        |         row_number() OVER (
        |           PARTITION BY cluster
        |           ORDER BY substr(md5('r10:' || CAST(id AS VARCHAR)), 1, 8),
        |                    id) AS rn
        |  FROM asg)
        |WHERE rn <= 30
        |ORDER BY id""".stripMargin,

    // Distributed PCA replayed in SQL: same rounded mean/scatter, the
    // same NORMALIZED 40-round power iteration as a recursive CTE with
    // the same per-round round-to-9-decimals on the normalized vector
    // (matching Pca.powerIterate), end sign-pin + round, deflation
    // re-rounded, then the projection.
    "embedding_pca" ->
      """WITH RECURSIVE
        |pos AS MATERIALIZED (SELECT unnest(generate_series(1, 64)) AS pos),
        |ev AS MATERIALIZED (
        |  SELECT vec_id, p.pos, embedding[p.pos]::DOUBLE AS val
        |  FROM embeddings, pos p),
        |mu AS MATERIALIZED (SELECT pos, round(avg(val), 6) AS m FROM ev GROUP BY 1),
        |cv AS MATERIALIZED (
        |  SELECT ev.vec_id, ev.pos, ev.val - mu.m AS val
        |  FROM ev JOIN mu USING (pos)),
        |g AS MATERIALIZED (
        |  SELECT a.pos AS i, b.pos AS j, round(sum(a.val * b.val), 6) AS gv
        |  FROM cv a JOIN cv b USING (vec_id)
        |  GROUP BY 1, 2),
        |pw1(iter, i, w) AS (
        |  SELECT 0, p.pos, (CASE WHEN p.pos = 1 THEN 1.0 ELSE 0.0 END)::DOUBLE FROM pos p
        |  UNION ALL
        |  SELECT t.iter + 1, t.i,
        |         round(t.gw / sqrt(sum(t.gw * t.gw) OVER (PARTITION BY t.iter)), 9)
        |  FROM (SELECT p.iter, g.i, sum(g.gv * p.w) AS gw
        |        FROM pw1 p JOIN g ON g.j = p.i
        |        WHERE p.iter < 40
        |        GROUP BY p.iter, g.i) t),
        |raw1 AS MATERIALIZED (SELECT i, w FROM pw1 WHERE iter = 40),
        |n1 AS (SELECT sqrt(sum(w*w)) AS n,
        |              min(CASE WHEN abs(w) > 1e-12 THEN i END) AS fi FROM raw1),
        |s1 AS (SELECT CASE WHEN (SELECT r.w FROM raw1 r, n1 WHERE r.i = n1.fi) < 0
        |              THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END AS sgn),
        |e1 AS MATERIALIZED (SELECT raw1.i, round(s1.sgn * raw1.w / n1.n, 6) AS w
        |                    FROM raw1, n1, s1),
        |lam1 AS (SELECT round(sum(a.w * g.gv * b.w), 6) AS l
        |         FROM g JOIN e1 a ON a.i = g.i JOIN e1 b ON b.i = g.j),
        |g2 AS MATERIALIZED (
        |  SELECT g.i, g.j, round(g.gv - lam1.l * a.w * b.w, 6) AS gv
        |  FROM g, lam1, e1 a, e1 b WHERE a.i = g.i AND b.i = g.j),
        |pw2(iter, i, w) AS (
        |  SELECT 0, p.pos, (CASE WHEN p.pos = 1 THEN 1.0 ELSE 0.0 END)::DOUBLE FROM pos p
        |  UNION ALL
        |  SELECT t.iter + 1, t.i,
        |         round(t.gw / sqrt(sum(t.gw * t.gw) OVER (PARTITION BY t.iter)), 9)
        |  FROM (SELECT p.iter, g2.i, sum(g2.gv * p.w) AS gw
        |        FROM pw2 p JOIN g2 ON g2.j = p.i
        |        WHERE p.iter < 40
        |        GROUP BY p.iter, g2.i) t),
        |raw2 AS MATERIALIZED (SELECT i, w FROM pw2 WHERE iter = 40),
        |dp2 AS (SELECT sum(r.w * e1.w) AS dp FROM raw2 r JOIN e1 ON e1.i = r.i),
        |o2 AS MATERIALIZED (SELECT r.i, r.w - dp2.dp * e1.w AS w
        |                    FROM raw2 r JOIN e1 ON e1.i = r.i, dp2),
        |n2 AS (SELECT sqrt(sum(w*w)) AS n,
        |              min(CASE WHEN abs(w) > 1e-12 THEN i END) AS fi FROM o2),
        |s2 AS (SELECT CASE WHEN (SELECT o.w FROM o2 o, n2 WHERE o.i = n2.fi) < 0
        |              THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END AS sgn),
        |e2 AS MATERIALIZED (SELECT o2.i, round(s2.sgn * o2.w / n2.n, 6) AS w
        |                    FROM o2, n2, s2)
        |SELECT cv.vec_id AS id,
        |       round(sum(cv.val * e1.w), 6) AS pc1,
        |       round(sum(cv.val * e2.w), 6) AS pc2
        |FROM cv JOIN e1 ON e1.i = cv.pos JOIN e2 ON e2.i = cv.pos
        |GROUP BY cv.vec_id
        |ORDER BY id""".stripMargin,

    "text_metrics" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 0) AS words0,
        |         greatest(length(text), 1)::DOUBLE AS len
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)) AS n_words,
        |         CAST(coalesce(list_sum(list_transform(words0,
        |             w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0)
        |           + length(regexp_replace(lower(text), '[a-z0-9\s]', '', 'g')) AS BIGINT) AS n_tokens_est,
        |         (length(lower(text)) - length(regexp_replace(lower(text), '[a-z]', '', 'g'))) / len AS alpha,
        |         (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / len AS digits,
        |         (length(text) - length(regexp_replace(text, '[\s]', '', 'g'))) / len AS spaces,
        |         greatest(len(toks), 1)::DOUBLE AS ntok,
        |         len(list_filter(toks, t -> t IN %STOP%))::DOUBLE AS stophits,
        |         coalesce(list_sum(list_transform(toks, t -> length(t))), 0)::DOUBLE AS toklen
        |  FROM base)
        |SELECT doc_id, n_words, n_tokens_est,
        |       round(least(1.0,
        |         alpha * 0.4 + (1.0 - digits) * 0.1 + (stophits / ntok) * 0.2 +
        |         (CASE WHEN toklen / ntok >= 3 AND toklen / ntok <= 10 THEN 1.0 ELSE 0.5 END) * 0.15 +
        |         (CASE WHEN spaces >= 0.05 AND spaces <= 0.4 THEN 1.0 ELSE 0.5 END) * 0.15), 6) AS quality
        |FROM m
        |ORDER BY doc_id
        |LIMIT 200""".stripMargin.replace("%STOP%", stopList),

    "text_lang_fp" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |         len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','auf','von'))) AS h_de,
        |         len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','was','for','on','with'))) AS h_en,
        |         len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','los','del','las','un'))) AS h_es,
        |         len(list_filter(toks, t -> t IN ('le','la','les','et','est','des','un','une','du','dans'))) AS h_fr,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM base)
        |SELECT doc_id,
        |       CASE WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
        |            WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
        |            WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
        |            WHEN greatest(h_de, h_en, h_es, h_fr) > 0 AND h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
        |            ELSE 'und' END AS lang_pred,
        |       fp
        |FROM h
        |ORDER BY doc_id
        |LIMIT 200""".stripMargin,

    // The same normalization pipeline in DuckDB: nfc_normalize + the
    // identical RE2/Java-compatible replaces in the same order. The
    // suffix (decomposed accent / BEL / tabs / blank-line spam) is
    // rebuilt from chr() calls so the oracle JSON stays control-free.
    "text_normalize" ->
      """SELECT doc_id,
        |       trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         nfc_normalize(text || chr(10) || chr(10) || chr(10) ||
        |                       '  cafe' || chr(769) || '  x' || chr(7) || 'y' ||
        |                       chr(9) || 'z  '),
        |         '[\x00-\x08\x0B-\x1F\x7F]', '', 'g'),
        |         '[ \t]+', ' ', 'g'),
        |         '[ ]*\n[ ]*', chr(10), 'g'),
        |         '\n{3,}', chr(10) || chr(10), 'g')) AS text_norm
        |FROM documents
        |ORDER BY doc_id
        |LIMIT 200""".stripMargin,

    // The extraction chain in SQL is generated from HtmlFunctions'
    // stage lists (same patterns, same order, same replacements — chr()
    // for the newline so the oracle JSON stays control-free).
    "text_html_extract" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><head><title> Doc ' || doc_id || ' &amp; notes </title><style>p { color: red }</style></head>' ||
         |    '<body><!-- nav bar --><h1>Doc ' || doc_id || '</h1><p>' || text ||
         |    '</p><script>var x = 1 < 2;</script>' ||
         |    '<a href="https://example.com/a?b=1">A</a> &lt;end&gt;</body></html>' AS html
         |  FROM documents)
         |SELECT doc_id,
         |       ${graft.functions.HtmlFunctions.htmlTitleSql("html")} AS title,
         |       ${graft.functions.HtmlFunctions.htmlToTextSql("html")} AS body_text,
         |       array_to_string(regexp_extract_all(html, '(?i)href\\s*=\\s*"([^"]*)"', 1), '|') AS links
         |FROM h
         |ORDER BY doc_id
         |LIMIT 200""".stripMargin,

    // The same URL pipeline in SQL: identical RE2/Java-compatible part
    // regexes, list_filter/list_sort for the query params, negative
    // label indexing for the registered domain.
    "url_canonical" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/Path/' || doc_id || '/?utm_source=feed&b=2&a=1#sec'
         |         WHEN doc_id % 3 = 1 THEN 'http://' || source || '.co.uk:8080/path?z=9&y=8'
         |         ELSE 'https://sub.' || source || '.example.com/a/b/' END AS url
         |  FROM documents),
         |parts AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         |    regexp_replace(regexp_replace(
         |      lower(regexp_extract(trim(url), '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
         |      ':(80|443)$$', ''), '^www\\.', '') AS host,
         |    regexp_replace(regexp_extract(trim(url),
         |      '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$$', '') AS path,
         |    array_to_string(list_sort(list_filter(
         |      string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
         |      p -> length(p) > 0 AND NOT regexp_matches(p,
         |        '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)='))), '&') AS q
         |  FROM u),
         |canon AS (
         |  SELECT doc_id,
         |    CASE WHEN length(scheme) = 0 THEN ''
         |         ELSE scheme || '://' || host || path ||
         |              CASE WHEN length(q) > 0 THEN '?' || q ELSE '' END END AS url_canon,
         |    string_split(regexp_replace(host, ':[0-9]+$$', ''), '.') AS labels
         |  FROM parts)
         |SELECT doc_id, url_canon,
         |  CASE WHEN len(labels) <= 1 THEN array_to_string(labels, '.')
         |       WHEN len(labels) >= 3 AND (labels[-2] || '.' || labels[-1]) IN %SUFFIX%
         |         THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
         |       ELSE labels[-2] || '.' || labels[-1] END AS domain
         |FROM canon
         |ORDER BY doc_id
         |LIMIT 300""".stripMargin
        .replace("%SUFFIX%", sqlList(graft.functions.UrlFunctions.TwoLevelSuffixes)),

    // Ratios are rounded to 6 decimals BEFORE threshold comparison in
    // both engines (CorpusClean.gopherFlags does the same), so boolean
    // rule outcomes cannot diverge on FP boundaries.
    "quality_gopher" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS ws,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |         CAST(len(ws) AS BIGINT) AS n_words,
        |         round(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS mean_word_len,
        |         round(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS alpha_word_ratio,
        |         round(((length(text) - length(regexp_replace(text, '[#]', '', 'g')))
        |                + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT))::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS symbol_ratio,
        |         CAST(len(list_filter(toks, t -> t IN %STOP%)) AS BIGINT) AS stop_hits
        |  FROM base)
        |SELECT doc_id, n_words, mean_word_len, alpha_word_ratio, symbol_ratio, stop_hits,
        |       (n_words >= 50 AND n_words <= 100000) AS pass_word_count,
        |       (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_word_len,
        |       (alpha_word_ratio >= 0.8) AS pass_alpha,
        |       (symbol_ratio <= 0.1) AS pass_symbol,
        |       (stop_hits >= 2) AS pass_stops,
        |       (n_words >= 50 AND n_words <= 100000
        |        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |        AND alpha_word_ratio >= 0.8 AND symbol_ratio <= 0.1
        |        AND stop_hits >= 2) AS passes
        |FROM m
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin.replace("%STOP%", stopList),

    // The per-source scorecard replayed two-level: same Gopher
    // expressions as quality_gopher, fingerprint = the dedup_exact md5,
    // (source, fp) grain first, then the source rollup with distinct
    // texts as count(*) — mirroring the Spark plan's Expand-free shape.
    // Sums of BIGINT cast back from DuckDB's HUGEINT.
    "corpus_source_scorecard" ->
      """WITH base AS (
        |  SELECT source, n_chars, text,
        |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
        |         list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0) AS ws,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT source, n_chars, fp,
        |         CAST(len(ws) AS BIGINT) AS n_words,
        |         round(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS mean_word_len,
        |         round(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS alpha_word_ratio,
        |         round(((length(text) - length(regexp_replace(text, '[#]', '', 'g')))
        |                + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT))::DOUBLE
        |               / greatest(len(ws), 1)::DOUBLE, 6) AS symbol_ratio,
        |         CAST(len(list_filter(toks, t -> t IN %STOP%)) AS BIGINT) AS stop_hits
        |  FROM base),
        |d AS (
        |  SELECT source, fp, n_chars, n_words,
        |         CASE WHEN n_words >= 50 AND n_words <= 100000
        |               AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        |               AND alpha_word_ratio >= 0.8 AND symbol_ratio <= 0.1
        |               AND stop_hits >= 2 THEN 1 ELSE 0 END AS pass
        |  FROM m),
        |pf AS (
        |  SELECT source, fp, count(*) AS copies, sum(n_chars) AS chars,
        |         sum(n_words) AS words, sum(pass) AS passed
        |  FROM d GROUP BY 1, 2)
        |SELECT source,
        |       CAST(sum(copies) AS BIGINT) AS docs,
        |       CAST(sum(chars) AS BIGINT) AS total_chars,
        |       round(sum(words)::DOUBLE / sum(copies), 6) AS mean_words,
        |       count(*) AS distinct_texts,
        |       CAST(sum(copies) - count(*) AS BIGINT) AS dup_docs,
        |       round((sum(copies) - count(*))::DOUBLE / sum(copies), 6) AS dup_rate,
        |       round(sum(passed)::DOUBLE / sum(copies), 6) AS gopher_pass_rate
        |FROM pf
        |GROUP BY 1
        |ORDER BY source""".stripMargin.replace("%STOP%", stopList),

    // Train on even ids, score odd ids; COALESCE arms replay
    // lmScoreWith's backoff exactly (model-miss then context-miss).
    "quality_lm_apply" ->
      """WITH nt AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |dg AS (
        |  SELECT doc_id, bg, count(*) AS n FROM (
        |    SELECT doc_id,
        |           unnest(list_transform(generate_series(1, greatest(length(t) - 1, 0)),
        |                                 i -> substr(t, i, 2))) AS bg
        |    FROM nt) GROUP BY 1, 2),
        |tr AS (SELECT bg, sum(n) AS cnt FROM dg WHERE doc_id % 2 = 0 GROUP BY 1),
        |cc AS (SELECT substr(bg, 1, 1) AS c0, sum(cnt) AS ctx FROM tr GROUP BY 1),
        |lp AS (
        |  SELECT bg, ln((cnt + 1.0) / (ctx + 37.0)) AS lp
        |  FROM tr JOIN cc ON substr(tr.bg, 1, 1) = cc.c0)
        |SELECT d.doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |       round(sum(n * COALESCE(lp.lp,
        |               ln(1.0 / (COALESCE(cc2.ctx, 0) + 37.0)))) / sum(n), 6) AS avg_logp
        |FROM dg d
        |LEFT JOIN lp USING (bg)
        |LEFT JOIN cc cc2 ON substr(d.bg, 1, 1) = cc2.c0
        |WHERE d.doc_id % 2 = 1
        |GROUP BY 1
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // Multinomial NB, Laplace-smoothed over V+1 slots; a (term, class)
    // pair with no count row smooths to the same value as the unseen
    // slot, so the LEFT JOIN's null arm is exactly log_zero.
    "quality_nb" ->
      """WITH tt AS (
        |  SELECT lang AS cls,
        |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 1)) AS term
        |  FROM documents WHERE doc_id % 2 = 0),
        |nct AS (SELECT cls, term, count(*) AS n FROM tt GROUP BY 1, 2),
        |v AS (SELECT count(DISTINCT term) AS v FROM nct),
        |nc AS (SELECT cls, sum(n) AS n_tot FROM nct GROUP BY 1),
        |tlp AS (
        |  SELECT cls, term, ln((n + 1.0) / (n_tot + 1.0 * (v + 1))) AS log_theta
        |  FROM nct JOIN nc USING (cls) CROSS JOIN v),
        |dc AS (SELECT lang AS cls, count(*) AS n_docs
        |       FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |tot AS (SELECT sum(n_docs) AS total FROM dc),
        |cs AS (
        |  SELECT cls, ln(n_docs::DOUBLE / total) AS log_prior,
        |         ln(1.0 / (n_tot + 1.0 * (v + 1))) AS log_zero
        |  FROM dc CROSS JOIN tot JOIN nc USING (cls) CROSS JOIN v),
        |test AS (
        |  SELECT doc_id AS id,
        |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 1)) AS term
        |  FROM documents WHERE doc_id % 2 = 1),
        |dtf AS (SELECT id, term, count(*) AS tf FROM test GROUP BY 1, 2),
        |dtot AS (SELECT id, sum(tf) AS ttf FROM dtf GROUP BY 1),
        |m AS (SELECT id, cls, sum(tf * log_theta) AS s, sum(tf) AS mtf
        |      FROM dtf JOIN tlp USING (term) GROUP BY 1, 2),
        |sc AS (
        |  SELECT dtot.id, cs.cls,
        |         round(cs.log_prior + coalesce(m.s, 0) +
        |               (dtot.ttf - coalesce(m.mtf, 0)) * cs.log_zero, 6) AS score
        |  FROM dtot CROSS JOIN cs
        |  LEFT JOIN m ON m.id = dtot.id AND m.cls = cs.cls)
        |SELECT id AS doc_id, cls AS pred, score
        |FROM sc
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY score DESC, cls) = 1
        |ORDER BY doc_id""".stripMargin,

    // Ratios rounded to 6 before threshold booleans (house style); the
    // top-2-gram tie breaks (count desc, gram asc) in both engines.
    "quality_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS total_chars FROM documents),
        |lo AS (
        |  SELECT doc_id, trim(l) AS line
        |  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM documents)
        |  WHERE length(trim(l)) > 0),
        |lc AS (SELECT doc_id, line, count(*) AS c FROM lo GROUP BY 1, 2),
        |ls AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
        |         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
        |         CAST(sum(c * length(line)) AS BIGINT) AS line_chars,
        |         CAST(sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END) AS BIGINT) AS dup_line_chars
        |  FROM lc GROUP BY 1),
        |tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> length(t) > 1) AS toks
        |  FROM documents),
        |g2c AS (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
        |                                         i -> toks[i] || ' ' || toks[i+1])) AS g
        |    FROM tk) GROUP BY 1, 2),
        |t2 AS (
        |  SELECT doc_id, g AS top_2gram, c * length(g) AS top2_chars
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, g DESC) AS rn
        |        FROM g2c)
        |  WHERE rn = 1),
        |g5c AS (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
        |                                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                                              || ' ' || toks[i+3] || ' ' || toks[i+4])) AS g
        |    FROM tk) GROUP BY 1, 2),
        |d5 AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS BIGINT) AS dup5_chars
        |  FROM g5c GROUP BY 1),
        |m AS (
        |  SELECT b.doc_id,
        |         COALESCE(n_lines, 0) AS n_lines,
        |         round(COALESCE(dup_occ, 0)::DOUBLE / greatest(COALESCE(n_lines, 0), 1), 6) AS dup_line_frac,
        |         round(COALESCE(dup_line_chars, 0)::DOUBLE / greatest(COALESCE(line_chars, 0), 1), 6) AS dup_line_char_frac,
        |         COALESCE(top_2gram, '') AS top_2gram,
        |         round(least(COALESCE(top2_chars, 0)::DOUBLE / greatest(total_chars, 1), 1.0), 6) AS top_2gram_char_frac,
        |         round(least(COALESCE(dup5_chars, 0)::DOUBLE / greatest(total_chars, 1), 1.0), 6) AS dup_5gram_char_frac
        |  FROM base b
        |  LEFT JOIN ls USING (doc_id)
        |  LEFT JOIN t2 USING (doc_id)
        |  LEFT JOIN d5 USING (doc_id))
        |SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac, top_2gram,
        |       top_2gram_char_frac, dup_5gram_char_frac,
        |       (dup_line_frac <= 0.30) AS pass_dup_line,
        |       (dup_line_char_frac <= 0.20) AS pass_dup_line_char,
        |       (top_2gram_char_frac <= 0.20) AS pass_top_2gram,
        |       (dup_5gram_char_frac <= 0.15) AS pass_dup_5gram,
        |       (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
        |        AND top_2gram_char_frac <= 0.20 AND dup_5gram_char_frac <= 0.15) AS passes
        |FROM m
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // C4 line rules over the linified corpus; every rule is a
    // substring/regex test, so flags and the rebuilt text_clean are
    // byte-exactly reproducible.
    "quality_c4" ->
      s"""WITH $linifiedCtes,
         |fl AS (
         |  SELECT doc_id, lines,
         |         list_filter(lines, l -> regexp_matches(trim(l), '[.!?"]$$')
         |           AND len(list_filter(string_split_regex(l, '\\s+'), w -> length(w) > 0)) >= 5
         |           AND NOT contains(lower(l), 'dup')) AS kept,
         |         array_to_string(lines, chr(10)) AS text2
         |  FROM lnf)
         |SELECT doc_id,
         |       CAST(len(lines) AS BIGINT) AS n_lines,
         |       CAST(len(kept) AS BIGINT) AS n_kept_lines,
         |       coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
         |       contains(lower(text2), 'slow slow') AS has_block_phrase,
         |       contains(text2, '{') AS has_brace,
         |       NOT contains(lower(text2), 'slow slow') AND NOT contains(text2, '{')
         |         AND len(kept) >= 3 AS keep_doc
         |FROM fl
         |ORDER BY doc_id
         |LIMIT 500""".stripMargin,

    // quantile_cont == Spark's interpolated percentile (q_percentiles-
    // pinned parity); q literals forced DOUBLE (DuckDB would parse
    // 1.0/3 as DECIMAL); thresholds and scores round to 6 before the
    // bucket CASE; pos replayed as row_number over the same composite
    // (padded bucket, md5 key, id) string key the prefix sum orders by.
    "curriculum_order" ->
      """WITH th AS (
        |  SELECT round(quantile_cont(n_chars, 0.3333333333333333::DOUBLE), 6) AS t1,
        |         round(quantile_cont(n_chars, 0.6666666666666666::DOUBLE), 6) AS t2
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_chars,
        |         CAST(CASE WHEN round(n_chars::DOUBLE, 6) > t2 THEN 2
        |                   WHEN round(n_chars::DOUBLE, 6) > t1 THEN 1
        |                   ELSE 0 END AS INT) AS bucket
        |  FROM documents, th),
        |k AS (
        |  SELECT doc_id, n_chars, bucket,
        |         lpad(bucket::VARCHAR, 4, '0') || ':' ||
        |         lower(substr(md5('curr5:' || doc_id), 1, 8)) || ':' || doc_id AS ck
        |  FROM b)
        |SELECT doc_id, n_chars, bucket,
        |       CAST(row_number() OVER (ORDER BY ck) AS BIGINT) AS pos
        |FROM k
        |ORDER BY pos""".stripMargin,

    // The curriculum_order CTEs + the pack_sequences cumsum, with the
    // window ordered by curriculum position instead of doc id.
    "curriculum_pack" ->
      """WITH th AS (
        |  SELECT round(quantile_cont(n_chars, 0.3333333333333333::DOUBLE), 6) AS t1,
        |         round(quantile_cont(n_chars, 0.6666666666666666::DOUBLE), 6) AS t2
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_chars,
        |         CAST(CASE WHEN round(n_chars::DOUBLE, 6) > t2 THEN 2
        |                   WHEN round(n_chars::DOUBLE, 6) > t1 THEN 1
        |                   ELSE 0 END AS INT) AS bucket
        |  FROM documents, th),
        |k AS (
        |  SELECT doc_id, n_chars, bucket,
        |         lpad(bucket::VARCHAR, 4, '0') || ':' ||
        |         lower(substr(md5('curr5:' || doc_id), 1, 8)) || ':' || doc_id AS ck
        |  FROM b),
        |o AS (
        |  SELECT doc_id, n_chars, bucket,
        |         CAST(row_number() OVER (ORDER BY ck) AS BIGINT) AS pos
        |  FROM k),
        |t AS (
        |  SELECT pos, doc_id, bucket,
        |         CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_tokens
        |  FROM o),
        |c AS (
        |  SELECT pos, doc_id, bucket, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS tok_start
        |  FROM t)
        |SELECT pos, doc_id, bucket, n_tokens,
        |       CAST(FLOOR(tok_start / 2048.0) AS BIGINT) AS seq_id,
        |       tok_start % 2048 AS seq_offset
        |FROM c
        |ORDER BY pos""".stripMargin,

    // First-occurrence line dedup: rank occurrences of each line key by
    // (doc, pos); rn > 1 is removed. string_agg skips NULLed lines,
    // mirroring concat_ws.
    "dedup_lines" ->
      s"""WITH $linifiedCtes,
         |ex AS (
         |  SELECT doc_id AS id, pos, lines[pos] AS line
         |  FROM (SELECT doc_id, lines, unnest(generate_series(1, len(lines))) AS pos
         |        FROM lnf)),
         |keyed AS (
         |  SELECT id, pos, line,
         |         len(list_filter(string_split_regex(line, '\\s+'), w -> length(w) > 0)) >= 3 AS participates,
         |         md5(trim(line)) AS key
         |  FROM ex),
         |occ AS (
         |  SELECT id, pos,
         |         row_number() OVER (PARTITION BY key ORDER BY id, pos) AS rn
         |  FROM keyed WHERE participates),
         |j AS (
         |  SELECT k.id, k.pos, k.line, coalesce(o.rn > 1, FALSE) AS rm
         |  FROM keyed k LEFT JOIN occ o ON k.id = o.id AND k.pos = o.pos)
         |SELECT id AS doc_id,
         |       CAST(count(*) AS BIGINT) AS n_lines,
         |       CAST(sum(CASE WHEN rm THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
         |       coalesce(string_agg(CASE WHEN rm THEN NULL ELSE line END, chr(10) ORDER BY pos), '') AS text_deduped
         |FROM j GROUP BY id
         |ORDER BY doc_id""".stripMargin,

    // Sum order inside a doc's rollup is engine-dependent, so avg_logp
    // rounds to 6 (error ~1e-14 at these magnitudes); ln itself matches
    // within that rounding (same stance as the BM25 idf oracles).
    "quality_lm" ->
      """WITH nt AS (
        |  SELECT doc_id,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         unnest(list_transform(generate_series(1, greatest(length(t) - 1, 0)),
        |                               i -> substr(t, i, 2))) AS bg
        |  FROM nt),
        |dg AS (SELECT doc_id, bg, count(*) AS n FROM g GROUP BY 1, 2),
        |gc AS (SELECT bg, sum(n) AS cnt FROM dg GROUP BY 1),
        |cc AS (SELECT substr(bg, 1, 1) AS c0, sum(cnt) AS ctx FROM gc GROUP BY 1),
        |lp AS (
        |  SELECT bg, ln((cnt + 1.0) / (ctx + 37.0)) AS lp
        |  FROM gc JOIN cc ON substr(gc.bg, 1, 1) = cc.c0)
        |SELECT dg.doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |       round(sum(n * lp.lp) / sum(n), 6) AS avg_logp
        |FROM dg JOIN lp USING (bg)
        |GROUP BY 1
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // The quality_lm scoring CTE + per-language tercile thresholds
    // (quantile_cont == Spark's interpolated percentile, the
    // q_percentiles-pinned parity), both rounded to 6 before the
    // bucket CASE.
    "quality_ppl_buckets" ->
      """WITH nt AS (
        |  SELECT doc_id, lang,
        |         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang,
        |         unnest(list_transform(generate_series(1, greatest(length(t) - 1, 0)),
        |                               i -> substr(t, i, 2))) AS bg
        |  FROM nt),
        |dg AS (SELECT doc_id, lang, bg, count(*) AS n FROM g GROUP BY 1, 2, 3),
        |gc AS (SELECT bg, sum(n) AS cnt FROM dg GROUP BY 1),
        |cc AS (SELECT substr(bg, 1, 1) AS c0, sum(cnt) AS ctx FROM gc GROUP BY 1),
        |lp AS (
        |  SELECT bg, ln((cnt + 1.0) / (ctx + 37.0)) AS lp
        |  FROM gc JOIN cc ON substr(gc.bg, 1, 1) = cc.c0),
        |sc AS (
        |  SELECT dg.doc_id, dg.lang,
        |         round(sum(n * lp.lp) / sum(n), 6) AS avg_logp
        |  FROM dg JOIN lp USING (bg)
        |  GROUP BY 1, 2),
        |thr AS (
        |  SELECT lang, round(quantile_cont(avg_logp, 1.0/3.0), 6) AS t1,
        |         round(quantile_cont(avg_logp, 2.0/3.0), 6) AS t2
        |  FROM sc GROUP BY 1)
        |SELECT sc.doc_id, sc.lang, sc.avg_logp,
        |       CASE WHEN sc.avg_logp > thr.t2 THEN 'head'
        |            WHEN sc.avg_logp > thr.t1 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM sc JOIN thr USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "boilerplate_ngrams" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                                    || ' ' || toks[i+3] || ' ' || toks[i+4])) AS s
        |  FROM tk),
        |rep AS (SELECT s FROM g GROUP BY s HAVING count(DISTINCT id) >= 2),
        |per AS (
        |  SELECT g.id, count(*) AS n_grams,
        |         CAST(sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
        |  FROM g LEFT JOIN rep r ON g.s = r.s
        |  GROUP BY g.id)
        |SELECT d.doc_id,
        |       coalesce(p.n_grams, 0) AS n_grams,
        |       coalesce(p.n_repeated, 0) AS n_repeated,
        |       round(coalesce(p.n_repeated, 0)::DOUBLE
        |             / greatest(coalesce(p.n_grams, 0), 1)::DOUBLE, 6) AS coverage
        |FROM documents d LEFT JOIN per p ON d.doc_id = p.id
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    "corpus_top_terms" ->
      """WITH tk AS (
        |  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |t AS (SELECT unnest(toks) AS term FROM tk)
        |SELECT term, count(*) AS n
        |FROM t
        |GROUP BY term
        |ORDER BY n DESC, term
        |LIMIT 50""".stripMargin,

    "bpe_pair_stats" ->
      """WITH w AS (
        |  SELECT term AS word, count(*) AS freq FROM (
        |    SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                              t -> length(t) > 1)) AS term
        |    FROM documents)
        |  GROUP BY 1),
        |p AS (
        |  SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, freq
        |  FROM (SELECT word, freq,
        |               unnest(generate_series(1, length(word) - 1)) AS i
        |        FROM w))
        |SELECT a, b, CAST(sum(freq) AS BIGINT) AS weight
        |FROM p GROUP BY 1, 2
        |ORDER BY weight DESC, a, b
        |LIMIT 50""".stripMargin,

    // Segmentation replayed per distinct word via boundary-anchored
    // replace chains (see bpeEncodeExpr); docs reassemble in position
    // order.
    "bpe_encode" ->
      s"""WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> length(t) > 1) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, pos, toks[pos] AS word
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks))) AS pos
        |        FROM tk)),
        |v AS (SELECT DISTINCT word FROM w),
        |seg AS (
        |  SELECT word, string_split(trim($bpeEncodeExpr, '_'), '__') AS subw
        |  FROM v)
        |SELECT w.doc_id,
        |       CAST(sum(len(subw)) AS BIGINT) AS n_tokens,
        |       string_agg(array_to_string(subw, ' '), ' ' ORDER BY pos) AS tokens_str
        |FROM w JOIN seg USING (word)
        |GROUP BY 1
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // The bpe_encode replay rolled up per source (tokens / raw chars;
    // docs with zero valid tokens drop via the inner join on both
    // engines — the encode path never emits them).
    "bpe_fertility" ->
      s"""WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> length(t) > 1) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, pos, toks[pos] AS word
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks))) AS pos
        |        FROM tk)),
        |v AS (SELECT DISTINCT word FROM w),
        |seg AS (
        |  SELECT word, string_split(trim($bpeEncodeExpr, '_'), '__') AS subw
        |  FROM v),
        |doc_tok AS (
        |  SELECT w.doc_id, sum(len(subw)) AS n_tokens
        |  FROM w JOIN seg USING (word)
        |  GROUP BY 1)
        |SELECT d.source,
        |       CAST(sum(t.n_tokens) AS BIGINT) AS n_tokens,
        |       sum(d.n_chars)::BIGINT AS n_chars,
        |       round(sum(t.n_tokens) / sum(d.n_chars), 6) AS fertility
        |FROM documents d JOIN doc_tok t USING (doc_id)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // bpe_encode's segmentation CTEs + the vocab as a literal VALUES
    // table reconstructed from the same merge-list constant.
    "bpe_encode_ids" ->
      s"""WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> length(t) > 1) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, pos, toks[pos] AS word
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks))) AS pos
        |        FROM tk)),
        |v AS (SELECT DISTINCT word FROM w),
        |seg AS (
        |  SELECT word, string_split(trim($bpeEncodeExpr, '_'), '__') AS subw
        |  FROM v),
        |voc(tok, tid) AS (VALUES $bpeVocabValues),
        |st AS (
        |  SELECT word, spos, subw[spos] AS tok
        |  FROM (SELECT word, subw,
        |               unnest(generate_series(1, len(subw))) AS spos
        |        FROM seg)),
        |wid AS (
        |  SELECT word, count(*) AS nw,
        |         string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY spos) AS ids
        |  FROM st JOIN voc USING (tok)
        |  GROUP BY word)
        |SELECT w.doc_id,
        |       CAST(sum(nw) AS BIGINT) AS n_tokens,
        |       string_agg(ids, ' ' ORDER BY pos) AS ids_str
        |FROM w JOIN wid USING (word)
        |GROUP BY 1
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // bpe_encode's count CTEs + the pack window (naive single-partition
    // cumsum formulation the distributed prefix sum must reproduce).
    "tokenize_pack" ->
      s"""WITH tk AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                             t -> length(t) > 1) AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, toks[pos] AS word
        |  FROM (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks))) AS pos
        |        FROM tk)),
        |v AS (SELECT DISTINCT word FROM w),
        |seg AS (
        |  SELECT word, len(string_split(trim($bpeEncodeExpr, '_'), '__')) AS nw
        |  FROM v),
        |t AS (
        |  SELECT doc_id, CAST(sum(nw) AS BIGINT) AS n_tokens
        |  FROM w JOIN seg USING (word)
        |  GROUP BY 1),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS tok_start
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |       CAST(FLOOR(tok_start / 2048.0) AS BIGINT) AS seq_id,
        |       tok_start % 2048 AS seq_offset
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // dim is 1-based here, 0-based in Spark — it's only ever a join
    // key, never output, so the numbering is engine-internal.
    "embedding_drift" ->
      """WITH e AS (
        |  SELECT label AS slice,
        |         unnest(generate_series(1, len(embedding))) AS dim,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |sd AS (SELECT slice, dim, sum(x) AS s, count(*) AS n FROM e GROUP BY 1, 2),
        |cd AS (SELECT dim, sum(s) / sum(n) AS m_c FROM sd GROUP BY 1)
        |SELECT slice, CAST(max(n) AS BIGINT) AS n_vecs,
        |       round(sqrt(sum((s/n - m_c) * (s/n - m_c))), 6) AS l2_dist,
        |       round(sum((s/n) * m_c) /
        |             (sqrt(sum((s/n) * (s/n))) * sqrt(sum(m_c * m_c))), 6) AS cosine
        |FROM sd JOIN cd USING (dim)
        |GROUP BY slice
        |ORDER BY slice""".stripMargin,

    "corpus_divergence" ->
      """WITH toks AS (
        |  SELECT source AS slice,
        |         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                            t -> length(t) > 1)) AS term
        |  FROM documents),
        |st AS (SELECT slice, term, count(*) AS c_st FROM toks GROUP BY 1, 2),
        |stot AS (SELECT slice, sum(c_st) AS n_s FROM st GROUP BY 1),
        |ct AS (SELECT term, sum(c_st) AS c_t FROM st GROUP BY 1),
        |g AS (SELECT sum(c_st) AS n_c FROM st)
        |SELECT st.slice, count(*) AS n_terms,
        |       CAST(sum(c_st) AS BIGINT) AS n_tokens,
        |       round(sum((c_st::DOUBLE / n_s) *
        |                 ln((c_st::DOUBLE / n_s) / (c_t::DOUBLE / n_c))), 6) AS kl_vs_corpus
        |FROM st JOIN ct USING (term) JOIN stot USING (slice) CROSS JOIN g
        |GROUP BY st.slice
        |ORDER BY slice""".stripMargin,

    "decontaminate" ->
      """WITH tk AS (
        |  SELECT doc_id AS id,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT id,
        |         unnest(list_transform(generate_series(1, greatest(len(toks) - 4, 0)),
        |                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                                    || ' ' || toks[i+3] || ' ' || toks[i+4])) AS s
        |  FROM tk),
        |bg AS (SELECT DISTINCT s FROM g WHERE id % 50 = 0)
        |SELECT g.id AS doc_id, count(*) AS n_overlap_grams
        |FROM g JOIN bg ON g.s = bg.s
        |WHERE g.id % 50 <> 0
        |GROUP BY 1
        |ORDER BY doc_id
        |LIMIT 500""".stripMargin,

    // The naive single-partition-window formulation the two-pass
    // distributed prefix sum must reproduce exactly. tok_start is cast
    // back to BIGINT because DuckDB widens windowed SUM(BIGINT) to
    // HUGEINT, which would drift the compared dtypes.
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS BIGINT) AS tok_start
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |       CAST(FLOOR(tok_start / 2048.0) AS BIGINT) AS seq_id,
        |       tok_start % 2048 AS seq_offset
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    // Keep-threshold compare in fixed-width lowercase hex: both engines
    // compute floor(min_cnt*2^32/cnt) in double then format 8 hex
    // digits, so the comparison is bit-identical.
    "sample_mixture" ->
      """WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT MIN(cnt) AS min_cnt FROM c)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN c USING (lang) CROSS JOIN m
        |WHERE c.cnt = m.min_cnt
        |   OR substr(md5('mix42:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |      < printf('%08x', CAST(FLOOR(min_cnt * 4294967296.0 / cnt) AS BIGINT))
        |ORDER BY doc_id""".stripMargin,

    // Water-filling replay: same weight family (powers of two cycling
    // over the sorted sources), same integer-division budget, same
    // cross-multiplied capped test on the raw-prefix scan, same
    // roundings (see TrainExport.mixturePlan's proof-sketch scaladoc).
    "mixture_plan" ->
      ("WITH\n" + mixturePlanCtes(2, "1.0") + s"""
        |SELECT f.source, f.available, round(f.w, 9) AS weight,
        |  $mixturePlanAllocated AS allocated,
        |  round(($mixturePlanAllocated) / f.available, 6) AS rate,
        |  CASE WHEN f.is_capped THEN 1 ELSE 0 END AS capped
        |FROM flag f, agg
        |ORDER BY f.source""".stripMargin),

    // The maxRate=2.5 plan (full-total budget): same chain, scaled
    // capacities.
    "mixture_plan_epochs" ->
      ("WITH\n" + mixturePlanCtes(1, "2.5") + s"""
        |SELECT f.source, f.available, round(f.w, 9) AS weight,
        |  $mixturePlanAllocated AS allocated,
        |  round(($mixturePlanAllocated) / f.available, 6) AS rate,
        |  CASE WHEN f.is_capped THEN 1 ELSE 0 END AS capped
        |FROM flag f, agg
        |ORDER BY f.source""".stripMargin),

    // Epoch expansion replay: floor(rate) full copies + the
    // md5-fractional extra, unrolled via generate_series.
    "sample_plan_epochs" ->
      ("WITH\n" + mixturePlanCtes(1, "2.5") + s""",
        |plan AS (SELECT f.source,
        |    round(($mixturePlanAllocated) / f.available, 6) AS rate
        |  FROM flag f, agg),
        |cp AS (SELECT d.doc_id, d.source,
        |    (floor(p.rate)::INT + CASE
        |       WHEN substr(md5('epoch42:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |            < printf('%08x', CAST(FLOOR((p.rate - floor(p.rate))
        |                * 4294967296.0) AS BIGINT))
        |       THEN 1 ELSE 0 END) AS copies
        |  FROM documents d JOIN plan p USING (source))
        |SELECT doc_id, source,
        |       unnest(generate_series(0, copies - 1))::INT AS epoch
        |FROM cp WHERE copies >= 1
        |ORDER BY doc_id, epoch""".stripMargin),

    // The plan's rates applied by the md5-hex-threshold draw (the
    // sample_mixture_temp mechanism with table-supplied rates).
    "sample_plan_draw" ->
      ("WITH\n" + mixturePlanCtes(2, "1.0") + s""",
        |plan AS (SELECT f.source,
        |    round(($mixturePlanAllocated) / f.available, 6) AS rate
        |  FROM flag f, agg)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN plan p USING (source)
        |WHERE p.rate >= 1.0
        |   OR substr(md5('plan42:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |      < printf('%08x', CAST(FLOOR(p.rate * 4294967296.0) AS BIGINT))
        |ORDER BY doc_id""".stripMargin),

    // rate rounds to 6 before the hex threshold so cross-engine pow
    // ulps can't flip boundary docs.
    "sample_mixture_temp" ->
      """WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
        |m AS (SELECT MIN(cnt) AS min_cnt FROM c),
        |r AS (SELECT lang, round(power(min_cnt::DOUBLE / cnt, 0.5), 6) AS rate
        |      FROM c CROSS JOIN m)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN r USING (lang)
        |WHERE r.rate >= 1.0
        |   OR substr(md5('t5:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |      < printf('%08x', CAST(FLOOR(r.rate * 4294967296.0) AS BIGINT))
        |ORDER BY doc_id""".stripMargin,

    // Hashed unigram+bigram buckets (md5 mod 10k), Laplace-smoothed
    // log-ratio model, per-doc sum rounded to 6, Gumbel key
    // log_w - ln(-ln(u)) with u = (hash32 + 0.5) / 2^32 — every
    // ingredient md5/double arithmetic both engines compute identically.
    "sample_dsir" ->
      """WITH tk AS (
        |  SELECT doc_id AS id, lang,
        |         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |                     t -> length(t) > 1) AS toks
        |  FROM documents),
        |g AS (
        |  SELECT id, lang, unnest(list_concat(toks,
        |           list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
        |                          i -> toks[i] || ' ' || toks[i+1]))) AS gram
        |  FROM tk),
        |b AS (SELECT id, lang,
        |             CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) % 10000 AS bkt
        |      FROM g),
        |rc AS (SELECT bkt, count(*) AS c_r FROM b GROUP BY 1),
        |tc AS (SELECT bkt, count(*) AS c_t FROM b WHERE lang = 'en' GROUP BY 1),
        |rt AS (SELECT sum(c_r) AS n_r FROM rc),
        |tt AS (SELECT sum(c_t) AS n_t FROM tc),
        |model AS (
        |  SELECT rc.bkt,
        |         ln((coalesce(tc.c_t, 0) + 1.0) / (tt.n_t + 10000.0)) -
        |         ln((rc.c_r + 1.0) / (rt.n_r + 10000.0)) AS lambda
        |  FROM rc LEFT JOIN tc USING (bkt) CROSS JOIN tt CROSS JOIN rt),
        |db AS (SELECT id, bkt, count(*) AS n_b FROM b GROUP BY 1, 2),
        |w AS (SELECT id, round(sum(n_b * lambda), 6) AS log_w
        |      FROM db JOIN model USING (bkt) GROUP BY 1),
        |sel AS (
        |  SELECT id AS doc_id, log_w,
        |         round(log_w - ln(-ln(
        |           (CAST(('0x' || substr(md5('dsir9:' || CAST(id AS VARCHAR)), 1, 8))
        |                 AS BIGINT) + 0.5) / 4294967296.0)), 6) AS gumbel
        |  FROM w
        |  ORDER BY gumbel DESC, doc_id
        |  LIMIT 100)
        |SELECT doc_id, log_w, gumbel FROM sel
        |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, source
        |FROM (SELECT doc_id, lang, source,
        |             row_number() OVER (
        |               PARTITION BY lang
        |               ORDER BY substr(md5('r5:' || CAST(doc_id AS VARCHAR)), 1, 8),
        |                        doc_id) AS rn
        |      FROM documents)
        |WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,

    // row_number over the md5 permutation key (suffixed with the id so
    // the order key is unconditionally unique in both engines).
    "shuffle_export" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         ROW_NUMBER() OVER (ORDER BY
        |           substr(md5('shuf7:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |             || ':' || CAST(doc_id AS VARCHAR)) AS pos
        |  FROM documents)
        |SELECT doc_id, pos, CAST((pos - 1) % 8 AS INT) AS shard
        |FROM r
        |ORDER BY pos""".stripMargin,

    // Email scrub runs before phone/IP in BOTH engines (emails contain
    // dots and digits) — the staged CTEs mirror CorpusClean.piiScrub's
    // expression nesting exactly.
    "pii_scrub" ->
      """WITH src AS (
        |  SELECT event_id,
        |         'user' || CAST(user_id AS VARCHAR) || '@example.com said hi from 10.0.'
        |           || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR)
        |           || ' call 555-' || lpad(CAST(event_id % 1000 AS VARCHAR), 3, '0') || '-0199' AS payload
        |  FROM events WHERE event_id < 2000),
        |s1 AS (
        |  SELECT event_id,
        |         CAST(len(regexp_extract_all(payload, '%EMAIL%')) AS BIGINT) AS n_emails,
        |         regexp_replace(payload, '%EMAIL%', '[EMAIL]', 'g') AS p1
        |  FROM src),
        |s2 AS (
        |  SELECT event_id, n_emails,
        |         CAST(len(regexp_extract_all(p1, '%PHONE%')) AS BIGINT) AS n_phones,
        |         regexp_replace(p1, '%PHONE%', '[PHONE]', 'g') AS p2
        |  FROM s1)
        |SELECT event_id, n_emails, n_phones,
        |       CAST(len(regexp_extract_all(p2, '%IP%')) AS BIGINT) AS n_ips,
        |       regexp_replace(p2, '%IP%', '[IP]', 'g') AS redacted
        |FROM s2
        |ORDER BY event_id
        |LIMIT 1000"""
        .stripMargin
        .replace("%EMAIL%", graft.operators.CorpusClean.EmailRegex)
        .replace("%PHONE%", graft.operators.CorpusClean.PhoneRegex)
        .replace("%IP%", graft.operators.CorpusClean.Ipv4Regex),

    "range_join_transit" ->
      """SELECT l.l_orderkey, l.l_linenumber, count(*) AS n_orders
        |FROM (SELECT l_orderkey, l_linenumber,
        |             epoch_us(l_shipdate) AS ws,
        |             epoch_us(l_shipdate) + 2592000000000 AS we
        |      FROM lineitem WHERE l_orderkey < 100) l
        |JOIN orders o ON epoch_us(o.o_orderdate) BETWEEN l.ws AND l.we
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "events_asof_order" -> asofOracle,
    // same semantics via the custom physical operator — same oracle
    "events_asof_native" -> asofOracle,

    "q_percentiles" ->
      """SELECT lang, count(*) AS n_docs,
        |       quantile_cont(n_chars, 0.5) AS p50_chars,
        |       quantile_cont(n_chars, 0.95) AS p95_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "multimodal_stats" ->
      """SELECT doc_id, octet_length(text::BLOB) AS size_bytes, md5(text) AS digest
        |FROM documents
        |ORDER BY doc_id
        |LIMIT 200""".stripMargin,

    // Sub-second min(ts) precision differs (Spark truncates to micros)
    // but only date-level values survive into the output, so the
    // engines agree; weeks are ISO-Monday in both.
    "events_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
        |w AS (
        |  SELECT DISTINCT e.user_id,
        |         CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
        |         CAST(FLOOR(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_week, week_offset, count(*) AS retained
        |FROM w
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "events_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |         min(ts) FILTER (WHERE event_type = 'signup') AS first_signup,
        |         min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        |  FROM events
        |  GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |       count(first_signup) AS n_signup,
        |       CAST(sum(CASE WHEN first_signup IS NOT NULL AND first_purchase IS NOT NULL
        |                 AND first_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM u""".stripMargin,

    "events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |       event_type, count(*) AS n,
        |       CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "events_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM events
        |WHERE json_extract(props, '$.k')::INT > 80
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "knn_batch" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |         round(list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS score
        |  FROM embeddings e CROSS JOIN q),
        |ranked AS (
        |  SELECT qid, vec_id, score,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY score DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT qid, rank, vec_id, score
        |FROM ranked
        |WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    "knn_batch_agg" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.qid, e.vec_id,
        |         round(list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS score
        |  FROM embeddings e CROSS JOIN q),
        |ranked AS (
        |  SELECT qid, vec_id, score,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY score DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT qid, rank, vec_id, score
        |FROM ranked
        |WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    // Replays the batch top-10 (knn_batch_agg's ranking, score rounded
    // to 6 with vec_id tie-break, so ranked lists are engine-identical)
    // then computes the metrics. log2 is spelled ln(2)/ln(x) in both
    // engines; DCG/ideal-DCG ratios round to 6 after the sums.
    "eval_retrieval" ->
      """WITH q AS (SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 20 = 0),
        |scored AS (
        |  SELECT q.qid, q.ql, e.vec_id, e.label,
        |         round(list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS score
        |  FROM embeddings e CROSS JOIN q),
        |res AS (
        |  SELECT * FROM (
        |    SELECT qid, ql, vec_id, label,
        |           row_number() OVER (PARTITION BY qid
        |                              ORDER BY score DESC, vec_id) AS rank
        |    FROM scored)
        |  WHERE rank <= 10),
        |nrel AS (
        |  SELECT q.qid, count(*) AS n_rel
        |  FROM q JOIN embeddings e ON e.label = q.ql AND e.vec_id <> q.qid
        |  GROUP BY q.qid),
        |hits AS (
        |  SELECT qid, count(*) AS n_hits, min(rank) AS fr,
        |         sum(ln(2.0) / ln(rank + 1.0)) AS dcg
        |  FROM res WHERE label = ql AND vec_id <> qid
        |  GROUP BY qid)
        |SELECT b.qid,
        |       coalesce(n.n_rel, 0) AS n_rel,
        |       coalesce(h.n_hits, 0) AS n_hits,
        |       round(coalesce(h.n_hits, 0) / 10.0, 6) AS precision_k,
        |       round(CASE WHEN coalesce(n.n_rel, 0) > 0
        |                  THEN coalesce(h.n_hits, 0)::DOUBLE / n.n_rel
        |                  ELSE 0.0 END, 6) AS recall_k,
        |       round(coalesce(1.0 / h.fr, 0.0), 6) AS rr,
        |       round(CASE WHEN coalesce(n.n_rel, 0) > 0
        |                  THEN coalesce(h.dcg, 0.0) /
        |                       list_sum(list_transform(
        |                         generate_series(1, greatest(least(n.n_rel, 10), 1)),
        |                         i -> ln(2.0) / ln(i + 1.0)))
        |                  ELSE 0.0 END, 6) AS ndcg
        |FROM (SELECT DISTINCT qid FROM scored UNION SELECT qid FROM nrel) b
        |LEFT JOIN nrel n USING (qid)
        |LEFT JOIN hits h USING (qid)
        |ORDER BY qid""".stripMargin,
    // The production-arm metrics (r14): identical harness SQL, with
    // scored restricted to each query's nprobe=4 probed label clusters
    // (the knn_ivf probe replay, batched per qid). recall_k here IS
    // the IVF tier's recall-vs-truth, hash-gated per query.
    "eval_retrieval_ivf" ->
      """WITH q AS (SELECT vec_id AS qid, label AS ql, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id % 20 = 0),
        |cent AS (
        |  SELECT label AS cluster, i AS pos, avg(embedding[i]::DOUBLE) AS cv
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)
        |  GROUP BY 1, 2),
        |cs AS (SELECT q.qid, cluster, round(sum(cv * qv[pos]), 6) AS cscore
        |       FROM cent, q GROUP BY 1, 2),
        |probed AS (
        |  SELECT qid, cluster FROM (
        |    SELECT qid, cluster,
        |           row_number() OVER (PARTITION BY qid
        |                              ORDER BY cscore DESC, cluster) AS pr
        |    FROM cs)
        |  WHERE pr <= 4),
        |scored AS (
        |  SELECT q.qid, q.ql, e.vec_id, e.label,
        |         round(list_inner_product(e.embedding::DOUBLE[], q.qv), 6) AS score
        |  FROM q JOIN probed p ON p.qid = q.qid
        |         JOIN embeddings e ON e.label = p.cluster),
        |res AS (
        |  SELECT * FROM (
        |    SELECT qid, ql, vec_id, label,
        |           row_number() OVER (PARTITION BY qid
        |                              ORDER BY score DESC, vec_id) AS rank
        |    FROM scored)
        |  WHERE rank <= 10),
        |nrel AS (
        |  SELECT q.qid, count(*) AS n_rel
        |  FROM q JOIN embeddings e ON e.label = q.ql AND e.vec_id <> q.qid
        |  GROUP BY q.qid),
        |hits AS (
        |  SELECT qid, count(*) AS n_hits, min(rank) AS fr,
        |         sum(ln(2.0) / ln(rank + 1.0)) AS dcg
        |  FROM res WHERE label = ql AND vec_id <> qid
        |  GROUP BY qid)
        |SELECT b.qid,
        |       coalesce(n.n_rel, 0) AS n_rel,
        |       coalesce(h.n_hits, 0) AS n_hits,
        |       round(coalesce(h.n_hits, 0) / 10.0, 6) AS precision_k,
        |       round(CASE WHEN coalesce(n.n_rel, 0) > 0
        |                  THEN coalesce(h.n_hits, 0)::DOUBLE / n.n_rel
        |                  ELSE 0.0 END, 6) AS recall_k,
        |       round(coalesce(1.0 / h.fr, 0.0), 6) AS rr,
        |       round(CASE WHEN coalesce(n.n_rel, 0) > 0
        |                  THEN coalesce(h.dcg, 0.0) /
        |                       list_sum(list_transform(
        |                         generate_series(1, greatest(least(n.n_rel, 10), 1)),
        |                         i -> ln(2.0) / ln(i + 1.0)))
        |                  ELSE 0.0 END, 6) AS ndcg
        |FROM (SELECT DISTINCT qid FROM scored UNION SELECT qid FROM nrel) b
        |LEFT JOIN nrel n USING (qid)
        |LEFT JOIN hits h USING (qid)
        |ORDER BY qid""".stripMargin,

    // eval_retrieval_ivf with the probe blocking swapped from `label`
    // to the cluster_kmeans recursion's assignment (k = 8, 3 rounds):
    // cent0/fin/asg replay the deterministic Lloyd loop, cent averages
    // per ASSIGNED cluster, and the probe/score/metrics tail is the
    // label arm's unchanged. Relevance stays label-based.
    "eval_retrieval_ivf_kmeans" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |init AS (SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cluster, v
        |         FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
        |cent0(iter, cluster, c) AS (
        |  SELECT 0, cluster, v FROM init
        |  UNION ALL
        |  SELECT iter + 1, cluster, list(cm ORDER BY pos)
        |  FROM (
        |    SELECT a.iter, a.cluster, p.pos, round(avg(a.v[p.pos]), 6) AS cm
        |    FROM (
        |      SELECT c.iter, e.vec_id, e.v,
        |             min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                    - 2 * list_inner_product(e.v, c.c)
        |                    + list_inner_product(c.c, c.c), 6),
        |                 cl := c.cluster)).cl AS cluster
        |      FROM cent0 c, e
        |      WHERE c.iter < 3
        |      GROUP BY c.iter, e.vec_id, e.v
        |    ) a, (SELECT unnest(generate_series(1, 64)) AS pos) p
        |    GROUP BY a.iter, a.cluster, p.pos
        |  )
        |  GROUP BY iter, cluster
        |),
        |fin AS (SELECT cluster, c FROM cent0 WHERE iter = 3),
        |asg AS (
        |  SELECT vec_id, m.cl AS kc
        |  FROM (
        |    SELECT e.vec_id,
        |           min(struct_pack(d := round(list_inner_product(e.v, e.v)
        |                  - 2 * list_inner_product(e.v, fin.c)
        |                  + list_inner_product(fin.c, fin.c), 6),
        |               cl := fin.cluster)) AS m
        |    FROM e, fin
        |    GROUP BY e.vec_id)),
        |q AS (SELECT vec_id AS qid, label AS ql, v AS qv FROM e WHERE vec_id % 20 = 0),
        |cent AS (
        |  SELECT a.kc AS cluster, p.pos, avg(e.v[p.pos]) AS cv
        |  FROM e JOIN asg a USING (vec_id),
        |       (SELECT unnest(generate_series(1, 64)) AS pos) p
        |  GROUP BY 1, 2),
        |cs AS (SELECT q.qid, cluster, round(sum(cv * qv[pos]), 6) AS cscore
        |       FROM cent, q GROUP BY 1, 2),
        |probed AS (
        |  SELECT qid, cluster FROM (
        |    SELECT qid, cluster,
        |           row_number() OVER (PARTITION BY qid
        |                              ORDER BY cscore DESC, cluster) AS pr
        |    FROM cs)
        |  WHERE pr <= 4),
        |scored AS (
        |  SELECT q.qid, q.ql, e.vec_id, e.label,
        |         round(list_inner_product(e.v, q.qv), 6) AS score
        |  FROM q JOIN probed p ON p.qid = q.qid
        |         JOIN asg a ON a.kc = p.cluster
        |         JOIN e ON e.vec_id = a.vec_id),
        |res AS (
        |  SELECT * FROM (
        |    SELECT qid, ql, vec_id, label,
        |           row_number() OVER (PARTITION BY qid
        |                              ORDER BY score DESC, vec_id) AS rank
        |    FROM scored)
        |  WHERE rank <= 10),
        |nrel AS (
        |  SELECT q.qid, count(*) AS n_rel
        |  FROM q JOIN e ON e.label = q.ql AND e.vec_id <> q.qid
        |  GROUP BY q.qid),
        |hits AS (
        |  SELECT qid, count(*) AS n_hits, min(rank) AS fr,
        |         sum(ln(2.0) / ln(rank + 1.0)) AS dcg
        |  FROM res WHERE label = ql AND vec_id <> qid
        |  GROUP BY qid)
        |SELECT b.qid,
        |       coalesce(n.n_rel, 0) AS n_rel,
        |       coalesce(h.n_hits, 0) AS n_hits,
        |       round(coalesce(h.n_hits, 0) / 10.0, 6) AS precision_k,
        |       round(CASE WHEN coalesce(n.n_rel, 0) > 0
        |                  THEN coalesce(h.n_hits, 0)::DOUBLE / n.n_rel
        |                  ELSE 0.0 END, 6) AS recall_k,
        |       round(coalesce(1.0 / h.fr, 0.0), 6) AS rr,
        |       round(CASE WHEN coalesce(n.n_rel, 0) > 0
        |                  THEN coalesce(h.dcg, 0.0) /
        |                       list_sum(list_transform(
        |                         generate_series(1, greatest(least(n.n_rel, 10), 1)),
        |                         i -> ln(2.0) / ln(i + 1.0)))
        |                  ELSE 0.0 END, 6) AS ndcg
        |FROM (SELECT DISTINCT qid FROM scored UNION SELECT qid FROM nrel) b
        |LEFT JOIN nrel n USING (qid)
        |LEFT JOIN hits h USING (qid)
        |ORDER BY qid""".stripMargin,

    "knn_quantized" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |              list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |       FROM e),
        |dq AS (SELECT vec_id,
        |              CASE WHEN scale > 0
        |                   THEN list_transform(v, x -> round(x / scale)::INT * scale)
        |                   ELSE list_transform(v, x -> 0.0) END AS dqv
        |       FROM sc),
        |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT d.vec_id, round(list_inner_product(d.dqv, q.qv), 6) AS score
        |FROM dq d, q
        |ORDER BY score DESC, d.vec_id
        |LIMIT 10""".stripMargin,

    // Rebuilds the seed codebooks from the same table (subvector slices
    // of the 16 lowest-vec_id rows), encodes every vector by sequential
    // sum-of-squared-diffs argmin (first-win tie = ORDER BY dist, code),
    // and ADC-scores via the per-subspace q·centroid products — the
    // exact arithmetic PqEncode/adcLut perform. list_inner_product is a
    // sequential double fold, matching the expression's loops.
    "knn_pq" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
        |  FROM e ORDER BY vec_id LIMIT 16),
        |subs AS (SELECT unnest(range(0, 8)) AS m),
        |cb AS (
        |  SELECT subs.m, seeds.code,
        |         list_transform(range(1, 9), j -> seeds.v[subs.m * 8 + j]) AS cent
        |  FROM subs CROSS JOIN seeds),
        |dists AS (
        |  SELECT e.vec_id, cb.m, cb.code,
        |         list_inner_product(
        |           list_transform(range(1, 9), j -> e.v[cb.m * 8 + j] - cb.cent[j]),
        |           list_transform(range(1, 9), j -> e.v[cb.m * 8 + j] - cb.cent[j])) AS dist
        |  FROM e CROSS JOIN cb),
        |codes AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT vec_id, m, code,
        |           row_number() OVER (PARTITION BY vec_id, m
        |                              ORDER BY dist ASC, code ASC) AS rn
        |    FROM dists)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT cb.m, cb.code,
        |         list_inner_product(
        |           list_transform(range(1, 9), j -> q.qv[cb.m * 8 + j]), cb.cent) AS pdot
        |  FROM cb, q)
        |SELECT c.vec_id, round(sum(l.pdot), 6) AS adc_score
        |FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.code
        |GROUP BY c.vec_id
        |ORDER BY adc_score DESC, c.vec_id
        |LIMIT 10""".stripMargin,

    "knn_maxsim" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id < 3),
        |s AS (
        |  SELECT e.label AS grp, q.qid,
        |         max(list_inner_product(e.embedding::DOUBLE[], q.qv)) AS best
        |  FROM embeddings e CROSS JOIN q
        |  GROUP BY 1, 2)
        |SELECT grp, round(sum(best), 6) AS maxsim_score
        |FROM s
        |GROUP BY grp
        |ORDER BY maxsim_score DESC, grp
        |LIMIT 5""".stripMargin,

    // The greedy MMR selection replayed as a recursive CTE. (1.0 - 0.7)
    // stays UNSIMPLIFIED: 1.0-0.7 != 0.3 in doubles, and the Scala side
    // computes (1 - lambda) the same way. Sims round to 6 BEFORE the
    // max, mmr values before the argmax — selection is therefore
    // engine-deterministic with vec_id tie-breaks.
    "knn_mmr" ->
      """WITH RECURSIVE q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |cand AS (
        |  SELECT vec_id,
        |         round(list_inner_product(embedding::DOUBLE[], q.qv), 6) AS rel,
        |         list_transform(embedding::DOUBLE[],
        |           x -> x / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS nv
        |  FROM embeddings, q
        |  ORDER BY rel DESC, vec_id
        |  LIMIT 50),
        |sel(step, ids, picked, score) AS (
        |  SELECT 1, [c.vec_id], c.vec_id, c.rel
        |  FROM (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1) c
        |  UNION ALL
        |  SELECT s.step + 1, list_append(s.ids, n.vec_id), n.vec_id, n.mmr
        |  FROM sel s, LATERAL (
        |    SELECT c.vec_id,
        |           round(0.7 * c.rel - (1.0 - 0.7) * (
        |             SELECT max(round(list_inner_product(c.nv, c2.nv), 6))
        |             FROM cand c2 WHERE list_contains(s.ids, c2.vec_id)), 6) AS mmr
        |    FROM cand c WHERE NOT list_contains(s.ids, c.vec_id)
        |    ORDER BY mmr DESC, c.vec_id LIMIT 1) n
        |  WHERE s.step < 10)
        |SELECT CAST(step AS INT) AS rank, picked AS vec_id, score
        |FROM sel
        |ORDER BY rank""".stripMargin,

    // knn_mmr's recursive greedy replay with the candidate pool
    // restricted to the ivfOracle probe set (label-cluster centroids
    // ranked vs the query, nprobe = 4) — the IVF-tier composition.
    "knn_mmr_ivf" ->
      """WITH RECURSIVE q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
        |cent AS (
        |  SELECT label AS cluster, i AS pos, avg(embedding[i]::DOUBLE) AS cv
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)
        |  GROUP BY 1, 2),
        |cs AS (SELECT cluster, round(sum(cv * qv[pos]), 6) AS cscore FROM cent, q GROUP BY cluster),
        |probed AS (SELECT cluster FROM cs ORDER BY cscore DESC, cluster LIMIT 4),
        |cand AS (
        |  SELECT vec_id,
        |         round(list_inner_product(embedding::DOUBLE[], q.qv), 6) AS rel,
        |         list_transform(embedding::DOUBLE[],
        |           x -> x / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS nv
        |  FROM embeddings, q
        |  WHERE label IN (SELECT cluster FROM probed)
        |  ORDER BY rel DESC, vec_id
        |  LIMIT 50),
        |sel(step, ids, picked, score) AS (
        |  SELECT 1, [c.vec_id], c.vec_id, c.rel
        |  FROM (SELECT * FROM cand ORDER BY rel DESC, vec_id LIMIT 1) c
        |  UNION ALL
        |  SELECT s.step + 1, list_append(s.ids, n.vec_id), n.vec_id, n.mmr
        |  FROM sel s, LATERAL (
        |    SELECT c.vec_id,
        |           round(0.7 * c.rel - (1.0 - 0.7) * (
        |             SELECT max(round(list_inner_product(c.nv, c2.nv), 6))
        |             FROM cand c2 WHERE list_contains(s.ids, c2.vec_id)), 6) AS mmr
        |    FROM cand c WHERE NOT list_contains(s.ids, c.vec_id)
        |    ORDER BY mmr DESC, c.vec_id LIMIT 1) n
        |  WHERE s.step < 10)
        |SELECT CAST(step AS INT) AS rank, picked AS vec_id, score
        |FROM sel
        |ORDER BY rank""".stripMargin,

    // Binary words built with the same 32-bit split as Knn.binaryWord
    // (positive BIGINT range, no signed-shift edge); integer Hamming
    // sims make the candidate cut deterministic without rounding.
    "knn_hamming" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |sig AS (
        |  SELECT vec_id,
        |         CAST(list_sum(list_transform(range(1, 33),
        |           i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS w0,
        |         CAST(list_sum(list_transform(range(33, 65),
        |           i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT) AS w1
        |  FROM e),
        |qs AS (
        |  SELECT CAST(list_sum(list_transform(range(1, 33),
        |           i -> CASE WHEN qv[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS qw0,
        |         CAST(list_sum(list_transform(range(33, 65),
        |           i -> CASE WHEN qv[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT) AS qw1
        |  FROM q),
        |cand AS (
        |  SELECT s.vec_id,
        |         64 - (bit_count(xor(s.w0, qs.qw0)) + bit_count(xor(s.w1, qs.qw1))) AS hs
        |  FROM sig s, qs
        |  ORDER BY hs DESC, s.vec_id
        |  LIMIT 50)
        |SELECT e.vec_id, round(list_inner_product(e.v, q.qv), 6) AS score
        |FROM e JOIN cand ON e.vec_id = cand.vec_id, q
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    // Stored 1-bit tier: identical math to knn_hamming (the persisted
    // words equal the recomputed ones by construction), so the oracle
    // recomputes sketches from the float table.
    "knn_hamming_stored" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |sig AS (
        |  SELECT vec_id,
        |         CAST(list_sum(list_transform(range(1, 33),
        |           i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS w0,
        |         CAST(list_sum(list_transform(range(33, 65),
        |           i -> CASE WHEN v[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT) AS w1
        |  FROM e),
        |qs AS (
        |  SELECT CAST(list_sum(list_transform(range(1, 33),
        |           i -> CASE WHEN qv[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT) AS qw0,
        |         CAST(list_sum(list_transform(range(33, 65),
        |           i -> CASE WHEN qv[i] > 0 THEN (1::BIGINT << (i - 33)) ELSE 0 END)) AS BIGINT) AS qw1
        |  FROM q),
        |cand AS (
        |  SELECT s.vec_id,
        |         64 - (bit_count(xor(s.w0, qs.qw0)) + bit_count(xor(s.w1, qs.qw1))) AS hs
        |  FROM sig s, qs
        |  ORDER BY hs DESC, s.vec_id
        |  LIMIT 50)
        |SELECT e.vec_id, round(list_inner_product(e.v, q.qv), 6) AS score
        |FROM e JOIN cand ON e.vec_id = cand.vec_id, q
        |ORDER BY score DESC, e.vec_id
        |LIMIT 10""".stripMargin,

    // The stored-tier read path: probe = label-cluster mean ranking
    // (same probe arithmetic as the knn_ivf oracle), ADC restricted to
    // the probed clusters, exact re-rank of the ADC top-50. Mirrors
    // Index.searchPq stage for stage.
    "knn_pq_stored" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT v AS qv FROM e WHERE vec_id = 7),
        |cent AS (
        |  SELECT label AS cluster, i AS pos, avg(embedding[i]::DOUBLE) AS cv
        |  FROM embeddings CROSS JOIN range(1, 65) t(i)
        |  GROUP BY 1, 2),
        |cs AS (SELECT cluster, round(sum(cv * qv[pos]), 6) AS cscore FROM cent, q GROUP BY cluster),
        |probed AS (SELECT cluster FROM cs ORDER BY cscore DESC, cluster LIMIT 4),
        |seeds AS (
        |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v
        |  FROM e ORDER BY vec_id LIMIT 16),
        |subs AS (SELECT unnest(range(0, 8)) AS m),
        |cb AS (
        |  SELECT subs.m, seeds.code,
        |         list_transform(range(1, 9), j -> seeds.v[subs.m * 8 + j]) AS cent
        |  FROM subs CROSS JOIN seeds),
        |pe AS (SELECT * FROM e WHERE label IN (SELECT cluster FROM probed)),
        |dists AS (
        |  SELECT pe.vec_id, cb.m, cb.code,
        |         list_inner_product(
        |           list_transform(range(1, 9), j -> pe.v[cb.m * 8 + j] - cb.cent[j]),
        |           list_transform(range(1, 9), j -> pe.v[cb.m * 8 + j] - cb.cent[j])) AS dist
        |  FROM pe CROSS JOIN cb),
        |codes AS (
        |  SELECT vec_id, m, code FROM (
        |    SELECT vec_id, m, code,
        |           row_number() OVER (PARTITION BY vec_id, m
        |                              ORDER BY dist ASC, code ASC) AS rn
        |    FROM dists)
        |  WHERE rn = 1),
        |lut AS (
        |  SELECT cb.m, cb.code,
        |         list_inner_product(
        |           list_transform(range(1, 9), j -> q.qv[cb.m * 8 + j]), cb.cent) AS pdot
        |  FROM cb, q),
        |adc AS (
        |  SELECT c.vec_id, round(sum(l.pdot), 6) AS a
        |  FROM codes c JOIN lut l ON c.m = l.m AND c.code = l.code
        |  GROUP BY c.vec_id),
        |cand AS (SELECT vec_id FROM adc ORDER BY a DESC, vec_id LIMIT 50)
        |SELECT pe.vec_id, round(list_inner_product(pe.v, q.qv), 6) AS score
        |FROM pe JOIN cand ON pe.vec_id = cand.vec_id, q
        |ORDER BY score DESC, pe.vec_id
        |LIMIT 10""".stripMargin,

    "events_session_native" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev_ts IS NULL
        |                  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM x
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev_ts IS NULL
        |                  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM x
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // The AST chunker's golden replay: the committed fixture files are
    // the inputs, these VALUES are the expected chunks (verified
    // against the reference semantics via CodeChunkerSpec's
    // golden/property arms) — any drift in block detection, part
    // splitting, gap fill, dispatch, id derivation or metadata trips
    // the hash gate.
    "chunk_ast" ->
      """SELECT * FROM (VALUES
        |  ('fixture/notes.txt#0', 'plain prose that the strategy dispatcher must route to the simple chunker because txt is not a code extension.', 'fixture/notes.txt', 'simple', NULL, NULL, NULL, NULL, NULL, NULL),
        |  ('fixture/store.py#0', 'def load(path):' || chr(10) || '    with open(path) as f:' || chr(10) || '        return f.read()' || chr(10) || '', 'fixture/store.py', 'ast', 'function', 'load', 'python', 3, 6, NULL),
        |  ('fixture/store.py#1', 'def transform(rows, keep_empty, marker):' || chr(10) || '    out = []' || chr(10) || '    for row in rows:' || chr(10) || '        cleaned = row.strip().lower().replace(marker, "")' || chr(10) || '        if cleaned or keep_empty:' || chr(10) || '            out.append(cleaned + marker + str(len(cleaned)))' || chr(10) || '    counts = {value: len(value) for value in out if value}', 'fixture/store.py', 'ast', 'function', 'transform_part0', 'python', 7, 15, 0),
        |  ('fixture/store.py#2', '    return sorted(set(out)), counts' || chr(10) || '', 'fixture/store.py', 'ast', 'function', 'transform_part1', 'python', 7, 15, 1),
        |  ('fixture/store.py#3', 'class Store:' || chr(10) || '    def __init__(self, root):' || chr(10) || '        self.root = root' || chr(10) || '' || chr(10) || '    def get(self, key):' || chr(10) || '        return load(os.path.join(self.root, key))' || chr(10) || '', 'fixture/store.py', 'ast', 'class', 'Store', 'python', 16, 22, NULL),
        |  ('fixture/store.py#ctx0', 'print("module ready")', 'fixture/store.py', 'context', NULL, NULL, NULL, 23, 23, NULL),
        |  ('fixture/store.rs#0', 'pub fn read_all(path: &str) -> String {' || chr(10) || '    fs::read_to_string(path).unwrap()' || chr(10) || '}', 'fixture/store.rs', 'ast', 'function', 'read_all', 'rust', 3, 5, NULL),
        |  ('fixture/store.rs#1', 'pub struct Store {' || chr(10) || '    root: String,' || chr(10) || '}', 'fixture/store.rs', 'ast', 'struct', 'Store', 'rust', 7, 9, NULL),
        |  ('fixture/store.rs#2', 'impl Store {' || chr(10) || '    pub fn new(root: String) -> Self {' || chr(10) || '        Store { root }' || chr(10) || '    }' || chr(10) || '}', 'fixture/store.rs', 'ast', 'impl', 'Store', 'rust', 11, 15, NULL),
        |  ('fixture/store.rs#ctx0', '' || chr(10) || 'const VERSION: i32 = 1;', 'fixture/store.rs', 'context', NULL, NULL, NULL, 16, 17, NULL)
        |) AS t(id, chunk_text, source, chunk_type, block_type, name, language, start_line, end_line, part)
        |ORDER BY id""".stripMargin,

    "chunk_fixed" ->
      """SELECT doc_id, i AS chunk_index, substr(text, i * 96 + 1, 128) AS chunk_text
        |FROM documents
        |CROSS JOIN LATERAL (
        |  SELECT unnest(generate_series(0, CAST(floor((length(text) - 1) / 96.0) AS BIGINT))) AS i) g
        |WHERE length(text) >= 1
        |ORDER BY doc_id, chunk_index""".stripMargin,
  )
}
