package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.MetadataFilterDsl
import graft.operators.{BM25, Knn}

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
      val emb = Tables.embeddings(s, dir)
      Knn.ivfTopK(emb, Knn.queryVector(emb, 0L), "label", nprobe = 4, k = 10)
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
  )

  def oracleSql: Map[String, String] = OracleSql.all
}

/** DuckDB-dialect oracle SQL for each query above. Shares the constants
  * (k, rounding, decimal casts, query strings) with the Spark plans. */
private object OracleSql {

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

    "knn_ivf" ->
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
  )
}
