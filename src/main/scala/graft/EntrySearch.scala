package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.MetadataFilterDsl
import graft.operators.{BM25, Dedup, Expansion, Graph, Knn}

/** Retrieval-pipeline rows: BM25, hybrid search, filter DSL, chunkers, index build/search.
  *
  * One family slice of the [[SparkEntry]] driver contract (split in
  * r15 so per-round diffs stay reviewable): `queries` entries and
  * their DuckDB `oracle` SQL live side by side; [[SparkEntry]]
  * aggregates the families. Shared fixtures: [[EntryFixtures]];
  * shared oracle CTE builders: [[OracleCtes]]. The determinism
  * rules (DECIMAL money, 6-decimal score rounding before ranking,
  * id tie-breaks, explicit ORDER BY under LIMIT) are documented
  * once on [[SparkEntry]]. */
private[graft] object EntrySearch {
  import EntryFixtures._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
        (EntryFixtures.astFixturePy, "fixture/store.py"),
        (EntryFixtures.astFixtureRs, "fixture/store.rs"),
        (EntryFixtures.astFixtureTxt, "fixture/notes.txt"))
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

  def oracle: Map[String, String] = Map(

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
