package graft.model

/** Engine-native row types, mirroring the reference's data model
  * (SURVEY §1): Passage (`src/index/passages.rs:12-17`), Chunk
  * (`src/chunker/mod.rs:15-19`), SearchResult
  * (`src/index/searcher.rs:15-21`), IndexMeta (`src/index/meta.rs:9-43`).
  *
  * The reference's schemaless JSON `metadata` becomes a typed struct of
  * every key its chunkers actually write (predicate pushdown + column
  * pruning work); ids are deterministic `source#index` strings instead of
  * a global mutable counter (a counter cannot be assigned distributively;
  * the derived id is stable under any partitioning).
  */
final case class ChunkMeta(
    source: String,
    chunk_index: Option[Int],
    chunk_type: String,           // "simple" | "ast" | "context"
    block_type: Option[String],
    name: Option[String],
    language: Option[String],
    start_line: Option[Int],
    end_line: Option[Int],
    part: Option[Int])

final case class Chunk(id: String, text: String, metadata: ChunkMeta)

final case class Passage(id: String, text: String, metadata: ChunkMeta)

final case class SearchResult(id: String, score: Double, text: String, source: String)

/** Sidecar metadata for a built index (one JSON file next to the
  * passages/embeddings tables). */
final case class IndexMeta(
    version: Int,
    backendName: String,
    embeddingModel: String,
    embeddingMode: String,
    dimensions: Int,
    passageCount: Long,
    isRecompute: Boolean,
    isPruned: Boolean,
    queryPromptTemplate: String,
    buildPromptTemplate: String) {

  def toJson: String =
    graft.util.Json.write(scala.collection.immutable.ListMap(
      "version" -> version,
      "backend_name" -> backendName,
      "embedding_model" -> embeddingModel,
      "embedding_mode" -> embeddingMode,
      "dimensions" -> dimensions,
      "passage_count" -> passageCount,
      "is_recompute" -> isRecompute,
      "is_pruned" -> isPruned,
      "query_prompt_template" -> queryPromptTemplate,
      "build_prompt_template" -> buildPromptTemplate))
}

object IndexMeta {
  /** Parse the sidecar through the shared [[graft.util.Json]] parser —
    * one escape/unescape implementation for the whole engine. Missing
    * keys default (serde-style) rather than fail. */
  def fromJson(json: String): IndexMeta = {
    val m = graft.util.Json.parseObject(json)
    def str(k: String): String = m.get(k).map(String.valueOf).getOrElse("")
    def num(k: String): Long = m.get(k).collect { case l: Long => l }.getOrElse(0L)
    def bool(k: String): Boolean = m.get(k).contains(true)
    IndexMeta(num("version").toInt, str("backend_name"), str("embedding_model"),
      str("embedding_mode"), num("dimensions").toInt, num("passage_count"),
      bool("is_recompute"), bool("is_pruned"),
      str("query_prompt_template"), str("build_prompt_template"))
  }
}
