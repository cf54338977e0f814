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

  def toJson: String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    s"""{"version":$version,"backend_name":${q(backendName)},""" +
      s""""embedding_model":${q(embeddingModel)},"embedding_mode":${q(embeddingMode)},""" +
      s""""dimensions":$dimensions,"passage_count":$passageCount,""" +
      s""""is_recompute":$isRecompute,"is_pruned":$isPruned,""" +
      s""""query_prompt_template":${q(queryPromptTemplate)},""" +
      s""""build_prompt_template":${q(buildPromptTemplate)}}"""
  }
}

object IndexMeta {
  /** Minimal JSON field extraction for our own sidecar format (flat
    * object, no nesting). */
  def fromJson(json: String): IndexMeta = {
    // Single-pass unescape mirroring toJson's escaping (\" \\ \n \r \t
    // \uXXXX). Chained .replace calls would mis-handle sequences like a
    // literal backslash followed by 'n'.
    def unescape(s: String): String = {
      val b = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => b += '\n'; i += 2
            case 'r' => b += '\r'; i += 2
            case 't' => b += '\t'; i += 2
            case 'u' if i + 5 < s.length =>
              b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case other => b += other; i += 2
          }
        } else { b += c; i += 1 }
      }
      b.result()
    }
    def str(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
        .findFirstMatchIn(json)
      m.map(m0 => unescape(m0.group(1))).getOrElse("")
    }
    def num(k: String): Long = ("\"" + k + "\"\\s*:\\s*(-?\\d+)").r
      .findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    def bool(k: String): Boolean = ("\"" + k + "\"\\s*:\\s*(true|false)").r
      .findFirstMatchIn(json).exists(_.group(1) == "true")
    IndexMeta(num("version").toInt, str("backend_name"), str("embedding_model"),
      str("embedding_mode"), num("dimensions").toInt, num("passage_count"),
      bool("is_recompute"), bool("is_pruned"),
      str("query_prompt_template"), str("build_prompt_template"))
  }
}
