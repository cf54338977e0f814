package graft.embedding

/** Embedding provider abstraction (ref `src/embedding/mod.rs:112-120`):
  * a batch of texts in, one dense f32 vector per text out. Providers are
  * injected into `mapPartitions` with explicit batching — the Spark
  * analog of the reference's 32/100-text HTTP batches. Remote providers
  * (OpenAI/Ollama/Gemini in the reference) are I/O clients behind this
  * same trait; the deterministic [[HashEmbedder]] is the test/default
  * implementation (the reference has no offline embedder at all, which
  * is why it cannot integration-test its own build, SURVEY §5).
  */
trait EmbeddingProvider extends Serializable {
  def modelName: String
  def dimensions: Int
  def embed(texts: Seq[String]): Seq[Array[Float]]

  /** Batch size for mapPartitions grouping (ref: 100 for OpenAI/Gemini,
    * 32 for Ollama/local). */
  def batchSize: Int = 100

  /** Asymmetric-model prompt templating
    * (ref `embed_with_template`, mod.rs:126-144). */
  def embedWithTemplate(texts: Seq[String], template: String): Seq[Array[Float]] =
    embed(texts.map(t => template + t))
}

/** Deterministic, seedable text embedder: dimension i of the vector is a
  * pseudo-random value derived from murmur-style mixing of the text hash
  * and i, L2-normalized. Same text → same vector on any executor, any
  * engine, no network. */
final class HashEmbedder(val dimensions: Int = 64, seed: Long = 42L) extends EmbeddingProvider {
  override def modelName: String = s"hash-embedder-$dimensions"
  override def batchSize: Int = 100

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def embedOne(text: String): Array[Float] = {
    val base = mix(seed ^ text.hashCode.toLong)
    val v = new Array[Float](dimensions)
    var i = 0
    var norm = 0.0
    while (i < dimensions) {
      val h = mix(base + i)
      val x = (h.toDouble / Long.MaxValue) // in [-1, 1]
      v(i) = x.toFloat
      norm += x * x
      i += 1
    }
    val n = math.sqrt(norm)
    if (n > 1e-12) {
      i = 0
      while (i < dimensions) { v(i) = (v(i) / n).toFloat; i += 1 }
    }
    v
  }

  override def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map(embedOne)
}

/** Model registry (ref `src/embedding/models.rs:33-125`): per-model
  * document/query prefixes, normalization flag, and dimensionality.
  * Version tags (`:latest`) are stripped before lookup. */
object ModelRegistry {
  final case class ModelConfig(documentPrefix: String, queryPrefix: String,
      normalized: Boolean, dimensions: Int)

  val default: ModelConfig = ModelConfig("", "", normalized = false, 768)

  def getModelConfig(modelName: String): ModelConfig = {
    val base = modelName.split(':').headOption.getOrElse(modelName)
    base match {
      case "nomic-embed-text" | "nomic-embed-text-v1" | "nomic-embed-text-v1.5"
           | "text-embedding-nomic-embed-text-v1.5" =>
        ModelConfig("search_document: ", "search_query: ", normalized = true, 768)
      case "mxbai-embed-large" | "mxbai-embed-large-v1" =>
        ModelConfig("Represent this document for retrieval: ",
          "Represent this sentence for searching relevant passages: ",
          normalized = true, 1024)
      case "bge-small-en" | "bge-base-en" | "bge-large-en"
           | "bge-small-en-v1.5" | "bge-base-en-v1.5" | "bge-large-en-v1.5" =>
        ModelConfig("",
          "Represent this sentence for searching relevant passages: ",
          normalized = true,
          if (base.contains("small")) 384 else if (base.contains("large")) 1024 else 768)
      case "e5-small" | "e5-base" | "e5-large"
           | "e5-small-v2" | "e5-base-v2" | "e5-large-v2"
           | "multilingual-e5-small" | "multilingual-e5-base" | "multilingual-e5-large" =>
        ModelConfig("passage: ", "query: ", normalized = true,
          if (base.contains("small")) 384 else if (base.contains("large")) 1024 else 768)
      case "gte-small" | "gte-base" | "gte-large" =>
        ModelConfig("", "", normalized = true,
          if (base.contains("small")) 384 else if (base.contains("large")) 1024 else 768)
      case "all-minilm" | "all-MiniLM-L6-v2" | "all-MiniLM-L12-v2" =>
        ModelConfig("", "", normalized = true, 384)
      case "text-embedding-3-small" => ModelConfig("", "", normalized = true, 1536)
      case "text-embedding-3-large" => ModelConfig("", "", normalized = true, 3072)
      case "text-embedding-ada-002" => ModelConfig("", "", normalized = true, 1536)
      case _ => default
    }
  }
}
