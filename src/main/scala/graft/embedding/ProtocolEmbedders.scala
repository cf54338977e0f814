package graft.embedding

import java.nio.charset.StandardCharsets

import graft.util.Json

/** Ollama and Gemini embedding protocol arms behind
  * [[EmbeddingProvider]] — the two non-OpenAI wire protocols the
  * reference speaks (`src/embedding/ollama.rs:77-97`,
  * `src/embedding/gemini.rs:145-177`). Same stance as [[HttpEmbedder]]:
  * dependency-free `HttpURLConnection`, retry/backoff on transient
  * failures (429/5xx/IO — beyond the reference, which fails on the
  * first error), construction-time dimension probe when dims are
  * unknown, and per-vector dimension enforcement so a server answering
  * the wrong width fails the build instead of corrupting the index.
  */
private[embedding] abstract class ProtocolEmbedder(
    maxRetries: Int, retryBackoffMs: Long, timeoutMs: Int)
    extends EmbeddingProvider {

  protected def dims: Int

  /** The width every response vector is validated against. Self-priming
    * (0 until the first vector or explicit dims arrives) because an
    * eager superclass val would run before the subclass fields it needs
    * are initialized — the classic Scala init-order trap. */
  private var enforcedDims: Int = 0

  /** Explicit dims win; else one probe request resolves them (ref
    * `detect_dimensions`, openai.rs:63-71 — Gemini/Ollama arms get the
    * same robustness here). */
  override lazy val dimensions: Int =
    if (enforcedDims > 0) enforcedDims
    else if (dims > 0) { enforcedDims = dims; dims }
    else { embed(Seq("test")); enforcedDims }

  protected final def checkDims(vec: Array[Float]): Array[Float] = {
    if (enforcedDims <= 0) enforcedDims = if (dims > 0) dims else vec.length
    require(vec.length == enforcedDims,
      s"embedding response dimension ${vec.length} != expected $enforcedDims " +
      s"for model '$modelName'")
    vec
  }

  protected final def toFloats(raw: List[Any]): Array[Float] =
    checkDims(raw.map {
      case d: java.lang.Double => d.toFloat
      case l: java.lang.Long => l.toFloat
      case other => other.toString.toFloat
    }.toArray)

  protected final def postWithRetry(url: String, body: String): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0)
        Thread.sleep(retryBackoffMs * (1L << (attempt - 1))) // 100, 200, 400...
      try {
        return postOnce(url, body)
      } catch {
        case e: ProtocolEmbedder.RetryableError => lastErr = e
        case e: java.io.IOException => lastErr = e
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"embedding request failed after ${maxRetries + 1} attempts: ${lastErr.getMessage}",
      lastErr)
  }

  private def postOnce(url: String, body: String): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      conn.setFixedLengthStreamingMode(bytes.length)
      val out = conn.getOutputStream
      try out.write(bytes) finally out.close()
      val code = conn.getResponseCode
      if (code == 200) {
        val in = conn.getInputStream
        try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      } else {
        val err = Option(conn.getErrorStream)
          .map(s => try new String(s.readAllBytes(), StandardCharsets.UTF_8) finally s.close())
          .getOrElse("")
        if (code == 429 || code >= 500)
          throw new ProtocolEmbedder.RetryableError(s"HTTP $code: $err")
        throw new RuntimeException(s"embedding request rejected (HTTP $code): $err")
      }
    } finally conn.disconnect()
  }
}

private[embedding] object ProtocolEmbedder {
  final class RetryableError(msg: String) extends RuntimeException(msg)
}

/** Ollama `/api/embed` client (ref `ollama.rs:70-101`): POSTs
  * `{model, input:[...]}` in batches of 32 (the Ollama recommendation
  * the reference codifies) and reads `{embeddings:[[...],...]}`.
  * Host resolution mirrors the reference: explicit > $GRAFT_OLLAMA_HOST
  * > $OLLAMA_HOST > localhost:11434. Dims: explicit, else the
  * reference's per-model defaults (ollama.rs:41-48), else probe —
  * `dims = 0` forces the probe.
  */
final class OllamaEmbedder(val modelName: String,
                           host: String = OllamaEmbedder.defaultHost,
                           dimsIn: Int = -1,
                           maxRetries: Int = 3, retryBackoffMs: Long = 100L,
                           timeoutMs: Int = 30000)
    extends ProtocolEmbedder(maxRetries, retryBackoffMs, timeoutMs) {

  override val batchSize: Int = 32

  override protected def dims: Int =
    if (dimsIn >= 0) dimsIn else OllamaEmbedder.defaultDims(modelName)

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    if (texts.isEmpty) Seq.empty
    else texts.grouped(batchSize).flatMap { batch =>
      val body = Json.write(Map("model" -> modelName, "input" -> batch))
      val resp = Json.parseObject(
        postWithRetry(s"${host.stripSuffix("/")}/api/embed", body))
      val vecs = resp("embeddings").asInstanceOf[List[Any]]
        .map(v => toFloats(v.asInstanceOf[List[Any]]))
      require(vecs.size == batch.size,
        s"embedding response has ${vecs.size} vectors for ${batch.size} inputs")
      vecs
    }.toSeq
}

object OllamaEmbedder {
  def defaultHost: String =
    sys.env.get("GRAFT_OLLAMA_HOST").orElse(sys.env.get("OLLAMA_HOST"))
      .getOrElse("http://localhost:11434")

  /** The reference's per-model dim defaults (ollama.rs:41-48). */
  def defaultDims(modelName: String): Int =
    modelName.split(':').headOption.getOrElse(modelName) match {
      case "nomic-embed-text" => 768
      case "mxbai-embed-large" => 1024
      case "all-minilm" => 384
      case "bge-m3" => 1024
      case "snowflake-arctic-embed" => 1024
      case _ => 768
    }
}

/** Gemini embedding client (ref `gemini.rs:111-180`): one text goes to
  * `models/<m>:embedContent`, several to `models/<m>:batchEmbedContents`
  * in batches of 100 (the Gemini batch limit), both keyed by
  * `?key=<api key>`. Request rows are
  * `{model:"models/<m>", content:{parts:[{text}]}}`; responses carry
  * `embedding.values` / `embeddings[].values`.
  */
final class GeminiEmbedder(val modelName: String,
                           apiKey: String,
                           baseUrl: String = "https://generativelanguage.googleapis.com",
                           dimsIn: Int = 0,
                           maxRetries: Int = 3, retryBackoffMs: Long = 100L,
                           timeoutMs: Int = 30000)
    extends ProtocolEmbedder(maxRetries, retryBackoffMs, timeoutMs) {

  override val batchSize: Int = 100

  override protected def dims: Int = dimsIn

  private def modelPath: String =
    s"${baseUrl.stripSuffix("/")}/v1beta/models/$modelName"

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    if (texts.isEmpty) Seq.empty
    // the reference routes a single text through embedContent
    // (gemini.rs:102-108) — keep that shape so stubs/proxies built for
    // it see the same traffic
    else if (texts.size == 1) {
      val body = Json.write(Map(
        "model" -> s"models/$modelName",
        "content" -> Map("parts" -> List(Map("text" -> texts.head)))))
      val resp = Json.parseObject(
        postWithRetry(s"$modelPath:embedContent?key=$apiKey", body))
      Seq(toFloats(resp("embedding").asInstanceOf[Map[String, Any]]("values")
        .asInstanceOf[List[Any]]))
    } else texts.grouped(batchSize).flatMap { batch =>
      val body = Json.write(Map("requests" -> batch.map(t => Map(
        "model" -> s"models/$modelName",
        "content" -> Map("parts" -> List(Map("text" -> t))))).toList))
      val resp = Json.parseObject(
        postWithRetry(s"$modelPath:batchEmbedContents?key=$apiKey", body))
      val vecs = resp("embeddings").asInstanceOf[List[Any]]
        .map(e => toFloats(e.asInstanceOf[Map[String, Any]]("values")
          .asInstanceOf[List[Any]]))
      require(vecs.size == batch.size,
        s"embedding response has ${vecs.size} vectors for ${batch.size} inputs")
      vecs
    }.toSeq
}
