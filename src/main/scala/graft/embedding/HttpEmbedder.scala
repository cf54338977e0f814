package graft.embedding

import java.nio.charset.StandardCharsets

import graft.util.Json

/** OpenAI-compatible HTTP embedding provider
  * (ref `src/embedding/openai.rs`): POSTs `{model, input:[...]}` to
  * `<baseUrl>/embeddings` and reads `{data:[{index, embedding:[...]}]}`.
  *
  * Reference semantics kept: requests are sent in batches of
  * [[batchSize]] (100, the OpenAI limit, openai.rs:89-104); unknown
  * dimensions are auto-detected by embedding one probe text at
  * construction (openai.rs:63-71 `detect_dimensions`). Beyond the
  * reference (its clients fail on the first error): transient failures
  * — connect/read errors, HTTP 429/5xx — are retried up to `maxRetries`
  * times with exponential backoff, because inside `mapPartitions` on a
  * 1000-executor cluster a single flaky request must not fail the whole
  * task (Spark would retry the task and re-embed the entire partition).
  *
  * Serializable and driver-constructed: each executor task holds the
  * probed dimensions; only `embed` calls touch the network.
  * Dependency-free (`HttpURLConnection` + [[graft.util.Json]]) — same
  * stance as the serving layer.
  */
final class HttpEmbedder(val modelName: String, baseUrl: String,
                         apiKey: Option[String] = None, dims: Int = 0,
                         maxRetries: Int = 3, retryBackoffMs: Long = 100L,
                         timeoutMs: Int = 30000) extends EmbeddingProvider {

  override val batchSize: Int = 100

  /** The dimensionality every response vector is validated against.
    * 0 only while the construction-time probe is in flight (any length
    * accepted on the probe itself); the probe's answer then becomes the
    * enforced value, so an auto-probed (dims=0) embedder still fails at
    * build time if the server changes response dimensionality mid-build
    * instead of storing mixed-length vectors. */
  private var enforcedDims: Int = dims

  /** Probed once at construction when unknown (reference behavior). */
  override val dimensions: Int = {
    val d = if (dims > 0) dims else embed(Seq("test")).head.length
    enforcedDims = d
    d
  }

  /** Expected dims are enforced on every response vector — a model
    * answering 1536-dim vectors against a 64-dim index must fail at
    * build time, not store vectors that disagree with the index meta and
    * blow up (or silently truncate) at query time. */
  private def checkDims(vec: Array[Float]): Array[Float] = {
    require(enforcedDims <= 0 || vec.length == enforcedDims,
      s"embedding response dimension ${vec.length} != expected $enforcedDims " +
      s"for model '$modelName'")
    vec
  }

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    if (texts.isEmpty) Seq.empty
    else texts.grouped(batchSize).flatMap(embedBatch).toSeq

  private def embedBatch(batch: Seq[String]): Seq[Array[Float]] = {
    val body = Json.write(Map("model" -> modelName, "input" -> batch))
    val resp = postWithRetry(body)
    val data = Json.parseObject(resp)("data").asInstanceOf[List[Any]]
    // defensive: order by the response's index field, not list position
    val byIndex = data.map { d =>
      val m = d.asInstanceOf[Map[String, Any]]
      val idx = m("index").asInstanceOf[Long].toInt
      val vec = m("embedding").asInstanceOf[List[Any]]
        .map {
          case d: java.lang.Double => d.toFloat
          case l: java.lang.Long => l.toFloat
          case other => other.toString.toFloat
        }.toArray
      idx -> checkDims(vec)
    }.toMap
    require(byIndex.size == batch.size,
      s"embedding response has ${byIndex.size} vectors for ${batch.size} inputs")
    batch.indices.map(byIndex)
  }

  private def postWithRetry(body: String): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0)
        Thread.sleep(retryBackoffMs * (1L << (attempt - 1))) // 100, 200, 400...
      try {
        return postOnce(body)
      } catch {
        case e: HttpEmbedder.RetryableError => lastErr = e
        case e: java.io.IOException => lastErr = e
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"embedding request failed after ${maxRetries + 1} attempts: ${lastErr.getMessage}",
      lastErr)
  }

  private def postOnce(body: String): String = {
    val url = java.net.URI.create(s"${baseUrl.stripSuffix("/")}/embeddings").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/json")
      apiKey.foreach(k => conn.setRequestProperty("Authorization", s"Bearer $k"))
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
          throw new HttpEmbedder.RetryableError(s"HTTP $code: $err")
        // 4xx other than 429 is a caller bug (bad model, bad auth): no retry
        throw new RuntimeException(s"embedding request rejected (HTTP $code): $err")
      }
    } finally conn.disconnect()
  }
}

object HttpEmbedder {
  private final class RetryableError(msg: String) extends RuntimeException(msg)
}
