package graft.llm

import java.nio.charset.StandardCharsets

import graft.util.Json

/** Real HTTP LLM providers behind [[LlmProvider]], mirroring the
  * reference's dispatch (`src/llm/mod.rs:11-69`: Ollama / OpenAI /
  * Anthropic / Simulated) and each client's request shape. LLM calls
  * are driver-side service I/O in the RAG layer — never a data-plane
  * operator — so a plain blocking `HttpURLConnection` is the right
  * weight (same dependency-free stance as
  * [[graft.embedding.HttpEmbedder]]).
  *
  * Beyond the reference (its clients fail on the first error):
  * transient failures — connect/read errors, HTTP 429/5xx — are
  * retried with exponential backoff; other 4xx (bad model, bad auth)
  * fail immediately as caller bugs.
  */
abstract class HttpLlm(maxRetries: Int, retryBackoffMs: Long, timeoutMs: Int)
    extends LlmProvider {

  /** (header name, value) pairs added to every request. */
  protected def headers: Seq[(String, String)]

  protected final def postWithRetry(url: String, body: String): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt <= maxRetries) {
      if (attempt > 0)
        Thread.sleep(retryBackoffMs * (1L << (attempt - 1))) // 100, 200, 400...
      try {
        return postOnce(url, body)
      } catch {
        case e: HttpLlm.RetryableError => lastErr = e
        case e: java.io.IOException => lastErr = e
      }
      attempt += 1
    }
    throw new RuntimeException(
      s"LLM request failed after ${maxRetries + 1} attempts: ${lastErr.getMessage}",
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
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
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
          throw new HttpLlm.RetryableError(s"HTTP $code: $err")
        throw new RuntimeException(s"LLM request rejected (HTTP $code): $err")
      }
    } finally conn.disconnect()
  }
}

object HttpLlm {
  private[llm] final class RetryableError(msg: String) extends RuntimeException(msg)
}

/** OpenAI-compatible chat-completions client (ref `src/llm/openai.rs`):
  * POSTs `{model, messages:[{role:"user",content}], max_tokens}` to
  * `<baseUrl>/chat/completions` and reads
  * `choices[0].message.content` (missing content → empty string, the
  * reference's `unwrap_or_default`). Works against any
  * OpenAI-compatible server (vLLM, llama.cpp, LM Studio, …).
  */
final class OpenAiLlm(val modelName: String, baseUrl: String,
                      apiKey: Option[String] = None, maxTokens: Int = 1000,
                      maxRetries: Int = 3, retryBackoffMs: Long = 100L,
                      timeoutMs: Int = 60000)
    extends HttpLlm(maxRetries, retryBackoffMs, timeoutMs) {

  override protected def headers: Seq[(String, String)] =
    apiKey.map(k => "Authorization" -> s"Bearer $k").toSeq

  override def generate(prompt: String): String = {
    val body = Json.write(Map(
      "model" -> modelName,
      "messages" -> List(Map("role" -> "user", "content" -> prompt)),
      "max_tokens" -> maxTokens.toLong))
    val resp = Json.parseObject(
      postWithRetry(s"${baseUrl.stripSuffix("/")}/chat/completions", body))
    resp.get("choices").collect { case cs: List[Any] @unchecked if cs.nonEmpty =>
      cs.head.asInstanceOf[Map[String, Any]]
        .get("message").collect { case m: Map[String, Any] @unchecked =>
          m.get("content").collect { case s: String => s }.getOrElse("")
        }.getOrElse("")
    }.getOrElse("")
  }
}

/** Ollama `/api/generate` client (ref `src/llm/ollama.rs`): POSTs
  * `{model, prompt, stream:false}` and concatenates the `response`
  * field of every JSON object in the reply — the reference parses the
  * body line-by-line so both the single-object `stream:false` reply
  * and a streaming-style NDJSON body work, stopping at `done:true`;
  * unparseable lines are skipped (ollama.rs `if let Ok(resp)`).
  */
final class OllamaLlm(val modelName: String,
                      host: String = "http://localhost:11434",
                      maxRetries: Int = 3, retryBackoffMs: Long = 100L,
                      timeoutMs: Int = 60000)
    extends HttpLlm(maxRetries, retryBackoffMs, timeoutMs) {

  override protected def headers: Seq[(String, String)] = Seq.empty

  override def generate(prompt: String): String = {
    val body = Json.write(Map(
      "model" -> modelName, "prompt" -> prompt, "stream" -> false))
    val text = postWithRetry(s"${host.stripSuffix("/")}/api/generate", body)
    val full = new StringBuilder
    var done = false
    for (line <- text.linesIterator if !done && line.nonEmpty) {
      try {
        val obj = Json.parseObject(line)
        obj.get("response").collect { case s: String => full ++= s }
        if (obj.get("done").contains(true)) done = true
      } catch { case _: Exception => } // skip non-JSON lines
    }
    full.result()
  }
}

/** Anthropic Messages API client (ref `src/llm/anthropic.rs:72-109`):
  * POSTs `{model, max_tokens, messages:[{role:"user",content}]}` to
  * `<baseUrl>/v1/messages` with `x-api-key` + `anthropic-version`
  * headers, and joins the text of every `type:"text"` content block.
  */
final class AnthropicLlm(val modelName: String,
                         baseUrl: String = "https://api.anthropic.com",
                         apiKey: Option[String] = None, maxTokens: Int = 1000,
                         maxRetries: Int = 3, retryBackoffMs: Long = 100L,
                         timeoutMs: Int = 60000)
    extends HttpLlm(maxRetries, retryBackoffMs, timeoutMs) {

  override protected def headers: Seq[(String, String)] =
    apiKey.map(k => "x-api-key" -> k).toSeq :+
      ("anthropic-version" -> "2023-06-01")

  override def generate(prompt: String): String = {
    val body = Json.write(Map(
      "model" -> modelName,
      "max_tokens" -> maxTokens.toLong,
      "messages" -> List(Map("role" -> "user", "content" -> prompt))))
    val resp = Json.parseObject(
      postWithRetry(s"${baseUrl.stripSuffix("/")}/v1/messages", body))
    resp.get("content").collect { case blocks: List[Any] @unchecked =>
      blocks.iterator.map(_.asInstanceOf[Map[String, Any]])
        .filter(_.get("type").contains("text"))
        .flatMap(_.get("text").collect { case s: String => s })
        .mkString("")
    }.getOrElse("")
  }
}
