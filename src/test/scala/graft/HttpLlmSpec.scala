package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.embedding.HashEmbedder
import graft.llm.{AnthropicLlm, LlmProvider, OllamaLlm, OpenAiLlm, Rag, ReactAgent, SimulatedLlm}
import graft.pipeline.Index
import graft.util.Json

/** Drives the HTTP LLM providers against local stub servers speaking
  * the OpenAI chat-completions, Ollama `/api/generate`, and Anthropic
  * Messages protocols (ref `src/llm/openai.rs`, `ollama.rs`,
  * `anthropic.rs:72-109`) — the offline integration test the
  * reference cannot write for its own clients. Mirrors
  * [[HttpEmbedderSpec]]'s stub-server pattern.
  */
class HttpLlmSpec extends SparkSpec {
  import spark.implicits._

  /** One-route stub: records request bodies/headers, optionally fails
    * the first `failFirst` requests with HTTP 500, answers with
    * `respond(parsedBody)`. */
  private final class Stub(route: String, failFirst: Int = 0)
                          (respond: Map[String, Any] => String) {
    val requests = new AtomicInteger(0)
    private val failures = new AtomicInteger(failFirst)
    @volatile var lastBody: Map[String, Any] = Map.empty
    @volatile var lastHeaders: Map[String, String] = Map.empty

    private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext(route, (ex: HttpExchange) => {
      requests.incrementAndGet()
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      lastBody = Json.parseObject(body)
      lastHeaders = Seq("Authorization", "x-api-key", "anthropic-version")
        .flatMap(h => Option(ex.getRequestHeaders.getFirst(h)).map(h -> _)).toMap
      val (code, resp) =
        if (failures.getAndDecrement() > 0) (500, """{"error":"transient"}""")
        else (200, respond(lastBody))
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def openAiStub(failFirst: Int = 0) =
    new Stub("/v1/chat/completions", failFirst)(body => {
      val prompt = body("messages").asInstanceOf[List[Any]].head
        .asInstanceOf[Map[String, Any]]("content").asInstanceOf[String]
      Json.write(Map("choices" -> List(Map("message" ->
        Map("role" -> "assistant", "content" -> s"openai-answer to: $prompt")))))
    })

  test("openai: chat-completions request shape, auth, response parse (ref openai.rs)") {
    val stub = openAiStub()
    try {
      val llm = new OpenAiLlm("gpt-test", s"${stub.base}/v1", apiKey = Some("sk-test"))
      val out = llm.generate("what is spark")
      assert(out == "openai-answer to: what is spark")
      assert(stub.lastBody("model") == "gpt-test")
      assert(stub.lastBody("max_tokens") == 1000L) // ref's max_tokens(1000)
      val msg = stub.lastBody("messages").asInstanceOf[List[Any]].head
        .asInstanceOf[Map[String, Any]]
      assert(msg("role") == "user" && msg("content") == "what is spark")
      assert(stub.lastHeaders.get("Authorization").contains("Bearer sk-test"))
    } finally stub.stop()
  }

  test("openai: missing content is empty string, not a crash (ref unwrap_or_default)") {
    val stub = new Stub("/v1/chat/completions")(_ =>
      Json.write(Map("choices" -> List(Map("message" -> Map("role" -> "assistant"))))))
    try {
      assert(new OpenAiLlm("m", s"${stub.base}/v1").generate("q") == "")
    } finally stub.stop()
  }

  test("transient 5xx is retried with backoff; 4xx fails fast") {
    val stub = openAiStub(failFirst = 2)
    try {
      val llm = new OpenAiLlm("m", s"${stub.base}/v1", retryBackoffMs = 1L)
      assert(llm.generate("q") == "openai-answer to: q")
      assert(stub.requests.get() == 3) // 2 failures + 1 success
    } finally stub.stop()
    val reject = new Stub("/v1/chat/completions")(_ => "")
    try {
      // 404: the stub has no /wrong route — HttpServer answers 404, no retry
      val llm = new OpenAiLlm("m", s"${reject.base}/wrong", retryBackoffMs = 1L)
      val e = intercept[RuntimeException](llm.generate("q"))
      assert(e.getMessage.contains("404"))
      assert(reject.requests.get() == 0)
    } finally reject.stop()
  }

  test("ollama: /api/generate shape and NDJSON accumulation until done (ref ollama.rs)") {
    // streaming-style body: three chunks, done on the third, trailing junk ignored
    val stub = new Stub("/api/generate")(body => {
      assert(body("stream") == false)
      """{"response":"Spark ","done":false}
        |{"response":"shuffles.","done":true}
        |{"response":"IGNORED after done","done":false}
        |not json at all
        |""".stripMargin
    })
    try {
      val llm = new OllamaLlm("llama-test", stub.base)
      assert(llm.generate("q") == "Spark shuffles.")
      assert(stub.lastBody("model") == "llama-test")
      assert(stub.lastBody("prompt") == "q")
    } finally stub.stop()
    // single-object stream:false reply works through the same parser
    val single = new Stub("/api/generate")(_ =>
      """{"model":"m","response":"single-shot answer","done":true}""")
    try {
      assert(new OllamaLlm("m", single.base).generate("q") == "single-shot answer")
    } finally single.stop()
  }

  test("anthropic: /v1/messages headers and text-block join (ref anthropic.rs:72-109)") {
    val stub = new Stub("/v1/messages")(_ =>
      Json.write(Map("content" -> List(
        Map("type" -> "text", "text" -> "part one, "),
        Map("type" -> "tool_use", "id" -> "t1"), // non-text block skipped
        Map("type" -> "text", "text" -> "part two")))))
    try {
      val llm = new AnthropicLlm("claude-test", stub.base, apiKey = Some("ak-test"))
      assert(llm.generate("q") == "part one, part two")
      assert(stub.lastBody("model") == "claude-test")
      assert(stub.lastBody("max_tokens") == 1000L)
      assert(stub.lastHeaders.get("x-api-key").contains("ak-test"))
      assert(stub.lastHeaders.get("anthropic-version").contains("2023-06-01"))
    } finally stub.stop()
  }

  test("dispatch mirrors the reference factory (ref mod.rs:33-54)") {
    assert(LlmProvider.create("simulated", "m").isInstanceOf[SimulatedLlm])
    assert(LlmProvider.create("openai", "m", baseUrl = Some("http://h/v1"))
      .isInstanceOf[OpenAiLlm])
    assert(LlmProvider.create("ollama", "m").isInstanceOf[OllamaLlm])
    assert(LlmProvider.create("anthropic", "m", apiKey = Some("k"))
      .isInstanceOf[AnthropicLlm])
    intercept[IllegalArgumentException](LlmProvider.create("gemini", "m"))
    // openai with neither key nor base_url is a setup error, caught early
    val oldKey = sys.env.get("OPENAI_API_KEY")
    if (oldKey.isEmpty)
      intercept[IllegalArgumentException](LlmProvider.create("openai", "m"))
  }

  test("ask and react run end-to-end over HTTP (ref ask.rs:157-198, react.rs:88-171)") {
    val dir = Files.createTempDirectory("graft-httprag").toString + "/idx"
    Index.build(Seq(
      ("spark shuffles data between executors", "spark.md"),
      ("vector indexes answer similarity queries", "vec.md")).toDF("text", "source"),
      dir, new HashEmbedder(16), strategy = "simple")

    // ask: the stub proves the retrieved context reached the prompt
    val askStub = new Stub("/v1/chat/completions")(body => {
      val prompt = body("messages").asInstanceOf[List[Any]].head
        .asInstanceOf[Map[String, Any]]("content").asInstanceOf[String]
      assert(prompt.contains("[1]") && prompt.contains("Question:"))
      Json.write(Map("choices" -> List(Map("message" ->
        Map("content" -> "shuffles move data between executors")))))
    })
    try {
      val out = Rag.ask(spark, dir, "how does spark shuffle", new HashEmbedder(16),
        new OpenAiLlm("gpt-test", s"${askStub.base}/v1"), topK = 2)
      assert(out == "shuffles move data between executors")
    } finally askStub.stop()

    // react: scripted over Ollama — search turn, then finish turn
    val turns = new AtomicInteger(0)
    val reactStub = new Stub("/api/generate")(body => {
      val resp =
        if (turns.incrementAndGet() == 1) "Action: search(\"spark shuffle\")"
        else {
          assert(body("prompt").asInstanceOf[String].contains("Observation:"))
          "Action: finish(\"distributed exchange\")"
        }
      Json.write(Map("response" -> resp, "done" -> true))
    })
    try {
      val agent = new ReactAgent(spark, dir, new HashEmbedder(16),
        new OllamaLlm("llama-test", reactStub.base))
      assert(agent.run("what is a shuffle") == "distributed exchange")
    } finally reactStub.stop()
  }
}
