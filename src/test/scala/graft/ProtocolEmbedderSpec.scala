package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.embedding.{GeminiEmbedder, HashEmbedder, OllamaEmbedder}
import graft.pipeline.Index
import graft.util.Json

/** Drives the Ollama `/api/embed` and Gemini `embedContent` /
  * `batchEmbedContents` protocol arms against local stubs that answer
  * [[HashEmbedder]] vectors — so a build→search through either wire
  * protocol must produce exactly the in-process embedder's results
  * (the [[HttpEmbedderSpec]] pattern applied to the reference's other
  * two protocols, `ollama.rs:77-97` and `gemini.rs:145-177`).
  */
class ProtocolEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val hash = new HashEmbedder(16)

  private final class OllamaStub(failFirst: Int = 0) {
    val requests = new AtomicInteger(0)
    private val failures = new AtomicInteger(failFirst)
    @volatile var batchSizes: List[Int] = Nil
    @volatile var truncateTo: Int = 0
    private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/embed", (ex: HttpExchange) => {
      requests.incrementAndGet()
      val body = Json.parseObject(
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val (code, resp) =
        if (failures.getAndDecrement() > 0) (500, """{"error":"transient"}""")
        else {
          val texts = body("input").asInstanceOf[List[Any]].map(_.asInstanceOf[String])
          synchronized { batchSizes = batchSizes :+ texts.length }
          assert(body("model") == "test-model")
          (200, Json.write(Map("embeddings" -> texts.map { t =>
            val full = hash.embedOne(t).map(_.toDouble).toList
            if (truncateTo > 0) full.take(truncateTo) else full
          })))
        }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def host: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("ollama: /api/embed shape, batches of 32, vector order (ref ollama.rs:77-97)") {
    val stub = new OllamaStub()
    try {
      val p = new OllamaEmbedder("test-model", stub.host, dimsIn = 0)
      assert(p.batchSize == 32)
      assert(p.dimensions == 16) // probe resolved them
      val vecs = p.embed((1 to 70).map(i => s"doc $i"))
      assert(vecs.length == 70)
      assert(stub.batchSizes == List(1, 32, 32, 6)) // probe + 70 in 32s
      assert(vecs(0).toSeq == hash.embedOne("doc 1").toSeq)
      assert(vecs(69).toSeq == hash.embedOne("doc 70").toSeq)
    } finally stub.stop()
  }

  test("ollama: per-model dim defaults (ref ollama.rs:41-48); mismatch fails the build") {
    assert(OllamaEmbedder.defaultDims("nomic-embed-text:latest") == 768)
    assert(OllamaEmbedder.defaultDims("all-minilm") == 384)
    assert(OllamaEmbedder.defaultDims("mystery") == 768)
    val stub = new OllamaStub()
    try {
      // stub answers 16-dim vectors; an explicit dims=24 must fail
      // loudly, not store mixed-width vectors
      val p = new OllamaEmbedder("test-model", stub.host, dimsIn = 24)
      val e = intercept[IllegalArgumentException](p.embed(Seq("x")))
      assert(e.getMessage.contains("dimension 16 != expected 24"))
    } finally stub.stop()
  }

  test("ollama: transient 500s retried; dim drift mid-build fails") {
    val stub = new OllamaStub(failFirst = 2)
    try {
      val p = new OllamaEmbedder("test-model", stub.host, dimsIn = 0,
        retryBackoffMs = 1L)
      assert(p.dimensions == 16)
      assert(stub.requests.get() == 3) // 2 failures + 1 success
      stub.truncateTo = 7 // server changes width mid-build
      val e = intercept[IllegalArgumentException](p.embed(Seq("y")))
      assert(e.getMessage.contains("dimension 7 != expected 16"))
    } finally stub.stop()
  }

  private final class GeminiStub {
    @volatile var singleCalls = 0
    @volatile var batchSizes: List[Int] = Nil
    @volatile var sawKey: Option[String] = None
    private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    private def textsOf(reqs: List[Any]): List[String] = reqs.map(r =>
      r.asInstanceOf[Map[String, Any]]("content").asInstanceOf[Map[String, Any]]
        ("parts").asInstanceOf[List[Any]].head.asInstanceOf[Map[String, Any]]
        ("text").asInstanceOf[String])
    server.createContext("/v1beta/models/", (ex: HttpExchange) => {
      val uri = ex.getRequestURI.toString
      sawKey = uri.split("\\?key=", 2).lift(1)
      val body = Json.parseObject(
        new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val resp =
        if (uri.contains(":embedContent")) {
          singleCalls += 1
          val t = textsOf(List(body)).head
          assert(body("model") == "models/gem-test")
          Json.write(Map("embedding" ->
            Map("values" -> hash.embedOne(t).map(_.toDouble).toList)))
        } else {
          val texts = textsOf(body("requests").asInstanceOf[List[Any]])
          synchronized { batchSizes = batchSizes :+ texts.length }
          Json.write(Map("embeddings" -> texts.map(t =>
            Map("values" -> hash.embedOne(t).map(_.toDouble).toList))))
        }
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("gemini: single via embedContent, batches of 100 via batchEmbedContents, key in query (ref gemini.rs:111-180)") {
    val stub = new GeminiStub()
    try {
      val p = new GeminiEmbedder("gem-test", apiKey = "gk-test", baseUrl = stub.base)
      assert(p.batchSize == 100)
      assert(p.dimensions == 16) // probe goes through the single arm
      assert(stub.singleCalls == 1)
      val vecs = p.embed((1 to 230).map(i => s"doc $i"))
      assert(vecs.length == 230)
      assert(stub.batchSizes == List(100, 100, 30))
      assert(stub.sawKey.contains("gk-test"))
      assert(vecs(0).toSeq == hash.embedOne("doc 1").toSeq)
      assert(vecs(229).toSeq == hash.embedOne("doc 230").toSeq)
    } finally stub.stop()
  }

  test("build→search parity: both protocol arms reproduce HashEmbedder results") {
    val docs = Seq(
      ("spark shuffles data between executors", "spark.md"),
      ("vector indexes answer similarity queries", "vec.md"),
      ("bm25 ranks by term statistics", "bm25.md")).toDF("text", "source")
    def searchIds(p: graft.embedding.EmbeddingProvider): Seq[(String, Double)] = {
      val dir = Files.createTempDirectory("graft-proto").toString + "/idx"
      Index.build(docs, dir, p, strategy = "simple")
      Index.search(spark, dir, "how does spark shuffle", p, 3)
        .select("id", "score").as[(String, Double)].collect().toSeq
    }
    val expected = searchIds(hash)
    val os = new OllamaStub()
    try assert(searchIds(new OllamaEmbedder("test-model", os.host, dimsIn = 0)) == expected)
    finally os.stop()
    val gs = new GeminiStub()
    try assert(searchIds(new GeminiEmbedder("gem-test", "gk", baseUrl = gs.base)) == expected)
    finally gs.stop()
  }
}
