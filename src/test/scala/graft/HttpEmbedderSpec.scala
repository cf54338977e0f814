package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.embedding.{HashEmbedder, HttpEmbedder}
import graft.pipeline.Index
import graft.util.Json

/** Drives the HTTP embedding provider against a local stub that speaks
  * the OpenAI-compatible embeddings API and answers with
  * [[HashEmbedder]] vectors — so a build→search through HTTP must
  * produce exactly the results of the in-process embedder, fully
  * offline (the integration test the reference cannot write for its
  * own HTTP clients). */
class HttpEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private val hash = new HashEmbedder(16)

  /** Stub server: counts requests, records batch sizes, optionally
    * fails the first `failFirst` requests with HTTP 500. */
  private final class Stub(failFirst: Int = 0) {
    val requests = new AtomicInteger(0)
    val failures = new AtomicInteger(failFirst)
    @volatile var batchSizes: List[Int] = Nil
    @volatile var sawAuth: Option[String] = None
    /** >0: serve only the first N components — simulates a server that
      * changes response dimensionality mid-build. */
    @volatile var truncateTo: Int = 0

    private val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings", (ex: HttpExchange) => {
      requests.incrementAndGet()
      sawAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (failures.getAndDecrement() > 0) {
        val err = """{"error":"transient"}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(500, err.length)
        ex.getResponseBody.write(err)
      } else {
        val texts = Json.parseObject(body)("input").asInstanceOf[List[Any]]
          .map(_.asInstanceOf[String])
        synchronized { batchSizes = batchSizes :+ texts.length }
        val data = texts.zipWithIndex.map { case (t, i) =>
          val full = hash.embedOne(t).map(_.toDouble).toList
          val vec = if (truncateTo > 0) full.take(truncateTo) else full
          Map("index" -> i.toLong, "embedding" -> vec)
        }
        val resp = Json.write(Map("data" -> data)).getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp)
      }
      ex.close()
    })
    server.start()
    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}/v1"
    def stop(): Unit = server.stop(0)
  }

  test("dim probe, batching at 100, auth header (ref openai.rs:63-104)") {
    val stub = new Stub()
    try {
      val p = new HttpEmbedder("test-model", stub.base, apiKey = Some("sk-test"))
      assert(p.dimensions == 16)           // auto-detected via one probe
      assert(stub.requests.get() == 1)
      val vecs = p.embed((1 to 230).map(i => s"doc $i"))
      assert(vecs.length == 230)
      // 230 texts -> batches of 100, 100, 30 after the probe's [1]
      assert(stub.batchSizes == List(1, 100, 100, 30))
      assert(stub.sawAuth.contains("Bearer sk-test"))
      // vectors are exactly the stub's (order preserved)
      assert(vecs(0).toSeq == hash.embedOne("doc 1").toSeq)
      assert(vecs(229).toSeq == hash.embedOne("doc 230").toSeq)
    } finally stub.stop()
  }

  test("response vectors not matching configured dims fail at build time") {
    val stub = new Stub() // serves 16-dim vectors
    try {
      val p = new HttpEmbedder("m", stub.base, dims = 64)
      val e = intercept[IllegalArgumentException] { p.embed(Seq("hello")) }
      assert(e.getMessage.contains("16") && e.getMessage.contains("64"))
    } finally stub.stop()
  }

  test("auto-probed dims are enforced on every later batch") {
    // dims=0: the probe's answer (16) becomes the enforced value, so a
    // server that changes dimensionality mid-build fails the build
    // instead of storing mixed-length vectors.
    val stub = new Stub()
    try {
      val p = new HttpEmbedder("m", stub.base, dims = 0)
      assert(p.dimensions == 16)
      assert(p.embed(Seq("ok")).head.length == 16)
      stub.truncateTo = 8
      val e = intercept[IllegalArgumentException] { p.embed(Seq("drifted")) }
      assert(e.getMessage.contains("8") && e.getMessage.contains("16"))
    } finally stub.stop()
  }

  test("transient 500s are retried; hard 4xx is not") {
    val stub = new Stub(failFirst = 2)
    try {
      val p = new HttpEmbedder("m", stub.base, dims = 16, retryBackoffMs = 1L)
      val v = p.embed(Seq("hello"))      // 2 failures then success
      assert(v.head.toSeq == hash.embedOne("hello").toSeq)
      assert(stub.requests.get() == 3)
    } finally stub.stop()

    val exhausted = new Stub(failFirst = 99)
    try {
      val p = new HttpEmbedder("m", exhausted.base, dims = 16,
        maxRetries = 2, retryBackoffMs = 1L)
      val e = intercept[RuntimeException] { p.embed(Seq("x")) }
      assert(e.getMessage.contains("after 3 attempts"))
      assert(exhausted.requests.get() == 3)
    } finally exhausted.stop()
  }

  test("build -> search through HTTP equals the in-process embedder") {
    val stub = new Stub()
    try {
      val p = new HttpEmbedder("hash-embedder-16", stub.base, dims = 16)
      val docs = Seq(
        ("vector databases store embeddings", "a.md"),
        ("spark shuffles between executors", "b.md"),
        ("parquet stores columns", "c.md")).toDF("text", "source")
      val wh = Files.createTempDirectory("graft-http").toString
      Index.build(docs, s"$wh/viaHttp", p, strategy = "simple")
      Index.build(docs, s"$wh/viaHash", hash, strategy = "simple")
      def results(idx: String) =
        Index.search(spark, s"$wh/$idx", "spark shuffle", p, topK = 3)
          .collect().map(_.toString).toSeq
      assert(results("viaHttp") == results("viaHash"))
      assert(stub.requests.get() > 0)
    } finally stub.stop()
  }
}
