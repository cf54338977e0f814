package graft

import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.embedding.HashEmbedder
import graft.pipeline.Index
import graft.serve.SearchServer

class ServerSpec extends SparkSpec {
  import spark.implicits._

  private def http(method: String, url: String, body: Option[String] = None): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    (code, new String(is.readAllBytes(), StandardCharsets.UTF_8))
  }

  test("serve: health, info, indexes, search (ref serve.rs contract)") {
    val wh = Files.createTempDirectory("graft-serve").toString
    val provider = new HashEmbedder(16)
    Index.build(Seq(
      ("vector search with embeddings", "a.md"),
      ("spark shuffle mechanics", "b.md")).toDF("text", "source"),
      s"$wh/main", provider, strategy = "simple")

    val srv = new SearchServer(spark, wh, "main", provider)
    srv.start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    try {
      assert(http("GET", s"$base/health")._2.contains("ok"))
      assert(http("GET", s"$base/info")._2.contains("hash-embedder-16"))
      assert(http("GET", s"$base/indexes")._2.contains("\"main\""))

      // alpha=0.1: BM25 dominates, so the keyword-matching doc must win
      // (the hash embedder's vector side is content-random)
      val (code, body) = http("POST", s"$base/search",
        Some("""{"query":"vector embeddings","top_k":1,"hybrid":true,"alpha":0.1}"""))
      assert(code == 200)
      assert(body.contains("\"results\"") && body.contains("a.md"))
      assert(body.contains("took_ms"))

      // error paths
      assert(http("GET", s"$base/search")._1 == 405)
      assert(http("POST", s"$base/search", Some("{}"))._1 == 400)
    } finally srv.stop()
  }
}
