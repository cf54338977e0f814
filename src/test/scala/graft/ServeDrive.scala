package graft

import org.apache.spark.sql.SparkSession

/** Manual drive harness for the HTTP server (run via Test/runMain). */
object ServeDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-drive").toString
    val provider = new graft.embedding.HashEmbedder(16)
    graft.pipeline.Index.build(Seq(
      ("vector search with embeddings", "a.md"),
      ("spark shuffle mechanics", "b.md"),
      ("hnsw graph walk", "c.md")).toDF("text", "source"),
      s"$wh/main", provider, strategy = "simple")
    val srv = new graft.serve.SearchServer(spark, wh, "main", provider, port = 18437)
    srv.start()
    println("SERVER_UP " + srv.boundPort)
    import scala.sys.process._
    println("HEALTH: " + "curl -s http://127.0.0.1:18437/health".!!)
    println("INFO: " + "curl -s http://127.0.0.1:18437/info".!!)
    println("INDEXES: " + "curl -s http://127.0.0.1:18437/indexes".!!)
    println("SEARCH: " + Seq("curl", "-s", "-X", "POST", "http://127.0.0.1:18437/search",
      "-d", """{"query":"spark shuffle","top_k":2,"hybrid":true,"alpha":0.2}""").!!)
    println("BADBODY: " + Seq("curl", "-s", "-X", "POST", "http://127.0.0.1:18437/search",
      "-d", "not json at all").!!)
    println("GARBAGEFILTER: " + Seq("curl", "-s", "-X", "POST", "http://127.0.0.1:18437/search",
      "-d", """{"query":"spark","filter":"]][[~~garbage"}""").!!)
    srv.stop()
    spark.stop()
  }
}
