package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.embedding.HashEmbedder
import graft.pipeline.Index
import graft.serve.SearchServer

/** Per-request serving latency probe (Test/runMain): builds an index
  * over the sf0.001 documents table, starts the Spark-path server and
  * the warm-tier server on the same index, fires N sequential /search
  * requests at each, and prints p50/p95/p99 wall-clock per tier —
  * the numbers BASELINE.md's serving paragraph records. The warm tier
  * is the latency answer to the reference's in-process index walk
  * (ms-scale); the Spark path pays the per-job scheduler floor and is
  * the batch-parity tier. */
object ServeLatencyDrive {

  // java.net.http.HttpClient, not URLConnection: the legacy client
  // writes small POSTs as separate header/body packets with no
  // TCP_NODELAY, which interacts with delayed ACKs into a flat ~40 ms
  // per-request floor that measures the CLIENT, not the server (the
  // r12 paragraph had to carry a /health control row to say so). The
  // modern client (keep-alive pool, single write) reads the server's
  // actual cost.
  private val client = HttpClient.newHttpClient()
  private def http(method: String, url: String, body: Option[String]): (Int, String) = {
    val b = HttpRequest.newBuilder(URI.create(url))
    val req = (body match {
      case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def pct(sorted: Array[Double], p: Double): Double =
    sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val n = sys.env.get("SPARK_GRAFT_SERVE_N").map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .appName("graft-serve-latency").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val wh = Files.createTempDirectory("graft-serve-lat").toString
      val provider = new HashEmbedder(64)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("text", "cast(doc_id as string) as source")
      Index.build(docs, s"$wh/main", provider, strategy = "simple")
      val indexDir = Index.locate(wh, "main").get
      Index.buildIvf(spark, indexDir, numClusters = 16)
      Index.buildPq(spark, indexDir, m = 8, k = 16)

      val queries = Array(
        "governance throughput latency", "partition shuffle mechanics",
        "the quick brown document", "training data curation pipeline",
        "embedding similarity search")

      def drive(srv: SearchServer, label: String, extra: String): Unit = {
        val base = s"http://127.0.0.1:${srv.boundPort}"
        // warmup (JIT + first-plan costs are not the steady state)
        (0 until 10).foreach { i =>
          http("POST", s"$base/search",
            Some(s"""{"query":"${queries(i % queries.length)}","top_k":5$extra}"""))
        }
        val lat = (0 until n).map { i =>
          val t0 = System.nanoTime()
          val (code, _) = http("POST", s"$base/search",
            Some(s"""{"query":"${queries(i % queries.length)}","top_k":5$extra}"""))
          require(code == 200, s"request failed: $code")
          (System.nanoTime() - t0) / 1e6
        }.toArray.sorted
        println(f"[serve-latency] $label%-22s n=$n p50=${pct(lat, 0.5)}%8.2f ms  " +
          f"p95=${pct(lat, 0.95)}%8.2f ms  p99=${pct(lat, 0.99)}%8.2f ms")
      }

      val cold = new SearchServer(spark, wh, "main", provider)
      cold.start()
      try {
        drive(cold, "spark-path", "")
        drive(cold, "spark-ann-pq", ""","ann":true""")
      } finally cold.stop()

      val hot = new SearchServer(spark, wh, "main", provider, warm = true)
      hot.start()
      try {
        // /health isolates HTTP+handler overhead from search cost
        val base = s"http://127.0.0.1:${hot.boundPort}"
        val hlat = (0 until n).map { _ =>
          val t0 = System.nanoTime()
          http("GET", s"$base/health", None)
          (System.nanoTime() - t0) / 1e6
        }.toArray.sorted
        println(f"[serve-latency] http-floor(/health)    n=$n p50=${pct(hlat, 0.5)}%8.2f ms  " +
          f"p95=${pct(hlat, 0.95)}%8.2f ms  p99=${pct(hlat, 0.99)}%8.2f ms")
        drive(hot, "warm-exact", "")
        drive(hot, "warm-nprobe4", ""","nprobe":4""")
        // the warm ANN (PQ/ADC) tier: resident codes scanned via the
        // per-request LUT, exact re-rank over the rerank survivors —
        // parity with the Spark searchPq pinned by ServerSpec
        drive(hot, "warm-ann-pq", ""","ann":true""")
        // filtered requests are warm-served too (r13): the filter DSL
        // evaluates in-process over the resident metadata — same parse,
        // Column-free interpreter (MetadataFilterDsl.eval), parity
        // pinned by ServerSpec
        drive(hot, "warm-filtered", ""","filter":"source^1"""")
      } finally hot.stop()

      // in-process warm search (no HTTP): the engine-side latency the
      // tier actually adds — the HTTP rows above carry the JDK
      // URLConnection's ~40 ms small-POST floor on top
      val wi = graft.serve.WarmIndex.load(spark, indexDir, provider)
      (0 until 20).foreach(i => wi.search(queries(i % queries.length), 5))
      def probe(label: String, nprobe: Int): Unit = {
        val lat = (0 until n).map { i =>
          val t0 = System.nanoTime()
          wi.search(queries(i % queries.length), 5, nprobe)
          (System.nanoTime() - t0) / 1e6
        }.toArray.sorted
        println(f"[serve-latency] $label%-22s n=$n p50=${pct(lat, 0.5)}%8.2f ms  " +
          f"p95=${pct(lat, 0.95)}%8.2f ms  p99=${pct(lat, 0.99)}%8.2f ms")
      }
      probe("warm-inproc-exact", Int.MaxValue)
      probe("warm-inproc-nprobe4", 4)
      // in-process ANN: ADC over resident codes + exact re-rank of the
      // 50 survivors — the compressed-index serving cost
      if (wi.hasPq) {
        (0 until 20).foreach(i => wi.searchAnn(queries(i % queries.length), 5))
        val lat = (0 until n).map { i =>
          val t0 = System.nanoTime()
          wi.searchAnn(queries(i % queries.length), 5)
          (System.nanoTime() - t0) / 1e6
        }.toArray.sorted
        println(f"[serve-latency] warm-inproc-ann-pq     n=$n p50=${pct(lat, 0.5)}%8.2f ms  " +
          f"p95=${pct(lat, 0.95)}%8.2f ms  p99=${pct(lat, 0.99)}%8.2f ms")
      }
      // filtered: pays one pass over the resident metadata rows per
      // request (the allowed-id set) + the restricted scan
      locally {
        (0 until 20).foreach(i =>
          wi.search(queries(i % queries.length), 5, Int.MaxValue, Some("source^1")))
        val lat = (0 until n).map { i =>
          val t0 = System.nanoTime()
          wi.search(queries(i % queries.length), 5, Int.MaxValue, Some("source^1"))
          (System.nanoTime() - t0) / 1e6
        }.toArray.sorted
        println(f"[serve-latency] warm-inproc-filtered   n=$n p50=${pct(lat, 0.5)}%8.2f ms  " +
          f"p95=${pct(lat, 0.95)}%8.2f ms  p99=${pct(lat, 0.99)}%8.2f ms")
      }

      // Cold vs memoized filtered bound: every request carries a
      // DISTINCT filter string (an extra always-true != clause), so
      // each one pays the first-hit O(resident-passages) metadata pass
      // on the serving thread — the memoized row above is the steady
      // state for a repeated filter. The delta IS the first-hit toll;
      // if it ever breaches the ms contract at index scale, precompute
      // allowed sets from the request log (the documented escalation).
      locally {
        val lat = (0 until n).map { i =>
          val t0 = System.nanoTime()
          wi.search(queries(i % queries.length), 5, Int.MaxValue,
            Some(s"source^1, source != zz$i"))
          (System.nanoTime() - t0) / 1e6
        }.toArray.sorted
        println(f"[serve-latency] warm-filtered-coldhit  n=$n p50=${pct(lat, 0.5)}%8.2f ms  " +
          f"p95=${pct(lat, 0.95)}%8.2f ms  p99=${pct(lat, 0.99)}%8.2f ms")
      }

      // Concurrent arm: WarmIndex is an immutable snapshot and the
      // server runs handlers on a thread pool, so throughput should
      // scale with clients — the reference serializes every search
      // behind a searcher RwLock (src/cli/serve.rs:82-87); beating it
      // under load is the point of the JVM tier. Each client thread
      // fires `n` requests; reported latency is per-request across all
      // clients, throughput is total requests / wall.
      def concurrentArm(label: String, threads: Int,
                        fire: Int => Unit): Unit = {
        val lats = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Double]()
        val start = new java.util.concurrent.CountDownLatch(1)
        val done = new java.util.concurrent.CountDownLatch(threads)
        (0 until threads).foreach { t =>
          val th = new Thread(() => {
            start.await()
            var i = 0
            while (i < n) {
              val t0 = System.nanoTime()
              fire(t * n + i)
              lats.add((System.nanoTime() - t0) / 1e6)
              i += 1
            }
            done.countDown()
          }, s"client-$t")
          th.setDaemon(true); th.start()
        }
        val tw0 = System.nanoTime()
        start.countDown(); done.await()
        val wall = (System.nanoTime() - tw0) / 1e9
        val sorted = lats.toArray(Array.empty[java.lang.Double]).map(_.doubleValue).sorted
        println(f"[serve-latency] $label%-22s clients=$threads%2d n=${threads * n} " +
          f"p50=${pct(sorted, 0.5)}%8.2f ms  p95=${pct(sorted, 0.95)}%8.2f ms  " +
          f"throughput=${threads * n / wall}%9.0f req/s")
      }
      if (wi.hasBm25) // JIT-warm the hybrid path before timing it
        (0 until 20).foreach(i => wi.searchHybrid(queries(i % queries.length), 5))
      for (c <- Seq(8, 32)) {
        concurrentArm(s"warm-inproc-conc", c,
          i => wi.search(queries(i % queries.length), 5))
        if (wi.hasBm25)
          concurrentArm(s"warm-hybrid-conc", c,
            i => wi.searchHybrid(queries(i % queries.length), 5))
      }
      val hot2 = new SearchServer(spark, wh, "main", provider, warm = true)
      hot2.start()
      try {
        val base = s"http://127.0.0.1:${hot2.boundPort}"
        (0 until 10).foreach(i => http("POST", s"$base/search",
          Some(s"""{"query":"${queries(i % queries.length)}","top_k":5}""")))
        for (c <- Seq(8, 32))
          concurrentArm(s"warm-http-conc", c, { i =>
            val (code, _) = http("POST", s"$base/search",
              Some(s"""{"query":"${queries(i % queries.length)}","top_k":5}"""))
            require(code == 200, s"request failed: $code")
          })
      } finally hot2.stop()
      // hybrid in-process: vector fetchK + driver BM25 + fusion
      if (wi.hasBm25) {
        (0 until 20).foreach(i => wi.searchHybrid(queries(i % queries.length), 5))
        val lat = (0 until n).map { i =>
          val t0 = System.nanoTime()
          wi.searchHybrid(queries(i % queries.length), 5)
          (System.nanoTime() - t0) / 1e6
        }.toArray.sorted
        println(f"[serve-latency] warm-inproc-hybrid     n=$n p50=${pct(lat, 0.5)}%8.2f ms  " +
          f"p95=${pct(lat, 0.95)}%8.2f ms  p99=${pct(lat, 0.99)}%8.2f ms")
      }
    } finally spark.stop()
  }
}
