package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.embedding.EmbeddingProvider
import graft.pipeline.Index

/** Thin HTTP front end over the query layer — the reference's `serve`
  * surface (`src/cli/serve.rs:90-96,222-311`) re-expressed as a handler
  * holding one long-lived SparkSession:
  *
  *   POST /search   {"query": "...", "top_k": 5, "filter": "...",
  *                   "hybrid": true, "hybrid_alpha": 0.7}
  *
  * `hybrid_alpha` is the reference's request field name
  * (`src/cli/serve.rs:232-233`); `alpha` is accepted as an alias for
  * earlier clients of this server, with `hybrid_alpha` winning when
  * both are present.
  *   GET  /health   {"status":"ok"}
  *   GET  /info     index meta JSON
  *   GET  /indexes  names under the warehouse root
  *
  * Uses the JDK's built-in HttpServer — no extra dependencies; the data
  * plane stays entirely in Spark (cached tables + per-request plans).
  */
final class SearchServer(spark: SparkSession, warehouse: String, indexName: String,
                         provider: EmbeddingProvider, port: Int = 0,
                         warm: Boolean = false) {

  // The JDK server writes status+headers and body as separate TCP
  // segments; with Nagle on, segment 2 waits for the client's delayed
  // ACK (~40 ms) — a flat per-request floor that buries the warm tier's
  // sub-ms search cost. TCP_NODELAY on accepted sockets is only
  // reachable via this system property, which the JDK reads ONCE at
  // ServerConfig class-initialization (the first HttpServer created in
  // the process). Cli.main sets it at process entry where that order
  // is guaranteed; this set covers library embedders — but it is a
  // no-op if the host application already created any HttpServer, and
  // it affects every server this JVM creates afterwards (documented
  // caveat; acceptable because the flag only disables Nagle).
  System.setProperty("sun.net.httpserver.nodelay", "true")
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  private val indexDir = Index.locate(warehouse, indexName)
    .getOrElse(throw new IllegalArgumentException(s"no index '$indexName' in $warehouse"))

  // Warm tier (opt-in): the index layout loaded into driver arrays so
  // vector/hybrid/filtered requests run zero Spark jobs — the
  // per-request latency answer to the reference's in-process walk (see
  // [[WarmIndex]]). The initial load fails loudly (index too big for
  // the driver-RAM bound, no persisted embeddings) at CONSTRUCTION,
  // not first request.
  @volatile private var warmIndex: Option[WarmIndex] =
    if (warm) Some(WarmIndex.load(spark, indexDir, provider)) else None

  // Staleness contract: WarmIndex is an immutable snapshot, but the
  // index DIRECTORY can move under a long-lived server (Index.update /
  // appendIvf) — serving the snapshot then means silently stale
  // results. Every warm-routed request probes the directory
  // fingerprint (a stat walk, microseconds) and RELOADS on drift; a
  // reload that now fails (index grew past the driver budget, table
  // mid-write) routes this and subsequent requests to the Spark path —
  // loud on stderr, never stale.
  private def currentWarm(): Option[WarmIndex] = warmIndex match {
    case None => None
    case some @ Some(wi) =>
      val fp = WarmIndex.fingerprint(indexDir)
      if (fp == wi.fingerprint) some
      else synchronized {
        // re-check under the lock: another request may have reloaded
        val cur = warmIndex
        if (cur.exists(_.fingerprint == fp)) cur
        else {
          System.err.println(s"[warm] $indexDir changed on disk — reloading")
          try {
            val fresh = WarmIndex.load(spark, indexDir, provider)
            warmIndex = Some(fresh)
            warmIndex
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(
                s"[warm] reload failed, serving from the Spark path: ${e.getMessage}")
              warmIndex = None
              None
          }
        }
      }
  }

  def boundPort: Int = server.getAddress.getPort

  // minimal JSON field pulls for the flat request object
  private def jsonStr(body: String, k: String): Option[String] =
    ("\"" + k + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(body).map(_.group(1).replace("\\\"", "\""))
  private def jsonNum(body: String, k: String): Option[Double] =
    ("\"" + k + "\"\\s*:\\s*(-?[0-9.]+)").r.findFirstMatchIn(body).map(_.group(1).toDouble)
  private def jsonBool(body: String, k: String): Option[Boolean] =
    ("\"" + k + "\"\\s*:\\s*(true|false)").r.findFirstMatchIn(body).map(_.group(1) == "true")

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/health", (ex: HttpExchange) =>
    respond(ex, 200, """{"status":"ok"}"""))

  server.createContext("/info", (ex: HttpExchange) =>
    respond(ex, 200, Index.readMeta(indexDir).toJson))

  server.createContext("/indexes", (ex: HttpExchange) =>
    respond(ex, 200, Index.listIndexes(warehouse)
      .map { case (n, m) => s"""{"name":${q(n)},"passage_count":${m.passageCount}}""" }
      .mkString("[", ",", "]")))

  server.createContext("/search", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
    else try {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      jsonStr(body, "query") match {
        case None => respond(ex, 400, """{"error":"missing query"}""")
        case Some(query) =>
          try {
            val topK = jsonNum(body, "top_k").map(_.toInt).getOrElse(5)
            val filterStr = jsonStr(body, "filter")
            val hybrid = jsonBool(body, "hybrid").getOrElse(false)
            val t0 = System.nanoTime()
            // warm tier serves the plain vector path, the FILTERED
            // path (in-process DSL evaluation over resident metadata)
            // AND — when the index persisted its bm25 tables within
            // the driver budget — the hybrid path, all with zero Spark
            // jobs; results are pinned identical to the Spark path
            // (ServerSpec).
            val alpha = jsonNum(body, "hybrid_alpha")
              .orElse(jsonNum(body, "alpha")).getOrElse(0.7)
            val nprobeReq = jsonNum(body, "nprobe").map(_.toInt)
            // "ann": true routes to the PQ tier (warm ADC + exact
            // re-rank in-process when resident; Index.searchAnn
            // otherwise) — the compressed-index serving mode. ANN has
            // no hybrid arm on either tier, so the combination is a
            // request error, not a silent drop of one flag.
            val ann = jsonBool(body, "ann").getOrElse(false)
            if (ann && hybrid)
              respond(ex, 400, """{"error":"ann has no hybrid tier"}""")
            else {
            val rerankReq = jsonNum(body, "rerank").map(_.toInt)
            def rows(rs: Seq[(String, Double, String, String)]): String =
              rs.map { case (id, score, text, source) =>
                s"""{"id":${q(id)},"score":$score,""" +
                  s""""text":${q(text)},"source":${q(source)}}"""
              }.mkString("[", ",", "]")
            def sparkRows(df: org.apache.spark.sql.DataFrame): String =
              df.collect().map { r =>
                s"""{"id":${q(r.getString(0))},"score":${r.getDouble(1)},""" +
                  s""""text":${q(r.getString(2))},"source":${q(r.getString(3))}}"""
              }.mkString("[", ",", "]")
            val (results, tier) = currentWarm() match {
              case Some(wi) if ann && wi.hasPq =>
                (rows(wi.searchAnn(query, topK, nprobeReq.getOrElse(4),
                  rerankReq.getOrElse(50), filterStr)), "warm")
              case _ if ann =>
                (sparkRows(Index.searchAnn(spark, indexDir, query, provider,
                  topK = topK, nprobe = nprobeReq.getOrElse(4),
                  rerank = rerankReq.getOrElse(50), filterStr = filterStr)),
                  "spark")
              case Some(wi) if !hybrid || wi.hasBm25 =>
                val nprobe = nprobeReq.getOrElse(Int.MaxValue)
                (rows(if (hybrid)
                    wi.searchHybrid(query, topK, alpha, nprobe, filterStr)
                  else wi.search(query, topK, nprobe, filterStr)), "warm")
              case _ =>
                (sparkRows(Index.search(spark, indexDir, query, provider,
                  topK = topK, filterStr = filterStr, hybrid = hybrid,
                  alpha = alpha)), "spark")
            }
            val tookMs = (System.nanoTime() - t0) / 1e6
            // nprobe only prunes on the warm tier for PLAIN requests
            // (the ANN path honors it on both tiers); a Spark-path
            // response to a request that asked for it says so instead
            // of silently serving exact results under a pruning knob
            val note =
              if (tier == "spark" && nprobeReq.isDefined && !ann)
                s""","note":"nprobe_ignored"""" else ""
            respond(ex, 200,
              s"""{"results":$results,"took_ms":$tookMs,"tier":${q(tier)}$note}""")
            }
          } catch {
            case e: Exception => respond(ex, 500, s"""{"error":${q(String.valueOf(e.getMessage))}}""")
          }
      }
    } finally {
      // Request boundary: drain the dedup deferred-release registry so a
      // long-lived server never pins a request's corpus-scale cache
      // blocks past its response (Dedup.holdCached holds one live
      // intermediate per callsite by design between calls).
      graft.operators.Dedup.releaseCaches()
    }
  })

  // Concurrency: the JDK HttpServer with no executor runs every handler
  // on its single dispatcher thread — requests would serialize exactly
  // like the reference's RwLock'd searcher (src/cli/serve.rs:82-87).
  // WarmIndex is an immutable snapshot (per-request scratch only) and
  // Spark schedules concurrent actions from multiple threads, so both
  // tiers are safe to serve in parallel; a cached pool of daemon
  // threads lets warm-tier throughput scale with client concurrency.
  private val pool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-serve-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    })
  server.setExecutor(pool)

  def start(): Unit = server.start()
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}
