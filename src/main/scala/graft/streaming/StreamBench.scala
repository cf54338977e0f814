package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming rate/latency harness — "measure, don't guess" applied to
  * the §2.9 streaming operators, the way `graft.Bench` measures the
  * batch queries.
  *
  * Each workload drives one streaming operator from [[Streaming]] with
  * the `rate-micro-batch` source: a fixed number of rows per
  * micro-batch whose event time advances a fixed amount per batch.
  * Unlike the wall-clock `rate` source, that makes the run
  * deterministic in the dimension that matters — watermarks advance,
  * windows close, and session timeouts fire on a schedule set by
  * `advanceMillisPerBatch`, not by how fast the host happens to be.
  *
  * Metrics come from Spark's own `StreamingQueryProgress` (the same
  * numbers a production monitor would scrape): per-batch
  * `triggerExecution` latency (p50/p95), input-rows-over-execution-time
  * throughput (first batch dropped as JIT/codegen warm-up), sink output
  * rows, and the final stateful-operator row count — the number that
  * decides whether an operator is safe to leave running for a month.
  *
  * Prints ONE JSON line:
  * `{"metric":"stream_rows_per_sec","value":<min over workloads>,
  *   "workloads":{name:{rows_per_sec,p50_batch_ms,p95_batch_ms,
  *   batches,input_rows,output_rows,state_rows},...}}`
  * (min, not sum — the slowest operator caps a chained pipeline).
  */
object StreamBench {

  final case class StreamMetrics(
      name: String,
      batches: Int,
      inputRows: Long,
      outputRows: Long,
      rowsPerSec: Double,
      p50BatchMs: Long,
      p95BatchMs: Long,
      stateRows: Long)

  /** `rate-micro-batch` stream: `rowsPerBatch` rows per trigger,
    * event time advancing `advanceMs` per batch from epoch 0. */
  def rateSource(spark: SparkSession, rowsPerBatch: Long, advanceMs: Long,
                 partitions: Int): DataFrame =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("numPartitions", partitions)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", advanceMs)
      .load() // columns: timestamp TIMESTAMP, value LONG (globally increasing)

  /** Run a streaming frame to the noop sink for `nBatches` non-empty
    * micro-batches and report progress-derived metrics. The noop sink
    * executes the full plan (state updates included) without write
    * overhead — the standard way to put a number on the operators
    * themselves. */
  def measure(spark: SparkSession, name: String, df: DataFrame,
              nBatches: Int, timeoutMs: Long = 300000L): StreamMetrics = {
    val checkpoint = java.nio.file.Files
      .createTempDirectory(s"graft-streambench-$name").toString
    val q = df.writeStream
      .format("noop")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L)) // re-trigger as fast as batches finish
      .start()
    try {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (q.recentProgress.count(_.numInputRows > 0) < nBatches &&
             System.nanoTime() < deadline && q.isActive) {
        q.awaitTermination(100)
      }
    } finally q.stop()

    val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    require(progress.nonEmpty, s"$name: no non-empty batches before timeout")
    // Drop the first batch: it pays stream start-up + codegen/JIT, which
    // a long-lived query pays once, not per batch.
    val steady = if (progress.length > 1) progress.tail else progress
    val execMs = steady.map(_.durationMs.get("triggerExecution").toLong)
    val inputRows = steady.map(_.numInputRows).sum
    val totalSec = execMs.sum / 1000.0
    def pct(p: Double): Long = {
      val s = execMs.sorted
      s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
    }
    StreamMetrics(
      name = name,
      batches = progress.length,
      inputRows = progress.map(_.numInputRows).sum,
      outputRows = progress.map(_.sink.numOutputRows).filter(_ >= 0).sum,
      rowsPerSec = if (totalSec > 0) inputRows / totalSec else 0.0,
      p50BatchMs = pct(0.50),
      p95BatchMs = pct(0.95),
      stateRows = progress.last.stateOperators.map(_.numRowsTotal).sum)
  }

  /** Watermark-bounded exact dedup ([[Streaming.dedupStream]]).
    * `value % uniqueKeys` makes every batch ~`rowsPerBatch/uniqueKeys`
    * copies of each key and every later batch a full re-send — the
    * re-crawl/retry shape the operator exists for. Event time advances
    * 1 min/batch under a 30 min watermark, so state is exercised both
    * ways: grows to `uniqueKeys`, then eviction kicks in past the
    * horizon. */
  def dedupWorkload(spark: SparkSession, rowsPerBatch: Long,
                    partitions: Int): DataFrame = {
    val uniqueKeys = math.max(rowsPerBatch / 2, 1)
    Streaming.dedupStream(
      rateSource(spark, rowsPerBatch, advanceMs = 60000L, partitions)
        .select(col("timestamp").as("ts"),
          concat(lit("document body "), pmod(col("value"), lit(uniqueKeys)))
            .as("text")),
      watermark = "30 minutes")
  }

  /** Watermark-bounded NEAR-dedup ([[Streaming.dedupNearStream]]):
    * the [[dedupWorkload]] shape with token-shuffled re-sends — each
    * re-send permutes the word order by batch parity, so the exact
    * fingerprint differs while the SimHash key collapses it. Measures
    * the per-row SimHash64 expression cost on top of the same
    * dropDuplicatesWithinWatermark state machine. */
  def dedupNearWorkload(spark: SparkSession, rowsPerBatch: Long,
                        partitions: Int): DataFrame = {
    val uniqueKeys = math.max(rowsPerBatch / 2, 1)
    val key = pmod(col("value"), lit(uniqueKeys))
    // parity flips the word order between re-sends of the same key
    val parity = pmod(col("value"), lit(2))
    Streaming.dedupNearStream(
      rateSource(spark, rowsPerBatch, advanceMs = 60000L, partitions)
        .select(col("timestamp").as("ts"),
          when(parity === 0, concat(lit("document body "), key))
            .otherwise(concat(key, lit(" body document"))).as("text")),
      watermark = "30 minutes")
  }

  /** Watermark-bounded MEDIA near-dedup ([[Streaming.dedupMediaStream]]):
    * the [[dedupWorkload]] shape over generated 9x8 grayscale PNGs —
    * each row ENCODES a real PNG in the stream (deterministic pixels
    * from the key) and the operator decodes + perceptually hashes it,
    * so the measurement covers the full decode → dHash → keyed-state
    * path, the per-row cost a media crawl ingest pays. Half the keys
    * repeat within the horizon, as in the text tiers. */
  def dedupMediaWorkload(spark: SparkSession, rowsPerBatch: Long,
                         partitions: Int): DataFrame = {
    val uniqueKeys = math.max(rowsPerBatch / 2, 1)
    // splitmix-style mix per (key, pixel): adjacent-pixel DIFFERENCES
    // must vary with the key, or every key lands in one of ~256 dHash
    // classes and the state/survivor counts stop resembling a crawl
    val png = udf { (k: Long) =>
      val px = Array.tabulate(72) { i =>
        var z = k + i * 7919L + 0x9E3779B97F4A7C15L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        ((z >>> 56) & 0xff).toInt
      }
      graft.operators.Multimodal.grayPng(px, 9, 8)
    }
    Streaming.dedupMediaStream(
      rateSource(spark, rowsPerBatch, advanceMs = 60000L, partitions)
        .select(col("timestamp").as("ts"),
          png(pmod(col("value"), lit(uniqueKeys))).as("content")),
      watermark = "30 minutes")
  }

  /** Watermarked tumbling-window counts ([[Streaming.windowedEventCounts]]).
    * 10 min of event time per batch against 5 min windows + 10 min
    * watermark: windows start closing (append-mode emission) from the
    * third batch on, so the measurement includes state eviction and
    * emission, not just accumulation. */
  def windowWorkload(spark: SparkSession, rowsPerBatch: Long,
                     partitions: Int): DataFrame =
    Streaming.windowedEventCounts(
      rateSource(spark, rowsPerBatch, advanceMs = 600000L, partitions)
        .select(col("timestamp").as("ts"),
          concat(lit("type_"), pmod(col("value"), lit(10))).as("event_type"),
          (col("value") % 97).cast("double").as("value")),
      watermark = "10 minutes", window_ = "5 minutes")

  /** Stateful gap sessionization ([[Streaming.sessionizeStream]]).
    * 45 min of event time per batch against a 30 min gap: every user's
    * session closes and reopens each batch, so the run measures the
    * full state churn path (update + emit + timeout bookkeeping), the
    * worst realistic load — not append-only state growth. */
  def sessionizeWorkload(spark: SparkSession, rowsPerBatch: Long,
                         partitions: Int): DataFrame = {
    val users = math.max(rowsPerBatch / 20, 1)
    Streaming.sessionizeStream(
      rateSource(spark, rowsPerBatch, advanceMs = 2700000L, partitions)
        .select(col("timestamp").as("ts"),
          pmod(col("value"), lit(users)).cast("string").as("user_id"),
          col("value").as("event_id")),
      gapMinutes = 30, watermark = "10 minutes").toDF()
  }

  /** Stream-stream interval join ([[Streaming.streamIntervalJoin]]).
    * One rate source split by value parity into impressions and
    * clicks (clicks shifted +5 min, inside the 30 min attribution
    * window); 10 min of event time per batch under a 1 h watermark, so
    * each side buffers a few batches of rows and then evicts — the
    * measurement covers buffer+match+evict, not unbounded growth.
    * `rowsPerBatch/4` distinct keys keep match amplification modest
    * (a few joined rows per key per batch). */
  def intervalJoinWorkload(spark: SparkSession, rowsPerBatch: Long,
                           partitions: Int): DataFrame = {
    val keys = math.max(rowsPerBatch / 4, 1)
    val src = rateSource(spark, rowsPerBatch, advanceMs = 600000L, partitions)
      .select(col("timestamp").as("ts"), col("value"))
    val impressions = src.filter(pmod(col("value"), lit(2)) === 0)
      .select(pmod(col("value"), lit(keys)).cast("string").as("key"),
        col("ts"), col("value").as("imp_id"))
    val clicks = src.filter(pmod(col("value"), lit(2)) === 1)
      .select(pmod(col("value") - 1, lit(keys)).cast("string").as("key"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("ts"),
        col("value").as("click_id"))
    Streaming.streamIntervalJoin(impressions, clicks, "key",
      withinMinutes = 30, watermark = "1 hour")
  }

  def workloads(spark: SparkSession, rowsPerBatch: Long,
                partitions: Int): Seq[(String, DataFrame)] = Seq(
    "dedup_stream" -> dedupWorkload(spark, rowsPerBatch, partitions),
    "dedup_near_stream" -> dedupNearWorkload(spark, rowsPerBatch, partitions),
    "dedup_media_stream" -> dedupMediaWorkload(spark, rowsPerBatch, partitions),
    "window_counts" -> windowWorkload(spark, rowsPerBatch, partitions),
    "sessionize_stream" -> sessionizeWorkload(spark, rowsPerBatch, partitions),
    "interval_join" -> intervalJoinWorkload(spark, rowsPerBatch, partitions))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rowsPerBatch = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "200000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val results = workloads(spark, rowsPerBatch, partitions = cpus.toInt)
      .map { case (name, df) => measure(spark, name, df, nBatches) }

    def j(m: StreamMetrics): String =
      s""""${m.name}":{"rows_per_sec":${math.round(m.rowsPerSec)},""" +
        s""""p50_batch_ms":${m.p50BatchMs},"p95_batch_ms":${m.p95BatchMs},""" +
        s""""batches":${m.batches},"input_rows":${m.inputRows},""" +
        s""""output_rows":${m.outputRows},"state_rows":${m.stateRows}}"""
    val value = math.round(results.map(_.rowsPerSec).min)
    println(s"""{"metric":"stream_rows_per_sec","value":$value,"unit":"rows/sec",""" +
      s""""rows_per_batch":$rowsPerBatch,"workloads":{${results.map(j).mkString(",")}}}""")
    spark.stop()
  }
}
