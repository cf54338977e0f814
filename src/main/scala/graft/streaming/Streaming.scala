package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.embedding.EmbeddingProvider
import graft.pipeline.Index

/** Structured Streaming extensions (SURVEY §2.9/M8).
  *
  * The reference has no streaming engine; its `update` command is
  * semantically a micro-batch append (`src/cli/update.rs:58-242`). Here
  * that becomes a real stream: files landing in a directory are chunked,
  * embedded and appended to the index tables via `foreachBatch`, and the
  * events surface gets watermarked windowed aggregation — the two shapes
  * a 100 TB ingest actually needs (append-only micro-batches + bounded
  * state for late data).
  */
object Streaming {

  /** Micro-batch index ingest: every new parquet file under `sourceDir`
    * (schema: text, source) is appended to the index at `indexDir` —
    * the reference's incremental `update` as a continuous query. */
  def indexIngest(spark: SparkSession, sourceDir: String, indexDir: String,
                  schema: StructType, provider: EmbeddingProvider,
                  checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Index.update(batch, indexDir, provider, strategy = "simple")
        }
        ()
      }
  }

  /** Deduplicating micro-batch ingest: each arriving batch drops (a)
    * documents whose content fingerprint already exists in the index's
    * `doc_fps` sidecar (written at build/update time, keyed by *source
    * document* — a passage-level check would never match multi-chunk
    * documents) and (b) fingerprint duplicates *within* the batch
    * (keeping the min source), then appends the survivors; `Index.update`
    * appends their fingerprints, so re-sent duplicates are dropped in
    * later batches too. The membership check is an anti join — the
    * standard exact-dedup gate in front of a training-data pipeline. */
  def dedupIngest(spark: SparkSession, sourceDir: String, indexDir: String,
                  schema: StructType, provider: EmbeddingProvider,
                  checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    import graft.functions.TextFunctions.fingerprint
    spark.readStream
      .schema(schema)
      .parquet(sourceDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val seen = Index.docFps(spark, indexDir)
          val w = Window.partitionBy("fp").orderBy("source")
          val fresh = batch
            .withColumn("fp", fingerprint(col("text")))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)          // in-batch dedup
            .join(seen, Seq("fp"), "left_anti") // vs-index dedup
            .drop("fp", "__rn")
          if (!fresh.isEmpty) {
            Index.update(fresh, indexDir, provider, strategy = "simple")
          }
        }
        ()
      }
  }

  /** Watermarked tumbling-window counts over an event stream — the
    * streaming analog of the `events_window` batch query. State is
    * bounded by the watermark; partitioning is by (window, event_type)
    * group keys, the standard shuffle for streaming aggs. */
  def windowedEventCounts(events: DataFrame, watermark: String = "10 minutes",
                          window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("total"))

  /** Run a streaming query to completion over whatever data is currently
    * available (test/backfill helper). */
  def runAvailableNow(w: DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
    val q: StreamingQuery = w.start()
    q.awaitTermination()
  }
}
