package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
          Index.maintainAnnTiers(batch.sparkSession, indexDir)
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
            Index.maintainAnnTiers(batch.sparkSession, indexDir)
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

  /** Watermark-bounded streaming dedup: drops rows whose content
    * fingerprint already appeared within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state for a fingerprint is
    * reclaimed once the watermark passes it). The complementary shape
    * to [[dedupIngest]]: no index-side fingerprint table, state bounded
    * by the horizon instead of corpus size — right for de-duplicating
    * a firehose where repeats cluster in time (re-crawls, retries). */
  def dedupStream(docs: DataFrame, textCol: String = "text",
                  tsCol: String = "ts", watermark: String = "1 hour"): DataFrame = {
    import graft.functions.TextFunctions.fingerprint
    docs.withWatermark(tsCol, watermark)
      .withColumn("__fp", fingerprint(col(textCol)))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  /** Watermarked streaming NEAR-dedup: like [[dedupStream]] but keyed
    * on the 60-bit SimHash fingerprint (the
    * [[graft.functions.expressions.SimHash64]] expression) instead of
    * the exact md5 — docs whose token multisets coincide (reordered
    * boilerplate, shuffled sentence fragments, whitespace/punctuation
    * noise) collapse to one survivor in-stream, where the exact tier
    * would pass them all through. Same state bound as [[dedupStream]]:
    * one small key per distinct fingerprint inside the watermark
    * horizon, evicted as event time advances. Token-less docs (NULL
    * simhash) fall back to the exact md5 key — identical ones dedup,
    * distinct ones pass, and NULL never becomes a hot dedup key (the
    * batch tier's stance). */
  def dedupNearStream(docs: DataFrame, textCol: String = "text",
                      tsCol: String = "ts", watermark: String = "1 hour",
                      bits: Int = 60): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val sh = GraftColumnBridge.column(graft.functions.expressions.SimHash64(
      GraftColumnBridge.expression(col(textCol)), bits))
    // Token-less docs (NULL simhash) fall back to the exact normalized
    // md5 key — identical token-less docs still dedup, distinct ones
    // pass, and the whole operator stays ONE pass over the stream with
    // ONE state store (a union of keyed/unkeyed branches would scan
    // the source twice). The s:/x: prefixes keep the two key spaces
    // disjoint by construction.
    val key = coalesce(
      concat(lit("s:"), sh.cast("string")),
      concat(lit("x:"), graft.functions.TextFunctions.fingerprint(col(textCol))))
    docs.withWatermark(tsCol, watermark)
      .withColumn("__nk", key)
      .dropDuplicatesWithinWatermark("__nk")
      .drop("__nk")
  }

  /** Watermarked streaming MEDIA near-dedup: [[dedupNearStream]]'s
    * shape for a binary media stream, keyed on the perceptual
    * fingerprint — image dHash ([[graft.operators.Multimodal.phash64]])
    * or audio banded-energy fingerprint (`audioFp64`) — so re-encoded
    * or slightly-perturbed copies that hash to the same 64-bit
    * signature collapse to one survivor in-stream (re-crawled logos,
    * repeated jingles). Hamming distance 0 only: neighbor-probing a
    * state store per band is not a streaming-state shape; the
    * distance-<=3 tiers live in the batch clusters operators. Same
    * state bound as the text tiers: one 8-byte-keyed row per distinct
    * signature inside the watermark horizon. Undecodable rows (NULL
    * fingerprint) fall back to the exact content md5 — byte-identical
    * corrupt blobs dedup, distinct ones pass, NULL never becomes a hot
    * key, and the operator stays ONE pass / ONE state store. */
  def dedupMediaStream(media: DataFrame, contentCol: String = "content",
                       tsCol: String = "ts", kind: String = "image",
                       watermark: String = "1 hour"): DataFrame = {
    import graft.operators.Multimodal
    val sig = kind match {
      case "image" => Multimodal.phash64(col(contentCol))
      case "audio" => Multimodal.audioFp64(col(contentCol))
      case other => throw new IllegalArgumentException(
        s"unknown media kind '$other' (image|audio)")
    }
    val key = coalesce(
      concat(lit("p:"), sig.cast("string")),
      concat(lit("x:"), md5(col(contentCol))))
    media.withWatermark(tsCol, watermark)
      .withColumn("__mk", key)
      .dropDuplicatesWithinWatermark("__mk")
      .drop("__mk")
  }

  /** Watermarked stream-stream interval join: each left row pairs with
    * right rows sharing `keyCol` whose event time falls in
    * `[leftTs, leftTs + withinMinutes]` — the attribution shape (click
    * joins the impression that preceded it, purchase joins the signup
    * within the trial window) as a streaming operator.
    *
    * Right-side columns come back `r_`-prefixed (both streams carry
    * `key`/`ts`-like names; the prefix keeps the join self-describing).
    *
    * State stays bounded because BOTH ingredients Spark needs are
    * present: a watermark on each side, and a time-range join condition
    * — from these the engine derives how long a buffered row can still
    * find partners and evicts it once the other side's watermark passes
    * `ts + within` (left) / `ts` (right). Without the range condition
    * (or with outer joins lacking watermarks) the state would grow with
    * the stream; this operator makes the bounded formulation the easy
    * path. The join itself shuffles both sides on `keyCol`, exactly
    * like the batch equi-join. */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                         leftTsCol: String = "ts", rightTsCol: String = "ts",
                         withinMinutes: Int = 30,
                         watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTsCol, watermark)
    val r = right.columns.foldLeft(right) { (d, c) =>
      d.withColumnRenamed(c, s"r_$c")
    }.withWatermark(s"r_$rightTsCol", watermark)
    l.join(r,
      col(keyCol) === col(s"r_$keyCol") &&
        col(s"r_$rightTsCol") >= col(leftTsCol) &&
        col(s"r_$rightTsCol") <=
          col(leftTsCol) + expr(s"INTERVAL $withinMinutes MINUTES"))
  }

  /** One user's open session: epoch-micros bounds + event count. */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  /** A closed session emitted downstream. */
  final case class ClosedSession(user_id: String, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp, n_events: Long)

  /** Streaming sessionization with *custom state* (M8): gap-based
    * sessions per user via `flatMapGroupsWithState` — the streaming
    * analog of the `events_sessionize` batch query (same 30-minute-gap,
    * strictly-greater semantics). Each user's state is one `OpenSession`
    * (constant size); an incoming event either extends it or closes it
    * (the closed session is emitted) and opens the next. Event-time
    * timeout closes sessions of idle users once the watermark passes
    * `last + gap`, so state is reclaimed and the operator runs bounded
    * at any scale — the property the batch lag/window formulation can't
    * give an unbounded stream. Partitioning is the groupByKey shuffle on
    * `user_id`; within a micro-batch events are folded in (ts, event_id)
    * order for determinism. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "10 minutes"): Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000

    def toTs(us: Long) = new java.sql.Timestamp(us / 1000)
    // micros precision: getTime carries millis; getNanos the fraction
    def toUs(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

    def fold(userId: String, batch: Iterator[(String, java.sql.Timestamp, Long)],
             state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(userId, toTs(s.startUs), toTs(s.lastUs), s.n))
      } else {
        val closed = Seq.newBuilder[ClosedSession]
        var open = state.getOption
        batch.toSeq.map(e => (toUs(e._2), e._3)).sorted.foreach { case (us, _) =>
          open match {
            case Some(s) if us - s.lastUs > gapUs =>
              closed += ClosedSession(userId, toTs(s.startUs), toTs(s.lastUs), s.n)
              open = Some(OpenSession(us, us, 1))
            case Some(s) =>
              open = Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
            case None =>
              open = Some(OpenSession(us, us, 1))
          }
        }
        open.foreach { s =>
          state.update(s)
          // Close once the watermark passes the session's gap horizon;
          // clamped because setting a timeout at/behind the current
          // watermark throws (a late-arriving event can open a session
          // whose horizon is already past — it closes next batch).
          state.setTimeoutTimestamp(math.max(
            s.lastUs / 1000 + gapUs / 1000,
            state.getCurrentWatermarkMs() + 1))
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      // NB: `ts` stays a TIMESTAMP column into the stateful operator —
      // the watermark tag rides on it, and EventTimeTimeout requires a
      // watermarked column in the operator's input.
      .select(col("user_id").cast("string").as("user_id"),
        col("ts"),
        col("event_id").cast("long").as("event_id"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Run a streaming query to completion over whatever data is currently
    * available (test/backfill helper). */
  def runAvailableNow(w: DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
    val q: StreamingQuery = w.start()
    q.awaitTermination()
  }
}
