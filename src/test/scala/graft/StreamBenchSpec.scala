package graft

import graft.streaming.StreamBench

/** The streaming harness measured small: each workload must process
  * batches, report sane metrics, and show the operator actually doing
  * its job (dedup dropping rows, windows emitting, sessions closing,
  * state bounded). Tiny rowsPerBatch keeps the suite fast — the real
  * numbers come from `runMain graft.streaming.StreamBench`. */
class StreamBenchSpec extends SparkSpec {

  private val rows = 2000L
  private val parts = 4

  test("dedup_stream: throughput metrics sane, duplicates dropped, state bounded") {
    val m = StreamBench.measure(spark, "dedup_stream",
      StreamBench.dedupWorkload(spark, rows, parts), nBatches = 3)
    assert(m.batches >= 3)
    assert(m.rowsPerSec > 0)
    assert(m.p95BatchMs >= m.p50BatchMs)
    assert(m.inputRows >= 3 * rows)
    // value % (rows/2) repeats within every batch and fully across
    // batches: far fewer survivors than inputs
    assert(m.outputRows < m.inputRows / 2)
    // state holds at most one row per distinct fingerprint within the
    // watermark horizon — never one per input row
    assert(m.stateRows <= rows)
  }

  test("dedup_media_stream: PNG decode + dHash keyed dedup, state bounded") {
    val m = StreamBench.measure(spark, "dedup_media_stream",
      StreamBench.dedupMediaWorkload(spark, rows, parts), nBatches = 3)
    assert(m.batches >= 3)
    assert(m.rowsPerSec > 0)
    assert(m.inputRows >= 3 * rows)
    // every key repeats within each batch and across batches: the
    // perceptual hash of identical pixels coincides, survivors collapse
    assert(m.outputRows < m.inputRows / 2)
    // one state row per distinct signature in the horizon
    assert(m.stateRows <= rows)
  }

  test("dedup_near_stream: token-shuffled re-sends collapse on the simhash key") {
    val m = StreamBench.measure(spark, "dedup_near_stream",
      StreamBench.dedupNearWorkload(spark, rows, parts), nBatches = 3)
    assert(m.batches >= 3)
    assert(m.rowsPerSec > 0)
    assert(m.inputRows >= 3 * rows)
    // re-sends permute word order, so the EXACT fingerprint differs
    // while the simhash key coincides: survivors must still collapse
    assert(m.outputRows < m.inputRows / 2)
    // one state row per distinct fingerprint in the horizon
    assert(m.stateRows <= rows)
  }

  test("window_counts: windows close and emit under the advancing watermark") {
    val m = StreamBench.measure(spark, "window_counts",
      StreamBench.windowWorkload(spark, rows, parts), nBatches = 4)
    assert(m.rowsPerSec > 0)
    // 10 min of event time per batch vs 5 min windows + 10 min
    // watermark: by batch 4 several windows have closed (append-mode
    // emission proves eviction, not just accumulation)
    assert(m.outputRows > 0)
  }

  test("sessionize_stream: sessions close each batch, per-user state is constant") {
    val m = StreamBench.measure(spark, "sessionize_stream",
      StreamBench.sessionizeWorkload(spark, rows, parts), nBatches = 4)
    assert(m.rowsPerSec > 0)
    // 45 min advance vs 30 min gap: every batch closes the previous
    // session of every user seen
    assert(m.outputRows > 0)
    // one OpenSession per user, not per event
    assert(m.stateRows <= rows / 20 + 1)
  }
}
