package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Environment smoke test for the driver-provided parquet tables.
  *
  * The events table stores `ts` as parquet TIMESTAMP(NANOS), a type
  * whose Spark reading CHANGED across versions (<=4.0: rejected unless
  * the `nanosAsLong` legacy conf reads it as a raw long; 4.1+: resolved
  * as TIMESTAMP_NTZ with the legacy conf ignored). Round 7's bench and
  * 8 correctness queries were voided because that upgrade surfaced at
  * driver time instead of in a unit test — this spec pins the loader's
  * contract so the NEXT reader change fails here first.
  */
class TablesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("eventsWithTs analyzes and yields session-TZ TimestampType micros") {
    val ev = Tables.eventsWithTs(spark, sfDir)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts resolved as ${ev.schema("ts").dataType}; downstream queries " +
        "(session_window, unix_timestamp, as-of joins vs cast dimension " +
        "columns) expect TimestampType")
    // Force analysis + execution of an expression the r7 regression broke.
    val n = ev.filter(col("ts").isNotNull).count()
    assert(n > 0)
  }

  test("ts conversion matches the hand-computed micro value DuckDB sees") {
    // event_id 0 in sf0.001 is 2024-01-01 00:09:58.778549 (nanos
    // truncated to micros — same truncation DuckDB applies reading the
    // file, so this literal doubles as the oracle-parity pin).
    val got = Tables.eventsWithTs(spark, sfDir)
      .filter(col("event_id") === 0)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "2024-01-01 00:09:58.778549")
  }

  test("unix_timestamp / session_window style consumers analyze over ts") {
    // The exact expression shapes the events_* queries use; a reader
    // change that resolves ts to a type these reject must fail here.
    val ev = Tables.eventsWithTs(spark, sfDir).limit(100)
    val sessionized = ev
      .withColumn("u", unix_timestamp(col("ts")))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
    assert(sessionized.count() >= 0) // analysis + execution, value irrelevant
  }
}
