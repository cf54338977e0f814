package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.MetadataFilterDsl
import graft.operators.{BM25, Dedup, Expansion, Graph, Knn}

/** Relational/OLAP + event-analytics rows (q_*, events_*, range join).
  *
  * One family slice of the [[SparkEntry]] driver contract (split in
  * r15 so per-round diffs stay reviewable): `queries` entries and
  * their DuckDB `oracle` SQL live side by side; [[SparkEntry]]
  * aggregates the families. Shared fixtures: [[EntryFixtures]];
  * shared oracle CTE builders: [[OracleCtes]]. The determinism
  * rules (DECIMAL money, 6-decimal score rounding before ranking,
  * id tie-breaks, explicit ORDER BY under LIMIT) are documented
  * once on [[SparkEntry]]. */
private[graft] object EntryRelational {
  import EntryFixtures._
  import OracleCtes._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q3_join" -> ((s, dir) => {
      // Selective dimension side broadcast; fact table never shuffled
      // until the final (tiny) aggregation.
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(broadcast(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),

    "q_semi_anti" -> ((s, dir) => {
      // EXISTS/NOT EXISTS as semi/anti joins: customers with vs without
      // open orders. Anti/semi never materialize the probe side's
      // payload — at scale this is the shape for "seen before" checks.
      val cust = Tables.customer(s, dir)
      val open = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
        .select("o_custkey")
      val withOpen = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi")
        .select(col("c_mktsegment"), lit("with_open").as("kind"))
      val without = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_anti")
        .select(col("c_mktsegment"), lit("without_open").as("kind"))
      withOpen.union(without)
        .groupBy("c_mktsegment", "kind")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment", "kind")
    }),

    "q_distinct_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    }),

    "q_rollup" -> ((s, dir) => {
      // Hierarchical totals: (flag, status), (flag), (grand). At scale
      // this is one pass with partial aggregation per grouping set.
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q_cube" -> ((s, dir) => {
      // All four grouping sets in one pass (partial agg per set, same
      // one-shuffle shape as rollup); grouping_id() disambiguates the
      // NULL grouping markers from genuine NULL data values.
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q_pivot" -> ((s, dir) => {
      // Wide-format rollup: status columns pivoted out of rows. Values
      // are given explicitly, so the plan is ONE aggregate pass (no
      // extra distinct-values job + no collect) — the pivot becomes
      // conditional aggregation, same shuffle shape as q1_agg.
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"))
        .select(col("o_orderpriority"), col("F").as("total_f"),
          col("O").as("total_o"), col("P").as("total_p"))
        .orderBy("o_orderpriority")
    }),

    "q_window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // 30-day trailing spend per customer: a RANGE frame over event
      // time (epoch seconds), i.e. the moving aggregate every activity
      // dashboard needs. One shuffle on the partition key; decimal
      // accumulation keeps the running sums engine-exact. Peers (equal
      // timestamps) are all in-frame, so ties can't reorder results.
      // NTZ has no direct long cast; via TIMESTAMP under the session's
      // UTC zone = wall-clock epoch seconds, which is DuckDB's epoch().
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0)
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double").as("spend_30d"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    }),

    "q_topn_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("o_custkey") < 100)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // ----- as-of join: enrich events with dimension history -----
    "events_asof_order" -> ((s, dir) => {
      // For each event, the customer's most recent order at or before
      // the event time — the union+window as-of join (one shuffle on
      // the key; no pair-join blowup).
      val ev = Tables.eventsWithTs(s, dir).filter(col("user_id") < 10)
        .select("event_id", "user_id", "ts")
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      graft.operators.AsofJoin.latestAtOrBefore(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey")
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id").limit(1000)
    }),

    "events_asof_native" -> ((s, dir) => {
      // Same as-of semantics through the custom plan node
      // (AsofJoinNode -> AsofJoinStrategy -> AsofJoinExec): each side
      // shuffles only its own columns; an O(n) per-partition merge
      // carries one payload row per key. Shares events_asof_order's
      // oracle — the custom physical operator is DuckDB-checked.
      val ev = Tables.eventsWithTs(s, dir).filter(col("user_id") < 10)
        .select("event_id", "user_id", "ts")
      val ord = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          // NTZ -> TZ is wall-clock identity in the UTC session; the
          // union formulation gets the same coercion implicitly
          col("o_orderdate").cast("timestamp").as("o_orderdate"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      graft.operators.AsofJoin.latestAtOrBeforeNative(ev, ord,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTs = "ts", rightTs = "o_orderdate",
          payload = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey")
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id").limit(1000)
    }),

    // ----- range join: orders landing inside 30-day transit windows -----
    "range_join_transit" -> ((s, dir) => {
      val usPerDay = 86400L * 1000000
      // session TZ is UTC, so the NTZ->TZ cast is wall-clock identity,
      // matching DuckDB's epoch_us over the naive timestamps
      val li = Tables.lineitem(s, dir).filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("w_start"),
          (unix_micros(col("l_shipdate").cast("timestamp")) + lit(30 * usPerDay)).as("w_end"))
      val ords = Tables.orders(s, dir)
        .select(unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
      graft.operators.RangeJoin.pointInInterval(ords, li,
          pointCol = "o_us", startCol = "w_start", endCol = "w_end",
          bucketWidth = 30 * usPerDay)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ----- corpus profiling (exact oracle tier + sketch tier) -----
    "q_percentiles" -> ((s, dir) => {
      graft.operators.Profile.exactPercentiles(Tables.documents(s, dir))
    }),

    // Weekly cohort retention (the growth-analytics staple): users
    // grouped by first-seen ISO week, retained(w) = distinct users of
    // the cohort active w weeks after their first event. ONE user-keyed
    // shuffle (min-ts + active-day set in the same aggregate; per-user
    // state bounded by distinct active days) + the tiny
    // (cohort, offset) rollup — the agg/join/distinct/rollup chain this
    // replaces was 4 shuffles for the same answer.
    "events_retention" -> ((s, dir) => {
      val perUser = Tables.eventsWithTs(s, dir)
        .groupBy("user_id")
        .agg(min("ts").as("first_ts"),
          collect_set(to_date(col("ts"))).as("days"))
      perUser
        .select(
          date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
          explode(array_distinct(transform(col("days"),
            d => floor(datediff(d, to_date(col("first_ts"))) / lit(7.0)))))
            .as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("retained"))
        .orderBy("cohort_week", "week_offset")
    }),

    "events_funnel" -> ((s, dir) => {
      // Conversion funnel: of users who signed up, how many purchased
      // *after* their first signup. One pass: conditional min-timestamps
      // per user, then a corpus-level rollup.
      val perUser = Tables.eventsWithTs(s, dir)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      perUser.agg(
        count(lit(1)).as("n_users"),
        count(col("first_signup")).as("n_signup"),
        sum(when(col("first_signup").isNotNull && col("first_purchase").isNotNull &&
          col("first_purchase") > col("first_signup"), 1).otherwise(0)).as("n_converted"))
    }),

    // ----- events: windowed agg / JSON props / sessionization -----
    "events_window" -> ((s, dir) => {
      Tables.eventsWithTs(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("hour", "event_type")
    }),

    "events_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(get_json_object(col("props"), "$.k").cast("int") > 80)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("event_type")
    }),

    "events_session_native" -> ((s, dir) => {
      // Spark's native session_window operator; semantics checked
      // against the portable lag+cumsum SQL (no exact-1800s gaps exist
      // in the data, where the open/closed boundary would differ).
      Tables.eventsWithTs(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
        .orderBy("user_id")
    }),

    "events_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.eventsWithTs(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),
  )

  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
         |       CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
         |       CAST(sum($discPrice) AS DOUBLE) AS sum_disc_price,
         |       count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      s"""SELECT o_orderpriority,
         |       CAST(sum($discPrice) AS DOUBLE) AS revenue,
         |       count(*) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    "q_semi_anti" ->
      """WITH open AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |tagged AS (
        |  SELECT c_mktsegment, 'with_open' AS kind FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM open)
        |  UNION ALL
        |  SELECT c_mktsegment, 'without_open' AS kind FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM open))
        |SELECT c_mktsegment, kind, count(*) AS n
        |FROM tagged
        |GROUP BY c_mktsegment, kind
        |ORDER BY c_mktsegment, kind""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS INT) AS gid,
        |       l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F'
        |                     THEN o_totalprice::DECIMAL(18,2) END) AS DOUBLE) AS total_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O'
        |                     THEN o_totalprice::DECIMAL(18,2) END) AS DOUBLE) AS total_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P'
        |                     THEN o_totalprice::DECIMAL(18,2) END) AS DOUBLE) AS total_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(o_totalprice::DECIMAL(18,2)) OVER (
        |              PARTITION BY o_custkey
        |              ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
        |              RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        |FROM orders
        |WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_topn_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 AND o_custkey < 100
        |ORDER BY o_custkey""".stripMargin,

    "range_join_transit" ->
      """SELECT l.l_orderkey, l.l_linenumber, count(*) AS n_orders
        |FROM (SELECT l_orderkey, l_linenumber,
        |             epoch_us(l_shipdate) AS ws,
        |             epoch_us(l_shipdate) + 2592000000000 AS we
        |      FROM lineitem WHERE l_orderkey < 100) l
        |JOIN orders o ON epoch_us(o.o_orderdate) BETWEEN l.ws AND l.we
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "events_asof_order" -> asofOracle,
    // same semantics via the custom physical operator — same oracle
    "events_asof_native" -> asofOracle,

    "q_percentiles" ->
      """SELECT lang, count(*) AS n_docs,
        |       quantile_cont(n_chars, 0.5) AS p50_chars,
        |       quantile_cont(n_chars, 0.95) AS p95_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    // Sub-second min(ts) precision differs (Spark truncates to micros)
    // but only date-level values survive into the output, so the
    // engines agree; weeks are ISO-Monday in both.
    "events_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY 1),
        |w AS (
        |  SELECT DISTINCT e.user_id,
        |         CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
        |         CAST(FLOOR(date_diff('day', CAST(f.first_ts AS DATE), CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort_week, week_offset, count(*) AS retained
        |FROM w
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "events_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |         min(ts) FILTER (WHERE event_type = 'signup') AS first_signup,
        |         min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
        |  FROM events
        |  GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |       count(first_signup) AS n_signup,
        |       CAST(sum(CASE WHEN first_signup IS NOT NULL AND first_purchase IS NOT NULL
        |                 AND first_purchase > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM u""".stripMargin,

    "events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |       event_type, count(*) AS n,
        |       CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "events_json" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS total
        |FROM events
        |WHERE json_extract(props, '$.k')::INT > 80
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "events_session_native" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev_ts IS NULL
        |                  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM x
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "events_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, event_id,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |       CAST(sum(CASE WHEN prev_ts IS NULL
        |                  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM x
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
  )
}
