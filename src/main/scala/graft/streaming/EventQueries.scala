package graft.streaming

import graft.tables.Checkpoints.CheckpointOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.functions.StableRound
import graft.tables.Tables

/** Event-stream processing (streaming north-star; the reference has no
  * streaming — SURVEY.md §2.10 — so this is the Structured-Streaming
  * extension over the `events` fixture).
  *
  * Each operator exists in BOTH forms with identical semantics:
  *  - batch DataFrame (below, oracle-checked against DuckDB), and
  *  - `readStream` form (graft.streaming.Streams) whose output is proven
  *    equal to the batch result in StreamingSpec — the standard
  *    batch/stream parity argument of Structured Streaming.
  *
  * Scale: all three are single-shuffle shapes — tumbling windows partition
  * by (window, type); sessionization partitions by user. Watermarks bound
  * streaming state at real scale.
  */
object EventQueries {

  /** Tumbling 1-hour windows per event type (the streaming hello-world,
    * batch-expressed via date_trunc so the oracle can reproduce it). */
  val ev01TumblingWindow: Q = Q(
    "ev01_tumbling_window",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n, floor(sum(value) * 100 + 0.5) / 100 AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          StableRound.r2(sum("value")).as("total_value"))
        .orderBy("window_start", "event_type")
  }

  /** Stream dedup analog: first event per (user, type) by time —
    * `dropDuplicates` semantics made deterministic via row_number. */
  val ev02FirstPerKey: Q = Q(
    "ev02_first_per_key",
    """SELECT user_id, event_type, event_id, ts FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rk
      |  FROM events) WHERE rk = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }

  /** Gap-based sessionization (30-minute inactivity gap): the batch
    * formulation of `flatMapGroupsWithState` session windows — lag + gap
    * flag + running sum = session id; one shuffle on user_id. */
  val ev03Sessionize: Q = Q(
    "ev03_sessionize",
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_no
      |  FROM g)
      |SELECT user_id, session_no, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  floor(sum(value) * 100 + 0.5) / 100 AS session_value
      |FROM s GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin) { (s, d) =>
    sessionize(Tables.events(s, d))
  }

  /** The ev03 transform over any (user_id, ts, event_id, value) frame —
    * factored out so EventPropertySpec can drive it with arbitrary
    * generated event sets. */
  def sessionize(events: DataFrame): DataFrame = {
    // event_id tie-breaks BOTH windows: events tied on ts at a session
    // boundary must fold into the running sum in the same order the lag
    // window used, or session_no is nondeterministic (oracle SQL matches).
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wCum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("session_no", sum("new_session").over(wCum))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"),
        StableRound.r2(sum("value")).as("session_value"))
      .orderBy("user_id", "session_no")
  }

  /** JSON property extraction from the opaque props column (the lake-native
    * upgrade of the reference's opaque-xml pass-through, ref
    * ola/CommandLog.sql:17 / SURVEY §1.2). */
  val ev04JsonProps: Q = Q(
    "ev04_json_props",
    """SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k,
      |  event_type
      |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("event_type"))
      .orderBy("event_id")
  }

  /** Sliding 1-hour RANGE-frame window per user: for every event, the
    * sum/count of that user's events in the preceding hour — the
    * continuous form of ev01's tumbling buckets (trailing-window features
    * for sessions/rate-limiting). The frame is keyed in MICROSECONDS
    * (unix_micros / epoch_us) on both engines: a seconds-granularity key
    * would silently merge sub-second neighbors into the frame. One
    * shuffle on user_id; the range frame is evaluated with a sliding
    * two-pointer pass over each partition, not a per-row rescan. */
  val ev05SlidingWindow: Q = Q(
    "ev05_sliding_window",
    """SELECT user_id, event_id,
      |  floor(sum(value) OVER w * 100 + 0.5) / 100 AS hour_value,
      |  count(*) OVER w AS hour_events
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("tus"))
      .rangeBetween(-3600000000L, 0)
    Tables.events(s, d)
      .withColumn("tus", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"),
        StableRound.r2(sum("value").over(w)).as("hour_value"),
        count(lit(1)).over(w).as("hour_events"))
      .orderBy("user_id", "event_id")
  }

  /** Each purchase joined to the same user's clicks in the preceding hour
    * — the BATCH form of the stream-stream time-bounded join
    * ([[Streams.purchasesWithRecentClicks]]; StreamingSpec proves the two
    * equal). Scale shape: equi-key on user_id carries the shuffle; the
    * time band is a join residual, so the pair space is bounded per user
    * by the hour window — the attribution-join shape. */
  val ev06RecentClicks: Q = Q(
    "ev06_recent_clicks",
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
      |FROM events p JOIN events c
      |  ON p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND p.user_id = c.user_id
      |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      |ORDER BY purchase_id, click_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    p.join(c, p("user_id") === c("c_uid") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("click_id"))
      .orderBy("purchase_id", "click_id")
  }

  /** Sequential conversion funnel (view → click → purchase, each stage
    * strictly after the previous): per user, the earliest view, the
    * earliest click after that view, the earliest purchase after that
    * click, and the furthest stage reached — the classic product-analytics
    * sequence query and the batch form of a per-key ordered state machine
    * (`mapGroupsWithState` territory in a stream).
    *
    * Scale shape: ONE exchange on user_id — three unordered window
    * aggregates (each stage's conditional min references the previous
    * stage's result, so they stack as separate Window nodes) all reuse the
    * same hash partitioning, and the final one-row-per-user groupBy rides
    * it too. No joins, no re-shuffle, state per key is three timestamps. */
  val ev07Funnel: Q = Q(
    "ev07_funnel",
    """WITH s1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id) AS first_view
      |  FROM events),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > first_view
      |    THEN ts END) OVER (PARTITION BY user_id) AS first_click
      |  FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > first_click
      |    THEN ts END) OVER (PARTITION BY user_id) AS first_purchase
      |  FROM s2)
      |SELECT user_id, min(first_view) AS first_view,
      |  min(first_click) AS first_click, min(first_purchase) AS first_purchase,
      |  CASE WHEN min(first_purchase) IS NOT NULL THEN 3
      |       WHEN min(first_click) IS NOT NULL THEN 2
      |       WHEN min(first_view) IS NOT NULL THEN 1 ELSE 0 END AS stage,
      |  min(first_purchase) IS NOT NULL AS converted
      |FROM s3 GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    funnelFirsts(s, d)
      .select(col("user_id"), col("first_view"), col("first_click"),
        col("first_purchase"),
        when(col("first_purchase").isNotNull, 3)
          .when(col("first_click").isNotNull, 2)
          .when(col("first_view").isNotNull, 1).otherwise(0).as("stage"),
        col("first_purchase").isNotNull.as("converted"))
      .orderBy("user_id")
  }

  /** Per-user funnel stage timestamps (first_view / first_click /
    * first_purchase with the strict ordering constraints) — ev07's core,
    * shared with ev14's latency rollup. All three stage windows ride ONE
    * user_id exchange. */
  private def funnelFirsts(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id")
    Tables.events(s, d)
      .withColumn("first_view",
        min(when(col("event_type") === "view", col("ts"))).over(byUser))
      .withColumn("first_click",
        min(when(col("event_type") === "click" && col("ts") > col("first_view"),
          col("ts"))).over(byUser))
      .withColumn("first_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("first_click"), col("ts"))).over(byUser))
      .groupBy("user_id")
      .agg(min("first_view").as("first_view"),
        min("first_click").as("first_click"),
        min("first_purchase").as("first_purchase"))
  }

  /** Cohort retention (the other classic product-analytics matrix, next
    * to ev07's funnel): users are cohorted by the ISO week of their FIRST
    * event; each cell counts how many of a cohort's users were active
    * `week_offset` weeks later. Both engines truncate to Monday-start
    * weeks, so the day difference between two truncated weeks is an exact
    * multiple of 7 and the offset is integer-exact.
    *
    * Scale shape: ONE exchange on user_id — collect_set's map-side
    * partial dedupes each task's (user, week) pairs before the shuffle
    * (an event stream is massively redundant per user-week), and the
    * per-user week set is both the cohort (array_min, no join) and the
    * activity rows (explode). The final (cohort, offset) agg is a second,
    * already-tiny exchange counting pre-deduped users — count(*), not
    * countDistinct. */
  val ev08CohortRetention: Q = Q(
    "ev08_cohort_retention",
    """WITH uw AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
      |c AS (
      |  SELECT user_id, wk,
      |    min(wk) OVER (PARTITION BY user_id) AS cohort_week
      |  FROM uw)
      |SELECT cohort_week,
      |  CAST(date_diff('day', cohort_week, wk) / 7 AS BIGINT) AS week_offset,
      |  count(*) AS n_active_users
      |FROM c GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin) {
    (s, d) =>
      val uw = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
        .groupBy("user_id").agg(collect_set("wk").as("wks"))
      uw.select(col("user_id"), array_min(col("wks")).as("cohort_week"),
          explode(col("wks")).as("wk"))
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_active_users"))
        .orderBy("cohort_week", "week_offset")
  }

  /** Markov next-event transition matrix: for every consecutive event pair
    * per user, count (prev_type → type) transitions and the conditional
    * probability p(type | prev_type). The lag and the normalizing window
    * both key on small, bounded attributes, so at 100 TB this is one
    * shuffle on user_id for the lag pass, then a groups-only aggregation
    * (|event_type|² rows) — the normalization window runs over a
    * dimension-sized frame. The probability is a ratio of exact integer
    * counts: both engines convert int→double and divide with one correctly
    * rounded operation each, so the doubles are bit-identical before the
    * stable round. */
  val ev09Transitions: Q = Q(
    "ev09_transitions",
    """WITH t AS (
      |  SELECT event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev_type
      |  FROM events)
      |SELECT prev_type, event_type, count(*) AS n,
      |  floor(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type)
      |        * 10000 + 0.5) / 10000 AS p
      |FROM t WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, event_type""".stripMargin) { (s, d) =>
    // event_id tie-break: events tied on ts must produce the same
    // predecessor on both engines or the transition counts drift
    val lagW = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag("event_type", 1).over(lagW))
      .filter(col("prev_type").isNotNull)
      .groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", StableRound.r4(
        col("n") * lit(1.0) /
          sum("n").over(Window.partitionBy("prev_type"))))
      .orderBy("prev_type", "event_type")
  }

  /** Gaps-and-islands: runs of CONSECUTIVE active days per user, via the
    * row_number-difference technique (day − rn is constant within a run) —
    * the second classic sessionization form next to ev03's lag+gap flag.
    * The per-day rollup and the window share the same user_id-dominated
    * key, and islands are per-user-day rows (not events), so the window
    * pass runs over an already-reduced frame; at 100 TB the event scan
    * reduces to user-days map-side before anything shuffles. */
  val ev10ActiveIslands: Q = Q(
    "ev10_active_islands",
    """WITH days AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_ev
      |  FROM events GROUP BY 1, 2),
      |numbered AS (
      |  SELECT user_id, day, n_ev,
      |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      |  FROM days)
      |SELECT user_id,
      |  strftime(min(day), '%Y-%m-%d') AS island_start,
      |  strftime(max(day), '%Y-%m-%d') AS island_end,
      |  count(*) AS n_days, CAST(sum(n_ev) AS BIGINT) AS n_events
      |FROM (SELECT user_id, day, n_ev, day - CAST(rn AS INTEGER) AS grp
      |      FROM numbered)
      |GROUP BY user_id, grp
      |ORDER BY user_id, island_start""".stripMargin) { (s, d) =>
    activeIslands(Tables.events(s, d))
  }

  /** The ev10 transform over any (user_id, ts) frame — factored out for
    * EventPropertySpec. */
  def activeIslands(events: DataFrame): DataFrame = {
    // island bounds render as yyyy-MM-dd STRINGS: a bare DATE column
    // round-trips differently through the two engines' result paths
    // (datetime64 vs date object) and hash-mismatches on type alone
    val w = Window.partitionBy("user_id").orderBy("day")
    events
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_ev"))
      .withColumn("grp", date_sub(col("day"),
        row_number().over(w).cast("int")))
      .groupBy("user_id", "grp")
      .agg(date_format(min("day"), "yyyy-MM-dd").as("island_start"),
        date_format(max("day"), "yyyy-MM-dd").as("island_end"),
        count(lit(1)).as("n_days"), sum("n_ev").as("n_events"))
      .drop("grp")
      .orderBy("user_id", "island_start")
  }

  /** Rate-anomaly detection: hourly event counts per type, flagged where
    * the count sits more than 2.5 sample-stddevs from that type's mean —
    * the monitoring query an integrity pipeline runs over its OWN event
    * volume (a silent producer outage or a runaway duplicate source shows
    * up here before any content check fires). The z-score inputs are
    * integer counts, so both engines derive mean/stddev from identical
    * values; events reduce to (type, hour) groups map-side, and the
    * z window runs over a groups-only frame — at 100 TB the exchange
    * carries |types|·|hours| rows, never events. */
  val ev11RateAnomaly: Q = Q(
    "ev11_rate_anomaly",
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |z AS (
      |  SELECT event_type, hr, n,
      |    (n - avg(n) OVER (PARTITION BY event_type))
      |      / nullif(stddev_samp(n) OVER (PARTITION BY event_type), 0) AS z
      |  FROM hourly)
      |SELECT event_type, hr, n, floor(z * 10000 + 0.5) / 10000 AS z
      |FROM z WHERE z > 2.5 OR z < -2.5
      |ORDER BY event_type, hr""".stripMargin) { (s, d) =>
    // nullif guard: a type whose hourly counts are all equal (a steady
    // heartbeat producer — exactly a workload this monitor watches) has
    // stddev 0; dividing by it THROWS under Spark 4's default ANSI mode,
    // and even non-ANSI Spark (NULL) vs DuckDB (NaN, which sorts > 2.5)
    // disagree. NULL z on both engines → the row drops from the filter on
    // both — a constant-rate type has no outliers by definition.
    val w = Window.partitionBy("event_type")
    Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
      .withColumn("z",
        (col("n") - avg("n").over(w)) /
          nullif(stddev_samp(col("n")).over(w), lit(0)))
      .filter(col("z") > 2.5 || col("z") < -2.5)
      .select(col("event_type"), col("hr"), col("n"),
        StableRound.r4(col("z")).as("z"))
      .orderBy("event_type", "hr")
  }

  /** Peak concurrency per day — the interval-overlap counting pattern
    * (the one windowed shape ev01-ev11 did not cover): each ev03 session
    * contributes +1 at its (day-clipped) start and −1 at its end, a
    * running sum over the ordered deltas is the live concurrency, and
    * the per-day max with its first-reached timestamp is the capacity
    * answer ("how many sessions were open at once, and when").
    * Sessions spanning midnight are split across the days they touch.
    * Tie rule: starts sort before ends at the same instant (delta DESC),
    * so touching sessions count as concurrent; (user_id, session_no)
    * complete the ORDER BY so the running sum is deterministic.
    *
    * Scale shape: the sweep runs on SESSION endpoints (2 rows per
    * session-day — orders of magnitude fewer than events), partitioned
    * by day, so each window group is one day's sessions. A day with
    * ~10⁹+ sessions would need the associative two-level scan (partial
    * sums per partition + prefix offsets) or an hour sub-key with
    * carried-in counts — the same primitive, noted not spelled. */
  val ev12PeakConcurrency: Q = Q(
    "ev12_peak_concurrency",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR date_diff('second', lag(ts) OVER w, ts) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_no
      |  FROM g),
      |sess AS (SELECT user_id, session_no, min(ts) AS session_start,
      |           max(ts) AS session_end
      |         FROM s GROUP BY 1, 2),
      |d AS (SELECT user_id, session_no, session_start, session_end,
      |        CAST(unnest(generate_series(CAST(session_start AS DATE),
      |          CAST(session_end AS DATE), INTERVAL 1 DAY)) AS DATE) AS day
      |      FROM sess),
      |del AS (
      |  SELECT day, user_id, session_no,
      |    greatest(session_start, CAST(day AS TIMESTAMP)) AS t, 1 AS delta
      |  FROM d
      |  UNION ALL
      |  SELECT day, user_id, session_no,
      |    least(session_end, CAST(day AS TIMESTAMP) + INTERVAL 1 DAY
      |      - INTERVAL 1 MICROSECOND), -1
      |  FROM d),
      |r AS (SELECT day, t, delta,
      |        sum(delta) OVER (PARTITION BY day
      |          ORDER BY t, delta DESC, user_id, session_no
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |      FROM del),
      |p AS (SELECT day, t, delta, conc,
      |        max(conc) OVER (PARTITION BY day) AS peak FROM r)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(peak AS BIGINT) AS peak_concurrency,
      |  min(CASE WHEN conc = peak THEN t END) AS peak_ts,
      |  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_sessions
      |FROM p GROUP BY day, peak ORDER BY day""".stripMargin) { (s, d) =>
    // ONE in-row fan-out makes both endpoint deltas from each
    // session-day row (+1 at the clipped start, −1 at the clipped
    // end), so the session frame has a single consumer chain and needs
    // no checkpoint of its own — the round-13 two-projection union
    // paid a localCheckpoint job plus a second scan for what a
    // 2-element explode expresses in the row (the dd16 band fan-out
    // pattern; `base` below stays materialized, it genuinely feeds two
    // consumers)
    val sess = sessionize(Tables.events(s, d))
      .select("user_id", "session_no", "session_start", "session_end")
      .withColumn("day", explode(expr(
        "sequence(to_date(session_start), to_date(session_end))")))
    val dayStart = col("day").cast("timestamp")
    val dayEnd = expr(
      "CAST(day AS TIMESTAMP) + INTERVAL '1' DAY - INTERVAL '1' MICROSECOND")
    val del = sess.select(col("day"), col("user_id"), col("session_no"),
        explode(array(
          struct(greatest(col("session_start"), dayStart).as("t"),
            lit(1).as("delta")),
          struct(least(col("session_end"), dayEnd).as("t"),
            lit(-1).as("delta")))).as("e"))
      .select(col("day"), col("user_id"), col("session_no"),
        col("e.t").as("t"), col("e.delta").as("delta"))
    // TWO-PASS PREFIX for the sweep (pipe07/pipe08's recipe). The bucket
    // is the ABSOLUTE epoch hour (floor(unix_micros/3600e6)) — a pure
    // function of the instant, so the soundness invariant (bucket
    // nondecreasing in t within a day partition; equal t ⇒ equal bucket,
    // so the delta-DESC tiebreak never crosses a bucket) holds in EVERY
    // session timezone unconditionally. hour(t) would follow
    // spark.sql.session.timeZone and break the invariant under historical
    // offset changes; under the engine's UTC pin the two bucketings
    // partition identically (a UTC day spans epoch hours h..h+23), so
    // results are unchanged — this form just removes the assumption.
    // The running concurrency partitions by (day, bucket) — sessions/24
    // per task instead of a whole day on one sorting reducer — plus a
    // broadcast per-(day, bucket) offset. The per-day PEAK then comes
    // from a map-side-combined groupBy joined back (|days|-sized, always
    // broadcastable), not a day-wide max window.
    val base = del.withColumn("bucket",
      expr("floor(unix_micros(t) / 3600000000)")).materialized
    val offs = base.groupBy("day", "bucket").agg(sum("delta").as("bd"))
      .withColumn("off",
        sum("bd").over(Window.partitionBy("day").orderBy("bucket"))
          - col("bd"))
      .select("day", "bucket", "off")
    val wLoc = Window.partitionBy("day", "bucket")
      .orderBy(col("t"), col("delta").desc, col("user_id"),
        col("session_no"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val conc = base.withColumn("lconc", sum("delta").over(wLoc))
      .join(broadcast(offs), Seq("day", "bucket"))
      .withColumn("conc", col("off") + col("lconc"))
    // Peak + its first-reached instant in the SAME aggregation: max_by
    // ordered by (conc, -t) picks, among the max-concurrency rows, the
    // earliest t — exactly the oracle's min(t WHERE conc = peak). The
    // round-13 spelling computed a per-day peak table and broadcast it
    // back, which priced a SECOND pass over the concurrency stream (the
    // window chain re-ran for the probe side) — one aggregation reads it
    // once, and at 10⁹ sessions/day the saved pass is corpus-sized.
    conc.groupBy("day")
      .agg(max("conc").as("peak_concurrency"),
        max_by(col("t"),
          struct(col("conc"), (-unix_micros(col("t"))).as("neg")))
          .as("peak_ts"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_sessions"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("peak_concurrency"), col("peak_ts"), col("n_sessions"))
      .orderBy("day")
  }

  /** DAU + 7-day rolling distinct actives per day (the DAU/WAU pair) —
    * the windowed-DISTINCT operator every engagement dashboard runs, and
    * a shape worth getting right: a sliding count(DISTINCT) window or a
    * day-range self-join rescans the event stream once per day it
    * covers. Instead the stream collapses ONCE to distinct (user,
    * active-day) rows, each row fans out in-row to the ≤7 cover days it
    * contributes to, and one aggregation counts distinct users per cover
    * day — DAU rides the same exchange as a conditional distinct (only
    * rows whose active day IS the cover day). The fan-out volume is
    * 7·|user-days|, independent of raw event count; at 100 TB the first
    * distinct is the only corpus-sized exchange. Cover days with no
    * activity of their own (the tail past the last event) are dropped by
    * the dau > 0 gate on both engines. */
  val ev13RollingActives: Q = Q(
    "ev13_rolling_actives",
    """WITH act AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |cov AS (
      |  SELECT user_id, d, d + CAST(o AS INTEGER) AS cover_day
      |  FROM act, range(7) AS t(o))
      |SELECT strftime(cover_day, '%Y-%m-%d') AS day,
      |  count(DISTINCT CASE WHEN d = cover_day THEN user_id END) AS dau,
      |  count(DISTINCT user_id) AS active_7d
      |FROM cov GROUP BY cover_day
      |HAVING count(DISTINCT CASE WHEN d = cover_day THEN user_id END) > 0
      |ORDER BY day""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .select(col("user_id"), col("d"),
        explode(sequence(lit(0), lit(6))).as("o"))
      .select(col("user_id"), col("d"),
        date_add(col("d"), col("o")).as("cover_day"))
      .groupBy("cover_day")
      .agg(
        countDistinct(when(col("d") === col("cover_day"), col("user_id")))
          .as("dau"),
        countDistinct("user_id").as("active_7d"))
      .filter(col("dau") > 0)
      .select(date_format(col("cover_day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("active_7d"))
      .orderBy("day")
  }

  /** Funnel conversion-latency percentiles per view-cohort week — the
    * "how fast do converters convert" rollup every funnel ships next to
    * ev07's "how many". Latency = first_purchase − first_view in FLOOR
    * seconds (the cast-as-long discipline ev03 uses, = DuckDB's
    * date_diff('second')); cohort = Monday-truncated week of first_view
    * (ev08's convention, emitted as a string); p50/p90 are exact
    * interpolated percentiles rounded to 4 dp on both engines (q26's
    * convention — at 100 TB swap in approx_percentile, same plan shape).
    * Scale: the stage windows ride ev07's single user_id exchange; the
    * percentile rollup exchanges one row per CONVERTED user into
    * week-sized groups. */
  val ev14ConversionLatency: Q = Q(
    "ev14_conversion_latency",
    """WITH s1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
      |    OVER (PARTITION BY user_id) AS first_view
      |  FROM events),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > first_view
      |    THEN ts END) OVER (PARTITION BY user_id) AS first_click
      |  FROM s1),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > first_click
      |    THEN ts END) OVER (PARTITION BY user_id) AS first_purchase
      |  FROM s2),
      |f AS (SELECT user_id, min(first_view) AS fv,
      |        min(first_purchase) AS fp
      |      FROM s3 GROUP BY user_id),
      |conv AS (
      |  SELECT strftime(date_trunc('week', fv), '%Y-%m-%d') AS cohort_week,
      |    date_diff('second', fv, fp) AS latency_sec
      |  FROM f WHERE fp IS NOT NULL)
      |SELECT cohort_week, count(*) AS n_converted,
      |  floor(quantile_cont(latency_sec, 0.5) * 10000 + 0.5) / 10000
      |    AS p50_sec,
      |  floor(quantile_cont(latency_sec, 0.9) * 10000 + 0.5) / 10000
      |    AS p90_sec
      |FROM conv GROUP BY cohort_week ORDER BY cohort_week""".stripMargin) {
    (s, d) =>
    funnelFirsts(s, d)
      .filter(col("first_purchase").isNotNull)
      .select(
        date_format(date_trunc("week", col("first_view")), "yyyy-MM-dd")
          .as("cohort_week"),
        (col("first_purchase").cast("long") -
          col("first_view").cast("long")).as("latency_sec"))
      .groupBy("cohort_week")
      .agg(count(lit(1)).as("n_converted"),
        StableRound.r4(expr("percentile(latency_sec, 0.5)")).as("p50_sec"),
        StableRound.r4(expr("percentile(latency_sec, 0.9)")).as("p90_sec"))
      .orderBy("cohort_week")
  }

  val queries: Seq[Q] = Seq(ev01TumblingWindow, ev02FirstPerKey,
    ev03Sessionize, ev04JsonProps, ev05SlidingWindow, ev06RecentClicks,
    ev07Funnel, ev08CohortRetention, ev09Transitions, ev10ActiveIslands,
    ev11RateAnomaly, ev12PeakConcurrency, ev13RollingActives,
    ev14ConversionLatency)
}
