package graft.checks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.functions.StableRound.{r2, r4}
import graft.tables.Tables

/** Run-over-run PROFILE DRIFT — the reference's state-history trending
  * re-expressed for a lake (ref IntegrityChecks_VLDB.sql:56-61 keeps
  * Count/AvgRunDuration/PreviousRunDate per object; :700-722 shuffles the
  * current run into the Previous* columns on every pass). The reference
  * trends RUNTIME stats; the integrity question a VLDB operator actually
  * asks of history is "did this table change SHAPE overnight?" — so the
  * lake analog trends the per-table data profile (row count, column
  * means) and flags deltas beyond a band.
  *
  * Two faces, one metric vocabulary:
  *
  *  - [[Drift.profile]]: the CURRENT profile, one narrow
  *    (table_name, metric, value) frame — one aggregate-only scan per
  *    table (no shuffle beyond the single-row agg), persisted between
  *    runs by [[graft.state.ProfileStore]] exactly as the reference
  *    persists its Previous* columns, and compared by [[Drift.compare]].
  *  - [[Drift.checkDrift]]: the oracle-gated twin. A persisted file
  *    cannot be a DuckDB oracle input, so "the previous run" is modeled
  *    as a deterministic date-bounded snapshot of the same fixtures
  *    (the data the nightly run would have seen before the last loads
  *    arrived) computed IN THE SAME SCAN via conditional aggregates —
  *    both engines state both generations from one relation, and the
  *    comparison is hash-checkable.
  *
  * Scale: profiles are one row per (table, metric) — driver-small at
  * 100k tables — and each table costs exactly one aggregate-only pass
  * (the same pass CHECKTABLE already pays); the drift join is
  * metric-count-sized. */
object Drift {

  /** 5% band: |curr - prev| / |prev| beyond this flags the metric. */
  val DefaultBand = 0.05

  // snapshot cutoffs for the oracle-gated twin: the fixture date ranges
  // put roughly the first two-thirds of lineitem/orders and the first
  // three weeks of events before these instants
  private val TpchCut = "1999-01-01 00:00:00"
  private val EventsCut = "2024-01-21 00:00:00"

  /** (metric name, stable-rounded aggregate builder). The builder takes
    * an optional snapshot predicate: None → aggregate the full table
    * (the "current" generation), Some(p) → aggregate only snapshot rows
    * (the modeled "previous" generation) via the null-skipping
    * conditional-aggregate form, so BOTH generations ride one scan. */
  private type Metric = (String, Option[Column] => Column)

  private def cnt: Option[Column] => Column = {
    case None    => count(lit(1)).cast("double")
    case Some(p) => count(when(p, 1)).cast("double")
  }
  private def avgOf(c: String, round: Column => Column)
      : Option[Column] => Column = {
    case None    => round(avg(col(c)))
    case Some(p) => round(avg(when(p, col(c))))
  }

  private def lineitemMetrics: Seq[Metric] = Seq(
    ("n_rows", cnt),
    ("avg_quantity", avgOf("l_quantity", r4)),
    ("avg_extendedprice", avgOf("l_extendedprice", r2)))
  private def ordersMetrics: Seq[Metric] = Seq(
    ("n_rows", cnt),
    ("avg_totalprice", avgOf("o_totalprice", r2)))
  private def eventsMetrics: Seq[Metric] = Seq(
    ("n_rows", cnt),
    ("avg_value", avgOf("value", r4)))

  /** One (table_name, metric, prev_value, curr_value) row per metric,
    * both generations from ONE aggregate-only scan, unpivoted over the
    * single agg row (driver-free: the explode runs on the 1-row frame). */
  private def profiled(df: DataFrame, table: String, pred: Column,
      metrics: Seq[Metric]): DataFrame = {
    val aggs = metrics.flatMap { case (m, f) =>
      Seq(f(Some(pred)).as(s"prev_$m"), f(None).as(s"curr_$m"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(lit(table).as("table_name"),
        explode(array(metrics.map { case (m, _) =>
          struct(lit(m).as("metric"),
            col(s"prev_$m").as("prev_value"),
            col(s"curr_$m").as("curr_value"))
        }: _*)).as("kv"))
      .select(col("table_name"), col("kv.metric").as("metric"),
        col("kv.prev_value").as("prev_value"),
        col("kv.curr_value").as("curr_value"))
  }

  /** The CURRENT profile of every profiled fixture table:
    * (table_name, metric, value). This is what a production run persists
    * via [[graft.state.ProfileStore]] after its checks pass. */
  def profile(s: SparkSession, d: String): DataFrame = {
    def one(df: DataFrame, table: String, metrics: Seq[Metric]): DataFrame = {
      val aggs = metrics.map { case (m, f) => f(None).as(m) }
      val stacked = metrics.map { case (m, _) => (lit(m), col(m)) }
      df.agg(aggs.head, aggs.tail: _*)
        .select(lit(table).as("table_name"),
          explode(array(stacked.map { case (m, v) =>
            struct(m.as("metric"), v.as("value"))
          }: _*)).as("kv"))
        .select(col("table_name"), col("kv.metric").as("metric"),
          col("kv.value").as("value"))
    }
    one(Tables.lineitem(s, d), "lineitem", lineitemMetrics)
      .union(one(Tables.orders(s, d), "orders", ordersMetrics))
      .union(one(Tables.events(s, d), "events", eventsMetrics))
  }

  /** Drift rows from two profile generations: every metric present in
    * either, with its relative delta and the band flag. A metric present
    * in only one generation (a table appeared/vanished — the loudest
    * drift of all) surfaces with the missing side null and is_drifted=1. */
  def compare(prev: DataFrame, curr: DataFrame,
      band: Double = DefaultBand): DataFrame = {
    val p = prev.select(col("table_name"), col("metric"),
      col("value").as("prev_value"))
    val c = curr.select(col("table_name"), col("metric"),
      col("value").as("curr_value"))
    val delta = r4(abs(col("curr_value") - col("prev_value")) /
      nullif(abs(col("prev_value")), lit(0.0)))
    p.join(c, Seq("table_name", "metric"), "full_outer")
      .withColumn("rel_delta", delta)
      .withColumn("is_drifted",
        when(col("prev_value").isNull || col("curr_value").isNull, 1L)
          .when(col("rel_delta") > band, 1L).otherwise(0L))
      .orderBy("table_name", "metric")
  }

  /** The oracle-gated drift check: previous = the date-bounded snapshot
    * generation, current = the full tables, compared at the default 5%
    * band. On the fixtures the row counts drift (the post-cutoff loads)
    * while the column means hold — exactly the separation the band is
    * for. */
  val checkDrift: Q = Q(
    "check_drift",
    s"""WITH li AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS curr_n_rows,
       |    CAST(count(CASE WHEN l_shipdate < TIMESTAMP '$TpchCut'
       |                    THEN 1 END) AS DOUBLE) AS prev_n_rows,
       |    floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS curr_avg_quantity,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '$TpchCut'
       |              THEN l_quantity END) * 10000 + 0.5) / 10000
       |      AS prev_avg_quantity,
       |    floor(avg(l_extendedprice) * 100 + 0.5) / 100
       |      AS curr_avg_extendedprice,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '$TpchCut'
       |              THEN l_extendedprice END) * 100 + 0.5) / 100
       |      AS prev_avg_extendedprice
       |  FROM lineitem),
       |ord AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS curr_n_rows,
       |    CAST(count(CASE WHEN o_orderdate < TIMESTAMP '$TpchCut'
       |                    THEN 1 END) AS DOUBLE) AS prev_n_rows,
       |    floor(avg(o_totalprice) * 100 + 0.5) / 100 AS curr_avg_totalprice,
       |    floor(avg(CASE WHEN o_orderdate < TIMESTAMP '$TpchCut'
       |              THEN o_totalprice END) * 100 + 0.5) / 100
       |      AS prev_avg_totalprice
       |  FROM orders),
       |ev AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS curr_n_rows,
       |    CAST(count(CASE WHEN ts < TIMESTAMP '$EventsCut'
       |                    THEN 1 END) AS DOUBLE) AS prev_n_rows,
       |    floor(avg(value) * 10000 + 0.5) / 10000 AS curr_avg_value,
       |    floor(avg(CASE WHEN ts < TIMESTAMP '$EventsCut'
       |              THEN value END) * 10000 + 0.5) / 10000
       |      AS prev_avg_value
       |  FROM events),
       |prof AS (
       |  SELECT 'lineitem' AS table_name, 'n_rows' AS metric,
       |    prev_n_rows AS prev_value, curr_n_rows AS curr_value FROM li
       |  UNION ALL SELECT 'lineitem', 'avg_quantity',
       |    prev_avg_quantity, curr_avg_quantity FROM li
       |  UNION ALL SELECT 'lineitem', 'avg_extendedprice',
       |    prev_avg_extendedprice, curr_avg_extendedprice FROM li
       |  UNION ALL SELECT 'orders', 'n_rows',
       |    prev_n_rows, curr_n_rows FROM ord
       |  UNION ALL SELECT 'orders', 'avg_totalprice',
       |    prev_avg_totalprice, curr_avg_totalprice FROM ord
       |  UNION ALL SELECT 'events', 'n_rows',
       |    prev_n_rows, curr_n_rows FROM ev
       |  UNION ALL SELECT 'events', 'avg_value',
       |    prev_avg_value, curr_avg_value FROM ev),
       |scored AS (
       |  SELECT table_name, metric, prev_value, curr_value,
       |    floor(abs(curr_value - prev_value)
       |          / nullif(abs(prev_value), 0) * 10000 + 0.5) / 10000
       |      AS rel_delta
       |  FROM prof)
       |SELECT table_name, metric, prev_value, curr_value, rel_delta,
       |  CAST(CASE WHEN rel_delta > 0.05 THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_drifted
       |FROM scored ORDER BY table_name, metric""".stripMargin) { (s, d) =>
    val li = profiled(Tables.lineitem(s, d), "lineitem",
      col("l_shipdate") < lit(TpchCut).cast("timestamp"), lineitemMetrics)
    val ord = profiled(Tables.orders(s, d), "orders",
      col("o_orderdate") < lit(TpchCut).cast("timestamp"), ordersMetrics)
    val ev = profiled(Tables.events(s, d), "events",
      col("ts") < lit(EventsCut).cast("timestamp"), eventsMetrics)
    val delta = r4(abs(col("curr_value") - col("prev_value")) /
      nullif(abs(col("prev_value")), lit(0.0)))
    li.union(ord).union(ev)
      .withColumn("rel_delta", delta)
      .withColumn("is_drifted",
        when(col("rel_delta") > DefaultBand, 1L).otherwise(0L))
      .orderBy("table_name", "metric")
  }

  // trend cutoffs: four modeled generations per table (three date-bounded
  // snapshots + the full table), all from ONE conditional-aggregate scan
  private val TpchCuts = Seq(
    "1997-01-01 00:00:00", "1998-01-01 00:00:00", TpchCut)
  private val EventsCuts = Seq(
    "2024-01-07 00:00:00", "2024-01-14 00:00:00", EventsCut)

  /** One (table_name, metric, v1..v4) row per metric: the four modeled
    * generations of [[checkDriftTrend]], still one aggregate-only scan
    * per table. */
  private def trended(df: DataFrame, table: String, dateCol: Column,
      cuts: Seq[String], metrics: Seq[Metric]): DataFrame = {
    val preds = cuts.map(c => dateCol < lit(c).cast("timestamp"))
    val aggs = metrics.flatMap { case (m, f) =>
      preds.zipWithIndex.map { case (p, i) =>
        f(Some(p)).as(s"v${i + 1}_$m")
      } :+ f(None).as(s"v4_$m")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(lit(table).as("table_name"),
        explode(array(metrics.map { case (m, _) =>
          struct(lit(m).as("metric"),
            col(s"v1_$m").as("v1"), col(s"v2_$m").as("v2"),
            col(s"v3_$m").as("v3"), col(s"v4_$m").as("v4"))
        }: _*)).as("kv"))
      .select(col("table_name"), col("kv.metric").as("metric"),
        col("kv.v1").as("v1"), col("kv.v2").as("v2"),
        col("kv.v3").as("v3"), col("kv.v4").as("v4"))
  }

  /** The WIDENED drift check: four generations instead of two, so the
    * flag vocabulary gains ACCELERATION (ref IC:706's incremental-average
    * recurrence `a += (d - a) / n`, applied to the profile's step deltas
    * — over the two prior deltas it telescopes to their mean). A metric
    * is `is_drifted` when the latest step moved beyond the 5% band (the
    * old check), and `is_accelerating` when it is ALSO moving more than
    * 2× its own historical average step — shape change that is getting
    * worse, not settling. [[graft.state.ProfileStore.trend]] states the
    * same recurrence over the PERSISTED N-generation history; this
    * oracle-gated twin models the generations as date-bounded snapshots
    * so DuckDB can restate every number from the same relation. */
  val checkDriftTrend: Q = Q(
    "check_drift_trend",
    s"""WITH li AS (SELECT
       |    CAST(count(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(0)}'
       |      THEN 1 END) AS DOUBLE) AS v1_n,
       |    CAST(count(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(1)}'
       |      THEN 1 END) AS DOUBLE) AS v2_n,
       |    CAST(count(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(2)}'
       |      THEN 1 END) AS DOUBLE) AS v3_n,
       |    CAST(count(*) AS DOUBLE) AS v4_n,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(0)}'
       |      THEN l_quantity END) * 10000 + 0.5) / 10000 AS v1_q,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(1)}'
       |      THEN l_quantity END) * 10000 + 0.5) / 10000 AS v2_q,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(2)}'
       |      THEN l_quantity END) * 10000 + 0.5) / 10000 AS v3_q,
       |    floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS v4_q,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(0)}'
       |      THEN l_extendedprice END) * 100 + 0.5) / 100 AS v1_e,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(1)}'
       |      THEN l_extendedprice END) * 100 + 0.5) / 100 AS v2_e,
       |    floor(avg(CASE WHEN l_shipdate < TIMESTAMP '${TpchCuts(2)}'
       |      THEN l_extendedprice END) * 100 + 0.5) / 100 AS v3_e,
       |    floor(avg(l_extendedprice) * 100 + 0.5) / 100 AS v4_e
       |  FROM lineitem),
       |ord AS (SELECT
       |    CAST(count(CASE WHEN o_orderdate < TIMESTAMP '${TpchCuts(0)}'
       |      THEN 1 END) AS DOUBLE) AS v1_n,
       |    CAST(count(CASE WHEN o_orderdate < TIMESTAMP '${TpchCuts(1)}'
       |      THEN 1 END) AS DOUBLE) AS v2_n,
       |    CAST(count(CASE WHEN o_orderdate < TIMESTAMP '${TpchCuts(2)}'
       |      THEN 1 END) AS DOUBLE) AS v3_n,
       |    CAST(count(*) AS DOUBLE) AS v4_n,
       |    floor(avg(CASE WHEN o_orderdate < TIMESTAMP '${TpchCuts(0)}'
       |      THEN o_totalprice END) * 100 + 0.5) / 100 AS v1_t,
       |    floor(avg(CASE WHEN o_orderdate < TIMESTAMP '${TpchCuts(1)}'
       |      THEN o_totalprice END) * 100 + 0.5) / 100 AS v2_t,
       |    floor(avg(CASE WHEN o_orderdate < TIMESTAMP '${TpchCuts(2)}'
       |      THEN o_totalprice END) * 100 + 0.5) / 100 AS v3_t,
       |    floor(avg(o_totalprice) * 100 + 0.5) / 100 AS v4_t
       |  FROM orders),
       |ev AS (SELECT
       |    CAST(count(CASE WHEN ts < TIMESTAMP '${EventsCuts(0)}'
       |      THEN 1 END) AS DOUBLE) AS v1_n,
       |    CAST(count(CASE WHEN ts < TIMESTAMP '${EventsCuts(1)}'
       |      THEN 1 END) AS DOUBLE) AS v2_n,
       |    CAST(count(CASE WHEN ts < TIMESTAMP '${EventsCuts(2)}'
       |      THEN 1 END) AS DOUBLE) AS v3_n,
       |    CAST(count(*) AS DOUBLE) AS v4_n,
       |    floor(avg(CASE WHEN ts < TIMESTAMP '${EventsCuts(0)}'
       |      THEN value END) * 10000 + 0.5) / 10000 AS v1_v,
       |    floor(avg(CASE WHEN ts < TIMESTAMP '${EventsCuts(1)}'
       |      THEN value END) * 10000 + 0.5) / 10000 AS v2_v,
       |    floor(avg(CASE WHEN ts < TIMESTAMP '${EventsCuts(2)}'
       |      THEN value END) * 10000 + 0.5) / 10000 AS v3_v,
       |    floor(avg(value) * 10000 + 0.5) / 10000 AS v4_v
       |  FROM events),
       |prof AS (
       |  SELECT 'lineitem' AS table_name, 'n_rows' AS metric,
       |    v1_n AS v1, v2_n AS v2, v3_n AS v3, v4_n AS v4 FROM li
       |  UNION ALL SELECT 'lineitem', 'avg_quantity',
       |    v1_q, v2_q, v3_q, v4_q FROM li
       |  UNION ALL SELECT 'lineitem', 'avg_extendedprice',
       |    v1_e, v2_e, v3_e, v4_e FROM li
       |  UNION ALL SELECT 'orders', 'n_rows', v1_n, v2_n, v3_n, v4_n
       |    FROM ord
       |  UNION ALL SELECT 'orders', 'avg_totalprice', v1_t, v2_t, v3_t,
       |    v4_t FROM ord
       |  UNION ALL SELECT 'events', 'n_rows', v1_n, v2_n, v3_n, v4_n
       |    FROM ev
       |  UNION ALL SELECT 'events', 'avg_value', v1_v, v2_v, v3_v, v4_v
       |    FROM ev),
       |scored AS (
       |  SELECT table_name, metric, v3 AS prev_value, v4 AS curr_value,
       |    floor(abs(v2 - v1) / nullif(abs(v1), 0) * 10000 + 0.5) / 10000
       |      AS d2,
       |    floor(abs(v3 - v2) / nullif(abs(v2), 0) * 10000 + 0.5) / 10000
       |      AS d3,
       |    floor(abs(v4 - v3) / nullif(abs(v3), 0) * 10000 + 0.5) / 10000
       |      AS d4
       |  FROM prof),
       |trended AS (
       |  SELECT *, floor((d2 + d3) / 2 * 10000 + 0.5) / 10000
       |    AS avg_prior_delta
       |  FROM scored)
       |SELECT table_name, metric, prev_value, curr_value, d2, d3, d4,
       |  avg_prior_delta,
       |  CAST(CASE WHEN d4 > 0.05 THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_drifted,
       |  CAST(CASE WHEN d4 > 0.05 AND d4 > 2 * avg_prior_delta
       |    THEN 1 ELSE 0 END AS BIGINT) AS is_accelerating
       |FROM trended ORDER BY table_name, metric""".stripMargin) { (s, d) =>
    val li = trended(Tables.lineitem(s, d), "lineitem",
      col("l_shipdate"), TpchCuts, lineitemMetrics)
    val ord = trended(Tables.orders(s, d), "orders",
      col("o_orderdate"), TpchCuts, ordersMetrics)
    val ev = trended(Tables.events(s, d), "events",
      col("ts"), EventsCuts, eventsMetrics)
    def rel(a: Column, b: Column): Column =
      r4(abs(b - a) / nullif(abs(a), lit(0.0)))
    li.union(ord).union(ev)
      .withColumn("d2", rel(col("v1"), col("v2")))
      .withColumn("d3", rel(col("v2"), col("v3")))
      .withColumn("d4", rel(col("v3"), col("v4")))
      // IC:706's recurrence over the two prior deltas = their mean
      .withColumn("avg_prior_delta", r4((col("d2") + col("d3")) / 2))
      .withColumn("is_drifted",
        when(col("d4") > DefaultBand, 1L).otherwise(0L))
      .withColumn("is_accelerating",
        when(col("d4") > DefaultBand &&
          col("d4") > lit(2.0) * col("avg_prior_delta"), 1L)
          .otherwise(0L))
      .select(col("table_name"), col("metric"),
        col("v3").as("prev_value"), col("v4").as("curr_value"),
        col("d2"), col("d3"), col("d4"), col("avg_prior_delta"),
        col("is_drifted"), col("is_accelerating"))
      .orderBy("table_name", "metric")
  }

  val queries: Seq[Q] = Seq(checkDrift, checkDriftTrend)
}
