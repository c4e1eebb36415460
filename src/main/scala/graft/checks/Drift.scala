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

  val queries: Seq[Q] = Seq(checkDrift)
}
