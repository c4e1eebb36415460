package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.StableRound
import graft.tables.Tables

/** Scale techniques as first-class, oracle-checked operators: the moves
  * that keep aggregations healthy on a 1000-executor cluster — salting a
  * low-cardinality/skewed group key, exact two-stage distinct, and
  * sketch-based distinct for when exactness can be traded for a constant
  * memory footprint. All are EXACT (except the sketch, which is bounded
  * by a spec) so the same DuckDB oracle applies.
  */
object ScaleOps {

  /** Salted two-stage aggregation. groupBy(event_type) has only ~5
    * distinct keys — at cluster scale that means ≤5 reduce tasks carry
    * the whole table (and one hot key can carry most of it). Salting
    * fans stage 1 out to keys × 16 partial aggregates; stage 2 combines
    * 80 tiny rows. Exact for algebraic aggregates (sum/count, avg =
    * sum/count at the end). The salt is deterministic (hash of a stable
    * column, not rand()) so runs are reproducible. */
  val q22SaltedAgg: Q = Q(
    "q22_salted_agg",
    """SELECT event_type, count(*) AS n_events,
      |  floor(sum(value) * 100 + 0.5) / 100 AS total_value,
      |  floor(sum(value) / count(*) * 10000 + 0.5) / 10000 AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
      val salted = Tables.events(s, d)
        .withColumn("salt", pmod(hash(col("event_id")), lit(16)))
      val partial = salted.groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum("value").as("pv"))
      partial.groupBy("event_type")
        .agg(sum("pn").as("n_events"),
          StableRound.r2(sum("pv")).as("total_value"),
          StableRound.r4(sum("pv") / sum("pn")).as("avg_value"))
        .orderBy("event_type")
  }

  /** Exact distinct-count without countDistinct's planner expansion:
    * stage 1 shuffles on the COMPOSITE (event_type, user_id) key — high
    * cardinality, skew-proof by construction — stage 2 counts rows per
    * group. This is the shape that survives a hot group key at 100 TB,
    * because no single reducer ever sees all of one event_type. */
  val q23TwoStageDistinct: Q = Q(
    "q23_twostage_distinct",
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .select("event_type", "user_id").distinct()
        .groupBy("event_type")
        // count(col), not count(*): count(DISTINCT user_id) ignores NULL
        // users and this stage must agree with it
        .agg(count(col("user_id")).as("n_users"))
        .orderBy("event_type")
  }

  /** HLL++ sketch distinct vs exact, with the observed relative error —
    * the O(1)-memory path for distinct counts over 100 TB (exactness
    * traded for a mergeable fixed-size sketch). Rows-only gate (DuckDB's
    * HLL implementation differs); `ScaleOpsSpec` bounds the error. */
  val checkDistinctSketch: Q = Q.noOracle("check_distinct_sketch") { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("sketch"))
      .withColumn("rel_err",
        round(abs(col("sketch") - col("exact")) / col("exact"), 4))
      .orderBy("event_type")
  }

  /** Quantile SKETCH vs exact — the O(1)-memory percentile path at 100 TB
    * (KLL/Greenwald-Khanna-style mergeable sketch behind
    * `approx_percentile`, accuracy set by the relative-error parameter),
    * alongside the exact values and the observed absolute error.
    * Rows-only gate like the HLL sketch (sketch internals are
    * engine-specific); `ScaleOpsSpec` bounds the error. */
  val checkQuantileSketch: Q = Q.noOracle("check_quantile_sketch") { (s, d) =>
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("exact_p50"),
        expr("approx_percentile(value, 0.5, 1000)").as("sketch_p50"),
        expr("percentile(value, 0.99)").as("exact_p99"),
        expr("approx_percentile(value, 0.99, 1000)").as("sketch_p99"))
      .withColumn("err_p50", abs(col("sketch_p50") - col("exact_p50")))
      .withColumn("err_p99", abs(col("sketch_p99") - col("exact_p99")))
      .orderBy("event_type")
  }

  /** Exact percentiles (sort-based `percentile`, linear interpolation —
    * same contract as DuckDB's quantile_cont). At 100 TB the sketch
    * alternative is approx_percentile; this is the exact tier. */
  val q26Percentiles: Q = Q(
    "q26_percentiles",
    """SELECT event_type,
      |  floor(quantile_cont(value, 0.5) * 10000 + 0.5) / 10000 AS p50,
      |  floor(quantile_cont(value, 0.95) * 10000 + 0.5) / 10000 AS p95,
      |  floor(quantile_cont(value, 0.99) * 10000 + 0.5) / 10000 AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          StableRound.r4(expr("percentile(value, 0.5)")).as("p50"),
          StableRound.r4(expr("percentile(value, 0.95)")).as("p95"),
          StableRound.r4(expr("percentile(value, 0.99)")).as("p99"))
        .orderBy("event_type")
  }

  /** Pivot: per-user event counts spread across type columns. The oracle
    * spells it as conditional aggregation — which is also exactly the
    * physical plan Spark's pivot lowers to (one pass, map-side combine). */
  val q27Pivot: Q = Q(
    "q27_pivot",
    """SELECT user_id,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
  }

  /** GROUPING SETS through the `spark.sql` surface (SURVEY §2.4 A9 notes
    * the reference lacks them; Spark gives multi-granularity aggregation
    * in ONE scan — at 100 TB that replaces three separate passes). Also
    * exercises the temp-view + SQL-text path of the engine's API. */
  val q28GroupingSets: Q = Q(
    "q28_grouping_sets",
    """SELECT coalesce(o_orderpriority, '<all>') AS priority,
      |  coalesce(o_orderstatus, '<all>') AS status,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
      |  (o_orderpriority), ())
      |ORDER BY priority, status""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderpriority, '<all>') AS priority,
        |  coalesce(o_orderstatus, '<all>') AS status,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderpriority), ())
        |ORDER BY priority, status""".stripMargin)
  }

  /** Heavy hitters sketch — `freqItems` (the Karp/Papadimitriou/Shenker
    * one-pass counter behind DataFrameStatFunctions) finds every token
    * whose frequency exceeds the support threshold WITHOUT a full
    * groupBy: single pass, fixed memory (1/support counters per task),
    * merge in the combine step. The sketch tier's third member next to
    * HLL distinct and the quantile sketch; tx06 is its exact twin, and
    * ScaleOpsSpec asserts the no-false-negative contract against it.
    * Rows-only in the gate: the KPS counter's EXTRA items depend on scan
    * order, so only the containment property is checkable. */
  val checkFreqSketch: Q = Q.noOracle("check_freq_sketch") { (s, d) =>
    import s.implicits._
    val items = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .stat.freqItems(Array("token"), 0.02)
      .head().getSeq[String](0)
    items.sorted.toDF("token")
  }

  /** CUBE — all 2^k grouping combinations in ONE scan (completes the A9
    * family next to q20 ROLLUP and q28 GROUPING SETS). The cube of
    * (status, priority) is 4 granularities that would otherwise be 4
    * separate passes over the fact table; at 100 TB the single-scan form
    * is the only affordable one. NULL markers coalesced for stable
    * cross-engine ordering/hashing (q20's doctrine). */
  val q30Cube: Q = Q(
    "q30_cube",
    """SELECT coalesce(o_orderstatus, '<all>') AS status,
      |  coalesce(o_orderpriority, '<all>') AS priority,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
        coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")
  }

  val queries: Seq[Q] = Seq(q22SaltedAgg, q23TwoStageDistinct,
    checkDistinctSketch, checkQuantileSketch, checkFreqSketch,
    q26Percentiles, q27Pivot, q28GroupingSets, q30Cube)
}
