package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.tables.Tables

/** As-of join — an operator Spark lacks natively (SURVEY §2.3 J8 notes
  * the reference has none either; this is north-star surface). Built by
  * COMPOSITION (the prompt's preference (a)): union the probe and build
  * sides, then one window pass per key picks the latest strictly-earlier
  * build row for every probe row.
  *
  * Why this shape scales: a naive range join (`a.t > b.t` per key)
  * explodes to O(|A|·|B|) per key before picking the max; the union-
  * window form is ONE shuffle on the key and a sort within partitions —
  * O((|A|+|B|) log) per key, no pair blowup, AQE-skew-splittable. This is
  * the standard formulation for market-data/point-in-time joins.
  */
object AsOfJoin {

  /** Each order joined as-of to the same customer's most recent STRICTLY
    * earlier order (gap analysis). DuckDB's native ASOF JOIN is the
    * oracle, proving the composition reproduces real as-of semantics. */
  val q24AsOfJoin: Q = Q(
    "q24_asof_join",
    """SELECT a.o_orderkey, a.o_custkey,
      |  strftime(a.o_orderdate, '%Y-%m-%d') AS order_date,
      |  strftime(b.prev_date, '%Y-%m-%d') AS prev_date,
      |  date_diff('day', b.prev_date, a.o_orderdate) AS gap_days
      |FROM orders a ASOF LEFT JOIN
      |  (SELECT o_custkey AS ck, o_orderdate AS prev_date FROM orders) b
      |  ON a.o_custkey = b.ck AND b.prev_date < a.o_orderdate
      |ORDER BY a.o_orderkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderdate")
    // src 0 = probe, src 1 = build. At equal timestamps the probe row
    // sorts FIRST, so the preceding-rows frame cannot see a same-instant
    // build row — exactly the strict `<` of the as-of contract.
    val probe = o.withColumn("src", lit(0))
    val build = o.select(col("o_custkey"), col("o_orderdate"))
      .withColumn("o_orderkey", lit(null).cast("long"))
      .withColumn("src", lit(1))
      .select("o_orderkey", "o_custkey", "o_orderdate", "src")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("src"))
      .rowsBetween(Window.unboundedPreceding, -1)
    probe.unionByName(build)
      .withColumn("prev_ts",
        max(when(col("src") === 1, col("o_orderdate"))).over(w))
      .filter(col("src") === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        date_format(col("prev_ts"), "yyyy-MM-dd").as("prev_date"),
        datediff(col("o_orderdate"), col("prev_ts")).as("gap_days"))
      .orderBy("o_orderkey")
  }

  /** Interval (range) join by bucketing: events joined to a RELATION of
    * half-open daily maintenance windows. The oracle expresses the true
    * non-equi range predicate (`w.start <= ts < w.end`); the Spark side
    * replaces it with an equi-join on the derived day bucket — exact
    * because windows are bucket-aligned — so the work partitions on the
    * bucket key instead of planning a nested-loop theta join. For
    * windows that straddle buckets the same shape joins each window to
    * every bucket it overlaps first (explode), keeping the equi-join. */
  val q25RangeBucketJoin: Q = Q(
    "q25_range_bucket_join",
    """WITH w AS (
      |  SELECT unnest(generate_series(TIMESTAMP '2024-01-10',
      |           TIMESTAMP '2024-01-19', INTERVAL 1 DAY)) AS w_start),
      |win AS (SELECT w_start, w_start + INTERVAL 1 DAY AS w_end FROM w)
      |SELECT strftime(win.w_start, '%Y-%m-%d') AS day, e.event_type,
      |  count(*) AS n
      |FROM events e JOIN win
      |  ON e.ts >= win.w_start AND e.ts < win.w_end
      |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, d) =>
    val windows = s.range(10).select(
      date_add(lit("2024-01-10").cast("date"), col("id").cast("int"))
        .cast("timestamp").as("w_start"))
      .withColumn("bucket", date_trunc("day", col("w_start")))
    Tables.events(s, d)
      .withColumn("bucket", date_trunc("day", col("ts")))
      .join(broadcast(windows), "bucket")
      .groupBy(date_format(col("w_start"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day", "event_type")
  }

  val queries: Seq[Q] = Seq(q24AsOfJoin, q25RangeBucketJoin)
}
