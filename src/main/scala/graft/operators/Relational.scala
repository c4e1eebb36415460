package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q
import graft.tables.Tables

/** The reference's relational operator surface (SURVEY.md §2.2-§2.9),
  * re-expressed Spark-first over the TPC-H-ish fixtures.
  *
  * Every query here is declarative DataFrame code — Catalyst gets full
  * freedom for pushdown/pruning/join-strategy. Small dimension tables are
  * explicitly broadcast; aggregates over doubles are rounded on BOTH sides
  * (Spark + DuckDB oracle) so partial-agg summation order can't flip a hash
  * compare; every result carries a deterministic ORDER BY with a unique
  * tiebreaker.
  */
object Relational {

  /** A1/P5 — multi-key hash agg with map-side partial aggregation
    * (ref: IntegrityChecks_VLDB.sql:430,438 SUM..GROUP BY). TPC-H Q1 shape:
    * scan-side filter is pushed to parquet, agg is 2 stages (partial+final),
    * output is 6 groups — scales as pure map-reduce at any SF. */
  val q01PricingSummary: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        // floor(x·10^4+0.5)/10^4, not round(): an integer-sum/group-count
        // average can land on a non-binary-exact 4-decimal tie, where
        // Spark's and DuckDB's round() disagree (see tx02)
        (floor(avg("l_quantity") * 10000 + 0.5) / 10000).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** A2 — MIN/MAX per group (ref IC:583-587 MIN(LastCheckDate) GROUP BY db). */
  val q02MinPerGroup: Q = Q(
    "q02_min_per_group",
    """SELECT o_orderpriority,
      |  min(o_orderdate) AS first_order, max(o_orderdate) AS last_order,
      |  count(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(min("o_orderdate").as("first_order"),
          max("o_orderdate").as("last_order"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
  }

  /** A3 — filtered MAX per group (ref DIC:984-988 last-good-check scan). */
  val q03FilteredMax: Q = Q(
    "q03_filtered_max",
    """SELECT user_id, max(ts) AS last_purchase,
      |  floor(sum(value) * 100 + 0.5) / 100 AS total_value, count(*) AS n
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max("ts").as("last_purchase"),
        graft.functions.StableRound.r2(sum("value")).as("total_value"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** A4 — conditional-count comparison in one pass (ref IC:602-604
    * first-run heuristic: COUNT(exec=0) vs COUNT(exec>0)). */
  val q04CountCompare: Q = Q(
    "q04_count_compare",
    """SELECT count(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_returned,
      |  count(CASE WHEN l_returnflag <> 'R' THEN 1 END) AS n_other,
      |  count(*) AS n_total
      |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).agg(
      count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
      count(when(col("l_returnflag") =!= "R", 1)).as("n_other"),
      count(lit(1)).as("n_total"))
  }

  /** A5 — duplicate detection via HAVING count>1 (ref DIC:720). */
  val q05DupKeys: Q = Q(
    "q05_dup_keys",
    """SELECT user_id, event_type, count(*) AS n
      |FROM events GROUP BY user_id, event_type HAVING count(*) > 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .orderBy("user_id", "event_type")
  }

  /** A7 — deterministic string fold-agg (ref DIC:869-947 error-name lists;
    * made order-stable via sort_array, unlike the reference's @msg+=). */
  val q06StringFold: Q = Q(
    "q06_string_fold",
    """SELECT r_name, string_agg(n_name, ', ' ORDER BY n_name) AS nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(array_join(sort_array(collect_list("n_name")), ", ").as("nations"))
      .orderBy("r_name")
  }

  /** J2 — multiway equi join, dims broadcast (ref IC:431-437 5-way catalog
    * join). At 100 TB: lineitem⋈orders shuffles on orderkey; customer/
    * nation/region stay broadcast so only ONE big shuffle exists. */
  val q07RevenueByRegion: Q = Q(
    "q07_revenue_by_region",
    """SELECT r_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  /** J5 — left-semi join / EXISTS (ref DIC:1533 EXISTS(sys.indexes…)). */
  val q08SemiJoin: Q = Q(
    "q08_semi_join",
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** J6 — left-anti join / NOT EXISTS (ref DIC:869-947 nonexistent-db
    * detection, MERGE's not-matched arm). */
  val q09AntiJoin: Q = Q(
    "q09_anti_join",
    """SELECT c_nationkey, count(*) AS n_no_orders
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_no_orders"))
      .orderBy("c_nationkey")
  }

  /** J3 — theta join on LIKE pattern with include/exclude precedence: the
    * selection-DSL resolution shape (ref IC:300-319, two passes, exclude
    * wins). Selector side is tiny → BroadcastNestedLoopJoin, by design. */
  val q10ThetaLike: Q = Q(
    "q10_theta_like",
    """WITH sel(pattern, selected) AS
      |  (VALUES ('Brand#1%', 1), ('Brand#3%', 1), ('Brand#13', 0)),
      |inc AS (SELECT DISTINCT p.p_partkey, p.p_brand
      |        FROM part p JOIN sel s ON s.selected = 1 AND p.p_brand LIKE s.pattern),
      |exc AS (SELECT DISTINCT p.p_partkey
      |        FROM part p JOIN sel s ON s.selected = 0 AND p.p_brand LIKE s.pattern)
      |SELECT i.p_brand, count(*) AS n_parts
      |FROM inc i WHERE NOT EXISTS (SELECT 1 FROM exc e WHERE e.p_partkey = i.p_partkey)
      |GROUP BY i.p_brand ORDER BY i.p_brand""".stripMargin) { (s, d) =>
    import s.implicits._
    val sel = Seq(("Brand#1%", 1), ("Brand#3%", 1), ("Brand#13", 0))
      .toDF("pattern", "selected")
    val p = Tables.part(s, d)
    val inc = p.join(broadcast(sel.filter($"selected" === 1)),
        expr("p_brand LIKE pattern"))
      .select("p_partkey", "p_brand").distinct()
    val exc = p.join(broadcast(sel.filter($"selected" === 0)),
        expr("p_brand LIKE pattern"))
      .select("p_partkey").distinct()
    inc.join(exc, Seq("p_partkey"), "left_anti")
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("p_brand")
  }

  /** W1/W2 — ROW_NUMBER ranking with policy-selected ORDER BY
    * (ref IC:343-349, DIC:1003-1089). Top-3 per partition. */
  val q11WindowTopN: Q = Q(
    "q11_window_topn",
    """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer) WHERE rn <= 3
      |ORDER BY c_nationkey, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
      .orderBy("c_nationkey", "rn")
  }

  /** W3 — LAG as the idiomatic replacement for the reference's
    * PreviousRun* column-shuffling (ref IC:716-717). */
  val q12Lag: Q = Q(
    "q12_lag",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  lag(o_orderdate) OVER (PARTITION BY o_custkey
      |                         ORDER BY o_orderdate, o_orderkey) AS prev_date,
      |  date_diff('day',
      |    CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |                                ORDER BY o_orderdate, o_orderkey) AS DATE),
      |    CAST(o_orderdate AS DATE)) AS gap_days
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) {
    (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn("prev_date", lag("o_orderdate", 1).over(w))
        .withColumn("gap_days",
          datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))))
        .select("o_custkey", "o_orderkey", "o_orderdate", "prev_date", "gap_days")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** T1 — TOP-1 argmin per group: the scheduler's work-picker shape
    * (ref IC:595,651-668 TOP 1 … ORDER BY). */
  val q13Argmin: Q = Q(
    "q13_argmin",
    """SELECT o_custkey, o_orderkey, o_orderdate FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .orderBy("o_custkey")
  }

  /** T2 — runtime-switched conditional ORDER BY (ref IC:666-668
    * smallest-first flip), with a unique tiebreaker so LIMIT is stable. */
  val q14ConditionalOrder: Q = Q(
    "q14_conditional_order",
    """SELECT p_partkey, p_size, p_brand FROM part
      |ORDER BY CASE WHEN 1 = 1 THEN p_size END ASC, p_partkey
      |LIMIT 20""".stripMargin) { (s, d) =>
    val smallestFirst = true
    Tables.part(s, d)
      .orderBy(when(lit(smallestFirst), col("p_size")).asc, col("p_partkey"))
      .select("p_partkey", "p_size", "p_brand")
      .limit(20)
  }

  /** U1 — the string splitter: split + posexplode replaces the reference's
    * recursive CTE iterator (ref IC:241-253, MAXRECURSION 0). */
  val q15SplitPosexplode: Q = Q(
    "q15_split_posexplode",
    """SELECT d.doc_id, i.pos, d.l[i.pos + 1] AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS l
      |      FROM documents WHERE doc_id < 20) d,
      |     (SELECT unnest(range(5)) AS pos) i
      |WHERE i.pos < least(5, len(d.l))
      |ORDER BY d.doc_id, i.pos""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .filter(col("pos") < 5)
      .withColumnRenamed("col", "tok")
      .orderBy("doc_id", "pos")
  }

  /** §2.8 — scalar string functions (REPLACE/SUBSTRING/LEN/CHARINDEX/UPPER,
    * ref IC:233-252). */
  val q16ScalarStrings: Q = Q(
    "q16_scalar_strings",
    """SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 8) AS pre,
      |  length(p_name) AS len, replace(p_name, ' ', '_') AS und,
      |  instr(p_name, 'a') AS pos_a, trim(p_name) AS trimmed
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("up"),
      substring(col("p_name"), 1, 8).as("pre"),
      length(col("p_name")).as("len"),
      // single-char literal substitution: translate, not a regex engine
      translate(col("p_name"), " ", "_").as("und"),
      instr(col("p_name"), "a").as("pos_a"),
      trim(col("p_name")).as("trimmed"))
      .orderBy("p_partkey")
  }

  /** §2.8 — date/time functions (CONVERT styles, DATEADD/DATEDIFF,
    * ref IC:522,648,679). */
  val q17Dates: Q = Q(
    "q17_dates",
    """SELECT o_orderkey,
      |  strftime(o_orderdate, '%Y%m%d') AS ymd,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS iso,
      |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dd,
      |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  strftime(o_orderdate, '%Y-%m-%d') AS od
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    // DATE-typed output columns are avoided engine-wide: pandas renders
    // DuckDB DATE as midnight timestamps, breaking the hash compare.
    Tables.orders(s, d).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyyMMdd").as("ymd"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("iso"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      dayofmonth(col("o_orderdate")).as("dd"),
      date_format(col("o_orderdate") + expr("INTERVAL 30 DAY"), "yyyy-MM-dd")
        .as("plus30"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
      .orderBy("o_orderkey")
  }

  /** D1 — the 3-clause MERGE as a full-outer-join reconciliation
    * (ref IC:454-484: MATCHED→update, NOT MATCHED→insert,
    * NOT MATCHED BY SOURCE→deactivate). Emulated over customer as
    * (state = custkey%3!=0, scan = custkey%2=0). */
  val q18MergeReconcile: Q = Q(
    "q18_merge_reconcile",
    """WITH state AS (SELECT c_custkey, c_acctbal AS stored_bal
      |              FROM customer WHERE c_custkey % 3 <> 0),
      |scan AS (SELECT c_custkey, round(c_acctbal + 10, 2) AS seen_bal
      |         FROM customer WHERE c_custkey % 2 = 0)
      |SELECT coalesce(state.c_custkey, scan.c_custkey) AS c_custkey,
      |  CASE WHEN state.c_custkey IS NOT NULL AND scan.c_custkey IS NOT NULL
      |         THEN 'update'
      |       WHEN state.c_custkey IS NULL THEN 'insert'
      |       ELSE 'deactivate' END AS action,
      |  coalesce(scan.seen_bal, state.stored_bal) AS new_bal,
      |  (scan.c_custkey IS NOT NULL) AS active
      |FROM state FULL OUTER JOIN scan ON state.c_custkey = scan.c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val state = c.filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("s_key"), col("c_acctbal").as("stored_bal"))
    val scan = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("t_key"),
        round(col("c_acctbal") + 10, 2).as("seen_bal"))
    state.join(scan, col("s_key") === col("t_key"), "full_outer")
      .select(
        coalesce(col("s_key"), col("t_key")).as("c_custkey"),
        when(col("s_key").isNotNull && col("t_key").isNotNull, "update")
          .when(col("s_key").isNull, "insert")
          .otherwise("deactivate").as("action"),
        coalesce(col("seen_bal"), col("stored_bal")).as("new_bal"),
        col("t_key").isNotNull.as("active"))
      .orderBy("c_custkey")
  }

  /** U2 — INTERSECT / EXCEPT (absent from the reference; free in Spark). */
  val q19SetOps: Q = Q(
    "q19_set_ops",
    """SELECT 'intersect' AS op, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'except' AS op, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |ORDER BY op""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val f = o.filter(col("o_orderstatus") === "F").select("o_custkey")
    val op = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    val i = f.intersect(op).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect"))
    val e = f.except(op).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except"))
    i.unionByName(e).select("op", "n").orderBy("op")
  }

  /** U2 (multiset tier) — EXCEPT ALL / INTERSECT ALL: bag semantics keep
    * MULTIPLICITY (a supplier shipping 5× early and 2× late survives the
    * bag difference 3×, where the distinct tier would drop it entirely) —
    * the variant that matters when row counts carry meaning. Summarized
    * per key so the result is deterministic and small. */
  val q29SetOpsAll: Q = Q(
    "q29_set_ops_all",
    """SELECT 'except_all' AS op, l_suppkey, count(*) AS n FROM (
      |  SELECT l_suppkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-06-01 00:00:00'
      |  EXCEPT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00')
      |GROUP BY 2
      |UNION ALL
      |SELECT 'intersect_all', l_suppkey, count(*) FROM (
      |  SELECT l_suppkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-06-01 00:00:00'
      |  INTERSECT ALL
      |  SELECT l_suppkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01 00:00:00')
      |GROUP BY 2
      |ORDER BY op, l_suppkey""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val cut = lit("1998-06-01 00:00:00").cast("timestamp")
    val early = li.filter(col("l_shipdate") < cut).select("l_suppkey")
    val late = li.filter(col("l_shipdate") >= cut).select("l_suppkey")
    val e = early.exceptAll(late).groupBy("l_suppkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val i = early.intersectAll(late).groupBy("l_suppkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    e.unionByName(i).select("op", "l_suppkey", "n").orderBy("op", "l_suppkey")
  }

  /** A9 — ROLLUP grouping sets (absent from reference; Spark built-in).
    * NULL group markers coalesced to 'ALL' for stable cross-engine hashing. */
  val q20Rollup: Q = Q(
    "q20_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy("rf", "ls")
  }

  /** J7 — scalar subquery in a predicate, decorrelated by Catalyst
    * (ref IC:664,603). */
  val q21ScalarSubquery: Q = Q(
    "q21_scalar_subquery",
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val avgPrice = o.agg(avg("o_totalprice").as("avg_price"))
    o.crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("avg_price"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  /** UNPIVOT — wide measure columns folded to (measure, value) rows via
    * `Dataset.unpivot` (melt). The oracle spells it as a portable UNION
    * ALL, which is also what the physical plan amounts to: an Expand node
    * emitting k rows per input row in the SAME single scan — at scale,
    * unpivot costs one pass regardless of measure count. */
  val q31Unpivot: Q = Q(
    "q31_unpivot",
    """SELECT m.measure, count(*) AS n,
      |  round(sum(m.v), 2) AS total, round(min(m.v), 2) AS lo,
      |  round(max(m.v), 2) AS hi
      |FROM (
      |  SELECT 'quantity' AS measure, l_quantity AS v FROM lineitem
      |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'tax', l_tax FROM lineitem) m
      |GROUP BY m.measure ORDER BY m.measure""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax")
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity").as("quantity"),
          col("l_extendedprice").as("extendedprice"),
          col("l_discount").as("discount"), col("l_tax").as("tax")),
        variableColumnName = "measure", valueColumnName = "v")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), round(sum("v"), 2).as("total"),
        round(min("v"), 2).as("lo"), round(max("v"), 2).as("hi"))
      .orderBy("measure")
  }

  /** Correlated aggregate predicate (TPC-H Q17 shape): lineitems whose
    * quantity is below 20% of their part's average — the small-order
    * revenue probe. The oracle spells the textbook correlated subquery;
    * the Spark side computes the per-part bound as a WINDOW aggregate over
    * partkey instead of the decorrelated agg+self-join, which halves the
    * fact-table scans (ONE scan, one shuffle on partkey, and the following
    * groupBy reuses that same partitioning — no second exchange). The
    * comparison is float-safe cross-engine: l_quantity values are
    * integer-valued doubles, so each group's sum — hence avg and the
    * 0.2·avg bound — is bit-exact on both engines. */
  val q32AvgQtyFilter: Q = Q(
    "q32_avg_qty_filter",
    """SELECT l1.l_partkey, count(*) AS n_small,
      |  round(sum(l1.l_extendedprice), 2) AS small_revenue
      |FROM lineitem l1
      |WHERE l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
      |                       FROM lineitem l2
      |                       WHERE l2.l_partkey = l1.l_partkey)
      |GROUP BY l1.l_partkey ORDER BY l1.l_partkey""".stripMargin) { (s, d) =>
    val byPart = Window.partitionBy("l_partkey")
    Tables.lineitem(s, d)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .withColumn("lim", lit(0.2) * avg("l_quantity").over(byPart))
      .filter(col("l_quantity") < col("lim"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_small"),
        round(sum("l_extendedprice"), 2).as("small_revenue"))
      .orderBy("l_partkey")
  }

  /** LATERAL correlated subquery (per-row top-k via the spark.sql
    * surface): for each nation, its 2 highest-balance customers. Catalyst
    * decorrelates the LATERAL LIMIT into WindowGroupLimit with a PARTIAL
    * top-k evaluated map-side before the shuffle — each task forwards at
    * most k rows per key, so the exchange carries O(k·keys·tasks) rows,
    * not the corpus — then broadcast-joins the tiny nation side. The
    * same semantics as q11's window top-n, reached from the SQL-text
    * surface (both engines run the identical statement). */
  val q33Lateral: Q = {
    def sql(nation: String, customer: String) =
      s"""SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS acctbal
         |FROM $nation n,
         |  LATERAL (SELECT c_name, c_acctbal FROM $customer
         |           WHERE c_nationkey = n.n_nationkey
         |           ORDER BY c_acctbal DESC, c_name LIMIT 2) t
         |ORDER BY n.n_name, acctbal DESC, c_name""".stripMargin
    Q("q33_lateral", sql("nation", "customer")) { (s, d) =>
      // _v-suffixed views (the repo convention): claiming the bare table
      // names would shadow them session-wide for every later spark.sql
      // in a long-lived session — and pin them to THIS sfDir
      Tables.nation(s, d).createOrReplaceTempView("nation_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(sql("nation_v", "customer_v"))
    }
  }

  /** W1/W2 completion — the remaining rank-family window vocabulary in one
    * pass: ntile (equi-depth bucketing, the histogram/stratification
    * primitive), percent_rank and cume_dist (relative standing). The ORDER
    * BY carries a unique tiebreaker (c_custkey) so all three are
    * deterministic, and percent_rank/cume_dist are single IEEE integer
    * divisions — bit-exact cross-engine with NO rounding shim. One hash
    * exchange on the partition key; all three functions ride one Window
    * node. */
  val q34WindowRanks: Q = Q(
    "q34_window_ranks",
    """SELECT c_nationkey, c_custkey, c_acctbal,
      |  ntile(4) OVER w AS quartile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_nationkey", "c_custkey")
  }

  /** Null-aware NOT IN (SURVEY §2.3 J6 extension): the ANSI trap a plain
    * left_anti join gets WRONG — `x NOT IN (S)` is NULL (row excluded)
    * when x is NULL, and never true when S contains a NULL. Expressed
    * through spark.sql so Catalyst plans its null-aware anti join; the
    * nullable left key comes from nullif on real data. At scale the
    * subquery side is dimension-sized and broadcasts (Spark's
    * null-aware anti join REQUIRES a broadcastable right side — the
    * correct constraint, since null-awareness needs the whole set). */
  val q35NotInNulls: Q = Q(
    "q35_not_in_nulls",
    """SELECT c_custkey, c_name FROM customer
      |WHERE nullif(c_nationkey, 5) NOT IN
      |  (SELECT n_nationkey FROM nation WHERE n_regionkey <> 2)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    s.sql(
      """SELECT c_custkey, c_name FROM customer_v
        |WHERE nullif(c_nationkey, 5) NOT IN
        |  (SELECT n_nationkey FROM nation_v WHERE n_regionkey <> 2)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** DISTINCT aggregate over a window — an operator Spark's window
    * framework does NOT support directly (`count(DISTINCT ...) OVER` is a
    * parse error), rewritten as `size(collect_set() OVER)`: the set dedup
    * happens inside the window buffer, one exchange on the partition key.
    * The rewrite is only safe when per-partition distinct cardinality is
    * bounded (here: ≤5 priorities); an unbounded-cardinality version
    * should go through a groupBy(countDistinct) + re-join instead. The
    * oracle runs DuckDB's native distinct-window form — same semantics,
    * two implementations. */
  val q36WindowedDistinct: Q = Q(
    "q36_windowed_distinct",
    """SELECT o_custkey, o_orderkey,
      |  count(DISTINCT o_orderpriority) OVER (PARTITION BY o_custkey)
      |    AS n_prio
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("o_custkey")
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        size(collect_set(col("o_orderpriority")).over(w))
          .cast("long").as("n_prio"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Time-RANGE window frame — the window-family member q12/q34/q36's
    * ROWS frames don't cover: each event's trailing-1-hour rolling sum
    * and count per user. A RANGE frame bounds the window by the ORDER
    * VALUE (here epoch seconds), not a row count, so ties and uneven
    * event spacing are handled by definition — the batch form of a
    * sliding event-time window (ev05 is the bucketed form; this is the
    * per-event form). Ordering key is INTEGER epoch seconds quantized by
    * FLOOR-truncation on BOTH engines (Spark's cast(ts as long) floors;
    * the oracle must floor(epoch(ts)) explicitly because DuckDB's
    * epoch()::BIGINT ROUNDS — on microsecond-bearing timestamps the two
    * quantizations would disagree on ~half the keys and flip frame
    * membership). One user_id exchange; the frame scan is the window
    * buffer. */
  val q37RangeFrame: Q = Q(
    "q37_range_frame",
    """SELECT user_id, event_id,
      |  CAST(sum(value_cents) OVER w AS BIGINT) AS hour_cents,
      |  CAST(count(*) OVER w AS BIGINT) AS hour_events
      |FROM (SELECT user_id, event_id,
      |        CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |        CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
      |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    // integer cents BEFORE the frame sum: a float sum's value would
    // depend on in-frame accumulation order
    val w = Window.partitionBy("user_id").orderBy("ts_sec")
      .rangeBetween(-3600L, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_sec"),
        floor(col("value") * 100 + 0.5).cast("long").as("value_cents"))
      .select(col("user_id"), col("event_id"),
        sum("value_cents").over(w).as("hour_cents"),
        count(lit(1)).over(w).as("hour_events"))
      .orderBy("user_id", "event_id")
  }

  val queries: Seq[Q] = Seq(
    q01PricingSummary, q02MinPerGroup, q03FilteredMax, q04CountCompare,
    q05DupKeys, q06StringFold, q07RevenueByRegion, q08SemiJoin, q09AntiJoin,
    q10ThetaLike, q11WindowTopN, q12Lag, q13Argmin, q14ConditionalOrder,
    q15SplitPosexplode, q16ScalarStrings, q17Dates, q18MergeReconcile,
    q19SetOps, q20Rollup, q21ScalarSubquery, q29SetOpsAll, q31Unpivot,
    q32AvgQtyFilter, q33Lateral, q34WindowRanks, q35NotInNulls,
    q36WindowedDistinct, q37RangeFrame)
}
