package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the storage-layout half of the 100 TB story
  * (SCALE.md "pre-shuffle once, join forever"): writing both sides bucketed
  * by the join key lets every later join run with ZERO exchange, because
  * the bucketing IS the shuffle, paid once at write time. This spec pins
  * that the plan actually honors it — a silent config/regression that
  * reintroduces the exchange would cost a full data shuffle per join at
  * scale. */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("join of two tables bucketed on the key plans with no exchange") {
    val bt = "bspec_lineitem"
    val bo = "bspec_orders"
    spark.sql(s"DROP TABLE IF EXISTS $bt")
    spark.sql(s"DROP TABLE IF EXISTS $bo")
    graft.tables.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable(bt)
    graft.tables.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable(bo)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the co-location claim is actually exercised
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(bt)
        .join(spark.table(bo), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // the join itself consumes the bucketing: no shuffle on either side
      // (the groupBy above it may exchange its tiny aggregate)
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$joinPart")
      // and it returns the same rows as the unbucketed plan
      val expected = graft.tables.Tables.lineitem(spark, sfDir)
        .join(graft.tables.Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $bt")
      spark.sql(s"DROP TABLE IF EXISTS $bo")
    }
  }
}
