package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.Tables

/** File-format surface beyond parquet (SURVEY §2.1 S14: CSV/JSON
  * optional) — write/read round-trips preserve row counts and values. */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def tmp(suffix: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-src-$suffix").toString

  test("CSV round-trip preserves nation table exactly") {
    val out = tmp("csv") + "/nation"
    val src = spark.read.parquet(s"$sfDir/nation.parquet")
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(out)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("ORC round-trip preserves customer table exactly") {
    val out = tmp("orc") + "/customer"
    val src = spark.read.parquet(s"$sfDir/customer.parquet")
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("JSON lines round-trip preserves supplier table exactly") {
    val out = tmp("json") + "/supplier"
    val src = spark.read.parquet(s"$sfDir/supplier.parquet")
    src.write.mode("overwrite").json(out)
    val back = spark.read.schema(src.schema).json(out)
    assert(back.count() === src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = tmp("part") + "/events"
    Tables.events(spark, sfDir)
      .withColumn("dt", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("dt").parquet(out)
    val days = spark.read.parquet(out).select("dt").distinct().count()
    assert(days > 1)
    val oneDay = spark.read.parquet(out)
      .filter(col("dt") === spark.read.parquet(out)
        .agg(min("dt")).head.getDate(0))
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory persists - clear it or saveAsTable refuses the location
    Seq("b_orders", "b_customer").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    spark.read.parquet(s"$sfDir/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$sfDir/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
    // disable broadcast so the co-located (bucket) path is what's tested
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      // bucket-aligned scan feeds the join directly - no shuffle on
      // either side (the 100 TB co-located join story)
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
