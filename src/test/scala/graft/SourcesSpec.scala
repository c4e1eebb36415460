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
}
