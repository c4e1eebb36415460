package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning — the scan-side half of the broadcast-join
  * scale story: when the fact table is PARTITIONED on the join key and the
  * dim side is filtered, the fact scan must read only the partitions the
  * dim's surviving keys name (at 100 TB: the difference between scanning
  * the lake and scanning one key's directory). Pinned here so a config or
  * plan regression can't silently restore the full scan. */
class PartitionPruningSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dim filter dynamically prunes the partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    graft.tables.Tables.orders(spark, sfDir)
      .write.partitionBy("o_orderpriority").parquet(s"$dir/orders_part")
    import spark.implicits._
    // the dim must be a FILTERED file scan: DPP's heuristic requires a
    // selective predicate on the build side to justify the subquery
    Seq(("1-URGENT", "keep"), ("5-LOW", "drop"))
      .toDF("prio", "tag").write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "keep")
    val fact = spark.read.parquet(s"$dir/orders_part")
    val joined = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .groupBy("prio").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${plan.take(2000)}")
    // and the result is correct: only the urgent partition's rows
    val expect = graft.tables.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(joined.collect().head.getAs[Long]("n") === expect)
  }
}
