package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps
import graft.tables.Tables

/** Correctness of the scale-technique operators beyond the oracle gate. */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted two-stage aggregation equals direct aggregation") {
    val direct = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"),
        round(sum("value") / count(lit(1)), 4).as("avg_value"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val salted = ScaleOps.q22SaltedAgg.run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(salted === direct)
  }

  test("two-stage distinct equals countDistinct") {
    val direct = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val staged = ScaleOps.q23TwoStageDistinct.run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(staged === direct)
  }

  test("HLL sketch distinct stays within its 2% design error (5% asserted)") {
    val errs = ScaleOps.checkDistinctSketch.run(spark, sfDir)
      .select("rel_err").collect().map(_.getDouble(0))
    assert(errs.nonEmpty && errs.forall(_ < 0.05))
  }
}
