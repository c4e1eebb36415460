package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps
import graft.tables.Tables

/** Correctness of the scale-technique operators beyond the oracle gate. */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // The other half of the skew story (q22 is the salting half): one hot
    // key overwhelms a reducer, and AQE's runtime re-plan splits that
    // partition instead. Tiny thresholds make the 90%-hot-key join skewed
    // at test scale; the executed plan must show the skew-join rewrite.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s2.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    import s2.implicits._
    val left = s2.range(0, 100000)
      .select(when($"id" < 90000, 0L).otherwise($"id" % 100).as("k"),
        $"id".as("v"))
    val right = s2.range(0, 100).select($"id".as("k"), ($"id" * 2).as("w"))
    val joined = left.join(right, "k")
    // execute THIS dataset (count() would spawn a separate QueryExecution
    // and leave joined's adaptive plan unfinalized)
    assert(joined.collect().length === 100000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      "expected the AQE skew-join rewrite in:\n" + plan.take(3000))
  }

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

  test("freq-items sketch finds EVERY true heavy hitter (no false negatives)") {
    // the KPS counter guarantees containment: every item with frequency
    // > support MUST be reported (extras are allowed, misses are not)
    val total = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token")).count()
    val trueHeavy = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count()
      .filter(col("count") > total * 0.02)
      .collect().map(_.getString(0)).toSet
    val sketched = ScaleOps.checkFreqSketch.run(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    assert(trueHeavy.subsetOf(sketched),
      s"missed heavy hitters: ${trueHeavy -- sketched}")
    assert(trueHeavy.nonEmpty) // the fixture vocabulary IS Zipf-ish
  }

  test("quantile sketch keeps RANK error within 1% (its actual contract)") {
    // the sketch bounds rank error, not value error — in a sparse tail
    // two ranks can span a wide value gap, so assert in rank space: the
    // fraction of the group's values at or below the sketch's answer must
    // sit within 1% of the target quantile.
    val rows = ScaleOps.checkQuantileSketch.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val events = graft.tables.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val vs = events(r.getString(0))
      def rankOf(x: Double): Double =
        vs.count(_ <= x).toDouble / vs.length
      assert(math.abs(rankOf(r.getAs[Double]("sketch_p50")) - 0.5) <= 0.01)
      assert(rankOf(r.getAs[Double]("sketch_p99")) >= 0.98)
    }
  }
}
