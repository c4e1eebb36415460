package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime adaptivity — the two mechanisms that keep a STATIC plan healthy
  * against 100 TB realities the optimizer couldn't see at compile time:
  *
  *  - runtime bloom-filter pushdown: a selective filter on one join side
  *    is turned into a bloom filter probed on the OTHER side's scan, so
  *    the big side drops non-joining rows before the shuffle;
  *  - AQE skew-join splitting: a hot key's oversized shuffle partition is
  *    split into advisory-sized chunks (the automatic form of q22's manual
  *    salting).
  *
  * Thresholds here are lowered to make fixture-sized inputs cross them;
  * production defaults only change WHEN the mechanisms fire, not whether
  * the plan supports them — which is what these pins protect.
  */
class RuntimeAdaptivitySpec extends AnyFunSuite {
  import SparkTestSession._

  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter from the filtered dim prunes the fact side") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creationSideThreshold is a MAX-size cap on the build side (don't
      // build a bloom from a huge side); the application-side threshold is
      // a MIN scan size (don't bother pruning a small scan) — zero it so
      // the fixture-sized fact qualifies
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = graft.tables.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
      val o = graft.tables.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom filter in plan:\n${plan.take(2000)}")
      // and it filters, never drops: result equals the un-filtered join
      val expect = graft.tables.Tables.lineitem(spark, sfDir)
        .join(graft.tables.Tables.orders(spark, sfDir)
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.collect().head.getAs[Long]("n") === expect)
    }
  }

  test("reliable-checkpoint mode: iterative tiers produce identical results") {
    // localCheckpoint (the default) is executor-resident with severed
    // lineage: an executor loss mid-chain kills a long iterative job. On a
    // real cluster spark.graft.reliableCheckpoint=true moves every
    // materialization point to the reliable checkpoint store (executor
    // loss -> task retry against storage, not job death). This pins the
    // OTHER half of that contract: the config changes durability only,
    // never results — the Lloyd trainer (sim07) and the component loop
    // (dd06) return bit-identical frames under both modes.
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val local07 = SparkEntry.queries("sim07_kmeans_clusters")(spark, sfDir)
      .collect().toSeq
    val local06 = SparkEntry.queries("dd06_dup_clusters")(spark, sfDir)
      .collect().toSeq
    spark.sparkContext.setCheckpointDir(ckDir)
    withConf("spark.graft.reliableCheckpoint" -> "true") {
      assert(SparkEntry.queries("sim07_kmeans_clusters")(spark, sfDir)
        .collect().toSeq === local07)
      assert(SparkEntry.queries("dd06_dup_clusters")(spark, sfDir)
        .collect().toSeq === local06)
    }
  }

  test("AQE splits a skewed shuffle partition (automatic salting)") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // AQE would otherwise CONVERT the tiny-dim SMJ to broadcast at
      // runtime and sidestep skew handling entirely — pin the shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // fixture-sized shuffle partitions are tens of KB; scale the skew
      // thresholds down with them (prod defaults: 256MB/64MB)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192") {
      import spark.implicits._
      // hot key: key 0 carries ~100x the rows of every other key. The
      // payload is per-row md5 hex — near-incompressible, so the skewed
      // partition's POST-COMPRESSION shuffle bytes (what AQE's stats see)
      // actually reflect the row-count skew; 60k identical join keys alone
      // would compress to nothing and dodge size-based detection.
      // AQE splits a skewed reduce partition by MAP-OUTPUT ranges, so the
      // map side must have >1 task for a split to exist at all. The
      // single-row-group fixture file scans as ONE task (a real lake scan
      // has thousands); spread it first — without this the rule correctly
      // reports "0 skewed partitions" no matter how skewed the bytes are.
      val fact = graft.tables.Tables.lineitem(spark, sfDir)
        .repartition(8)
        .select((col("l_orderkey") % 10).as("k"), col("l_orderkey"))
        .withColumn("rep",
          explode(when(col("k") === 0, sequence(lit(1), lit(100)))
            .otherwise(array(lit(1)))))
        .withColumn("payload",
          md5(concat_ws("|", col("l_orderkey"), col("rep"))))
      val dim = (0 until 10).map(i => (i.toLong, s"g$i")).toDF("k2", "tag")
        .repartition(4) // a real shuffle side, not a local relation
      val joined = fact.join(dim, col("k") === col("k2"))
        // max(payload) keeps the fat column ALIVE through the shuffle —
        // column pruning would otherwise drop it before the exchange
        .groupBy("tag").agg(count(lit(1)).as("n"), max("payload").as("mx"))
      val rows = joined.collect() // AQE finalizes during execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"no skew-split in final adaptive plan:\n${plan.take(3000)}")
      // correctness unaffected by the split: g0 has 40x its base count
      val base = rows.find(_.getString(0) == "g1").get.getAs[Long]("n")
      val hot = rows.find(_.getString(0) == "g0").get.getAs[Long]("n")
      assert(hot > 30 * base)
    }
  }
}
