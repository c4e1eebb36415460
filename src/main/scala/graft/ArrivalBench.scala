package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, IncrementalDedup}
import graft.tables.Tables

/** Multi-batch ARRIVAL benchmark for the incremental dedup tier: the
  * production claim under test is per-batch ingest cost that stays flat
  * as the corpus grows (work ∝ batch, I/O ∝ touched buckets), and this
  * runner measures it instead of asserting it — N sequential
  * equal-sized batches ingested through the PERSISTED store path, per
  * batch wall seconds, emitted pairs, store size, and the peak per-task
  * input/shuffle record counts (the straggler proxy), in BOTH layouts:
  *
  *  - `bucketed` — the product path: [[IncrementalDedup.SigStore]]'s
  *    (pb0, pb1)-partitioned store, partition-pruned ingest reads,
  *    dynamic-partition-overwrite incremental saves;
  *  - `flat` — the pre-round-10 shape: an unpartitioned parquet store,
  *    every probe a full scan, every save a full rewrite.
  *
  * Split: md5(doc_id) % 50 — buckets ≥ N form the bootstrap corpus
  * (~80% at N=10), bucket i < N is arriving batch i (~2% each).
  *
  * Usage: runMain graft.ArrivalBench <sfDir> [nBatches] [arm,arm]
  * One JSON line per batch per arm + a summary line per arm. */
object ArrivalBench {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val arms = if (args.length > 2) args(2).split(",").toSeq
      else Seq("bucketed", "flat")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StressDedup.PeakListener
    spark.sparkContext.addSparkListener(listener)

    val all = Tables.spread(spark, Tables.documents(spark, dir), "doc_id")
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(50))
    def sigsOf(df: DataFrame): DataFrame = Dedup.minhashSig(df)

    val base = java.nio.file.Files
      .createTempDirectory("graft-arrival").toString

    arms.foreach { arm =>
      val t0 = System.nanoTime()
      var total = 0.0
      arm match {
        case "bucketed" =>
          val st = new IncrementalDedup.SigStore(spark, s"$base/bk")
          st.save(IncrementalDedup.initialStore(
            sigsOf(all.filter(bucket >= nBatches))))
          val bootSec = (System.nanoTime() - t0) / 1e9
          println(s"""{"arm":"$arm","phase":"bootstrap","sec":${f"$bootSec%.2f"}}""")
          (0 until nBatches).foreach { i =>
            listener.reset()
            val b0 = System.nanoTime()
            val inc = IncrementalDedup.ingest(st.load().get,
              sigsOf(all.filter(bucket === i)))
            val nPairs = inc.pairs.count()
            st.saveIncremental(inc.touched)
            val sec = (System.nanoTime() - b0) / 1e9
            total += sec
            val rows = st.load().get.count()
            println(s"""{"arm":"$arm","batch":$i,"sec":${f"$sec%.2f"},"pairs":$nPairs,"store_rows":$rows,"max_task_input":${listener.maxInput.get()},"max_task_shuffle":${listener.maxShuffle.get()}}""")
          }
        case "flat" =>
          // the pre-round-10 shape: flat store, full-scan probes, full
          // rewrite per batch (A/B dirs stand in for the tmp-swap)
          var cur = s"$base/flatA"; var nxt = s"$base/flatB"
          IncrementalDedup.initialStore(
            sigsOf(all.filter(bucket >= nBatches)))
            .write.mode("overwrite").parquet(cur)
          val bootSec = (System.nanoTime() - t0) / 1e9
          println(s"""{"arm":"$arm","phase":"bootstrap","sec":${f"$bootSec%.2f"}}""")
          (0 until nBatches).foreach { i =>
            listener.reset()
            val b0 = System.nanoTime()
            val inc = IncrementalDedup.ingest(
              spark.read.parquet(cur).drop("pb0", "pb1"),
              sigsOf(all.filter(bucket === i)))
            val nPairs = inc.pairs.count()
            inc.updatedStore.write.mode("overwrite").parquet(nxt)
            val sec = (System.nanoTime() - b0) / 1e9
            total += sec
            val t = cur; cur = nxt; nxt = t
            val rows = spark.read.parquet(cur).count()
            println(s"""{"arm":"$arm","batch":$i,"sec":${f"$sec%.2f"},"pairs":$nPairs,"store_rows":$rows,"max_task_input":${listener.maxInput.get()},"max_task_shuffle":${listener.maxShuffle.get()}}""")
          }
        case other => sys.error(s"unknown arm: $other")
      }
      println(s"""{"arm":"$arm","phase":"total_ingest","sec":${f"$total%.2f"},"batches":$nBatches,"sf":"$dir"}""")
    }
    spark.stop()
  }
}
