package graft
import org.apache.spark.sql.SparkSession
/** Dev gauge: jobs + stages one dd16 ingest schedules (the round-12
  * directive-7 metric). Warms the memoized store first so the count
  * prices ingest only, and keys the listener on a job group so
  * late-delivered warm-up events on the async listener bus can never
  * inflate the measured count (round-13 review). */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.pipeline.IncrementalDedup.warmDd16BenchStore(spark, sfDir)
    graft.pipeline.IncrementalDedup.dd16IngestOnly(spark, sfDir).count()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val group = "graft-jobcount-" + java.util.UUID.randomUUID()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          if (j.properties != null &&
              group == j.properties.getProperty("spark.jobGroup.id")) {
            jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
            // per-job provenance so a shave targets the right job: the
            // callsite line + stage count of each scheduled job
            if (sys.env.contains("SPARK_GRAFT_JOBCOUNT_VERBOSE"))
              println(s"JOB ${j.jobId} stages=${j.stageInfos.size} " +
                j.stageInfos.map(_.name).mkString(" | "))
          }
          ()
        }
      })
    spark.sparkContext.setJobGroup(group, "measured dd16 ingest")
    try graft.pipeline.IncrementalDedup.dd16IngestOnly(spark, sfDir).count()
    finally spark.sparkContext.clearJobGroup()
    Thread.sleep(1500) // let the async bus drain the group's events
    println(s"JOBCOUNT jobs=${jobs.get()} stages=${stages.get()}")
    spark.stop()
  }
}
