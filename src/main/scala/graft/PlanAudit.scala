package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump the physical plan of each named query (or all headline
  * ones) so pushdown / pruning / join strategy can be audited. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args(0).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allQueries
      .filter(q => names.isEmpty || names(q.name))
      .foreach { q =>
        println(s"\n===== ${q.name} =====")
        try println(q.run(spark, sfDir).queryExecution.executedPlan
          .toString.take(4000))
        catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
      }
    spark.stop()
  }
}
