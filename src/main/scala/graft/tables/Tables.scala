package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`; the same names are registered
  * as DuckDB views by the driver's oracle, so every query addresses tables
  * by these names on both sides.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet has shipped `ts` two ways across fixture generations:
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — readable
    * only via `spark.sql.legacy.parquet.nanosAsLong=true`, which every
    * entry point sets at SESSION BUILD, not here: a reader mutating
    * session conf mid-query is a spooky-action hazard) and plain
    * timestamp[us]. Probe the scan's schema and shim ONLY the
    * nanos-as-long case; a µs timestamp passes through untouched. Both
    * land on µs precision, the same truncation DuckDB applies, so oracle
    * comparison stays exact. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) file
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // tz-less timestamp[us]: normalize to TimestampType so every
        // downstream consumer (long casts, getTimestamp, window arith)
        // sees ONE type across fixture generations. Under the UTC session
        // every operator here runs with, the µs value is unchanged —
        // exactly what the nanos shim produced.
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Spread a scan across the cluster BEFORE heavy map-side work.
    *
    * The fixtures are single-row-group parquet files, so a scan is one
    * partition and everything before the first shuffle (explode, md5,
    * scoring) runs on ONE core. A production lake has many files and
    * doesn't need this — but a skewed/under-split input always can, and
    * the cost model is the same at any scale: pay one small shuffle of the
    * narrow input to parallelize per-row work that is 10-100× heavier than
    * the row itself. Key by the downstream grouping column so the
    * repartition ALSO satisfies the next groupBy's distribution (one
    * shuffle where a naive plan runs two).
    *
    * SELF-RETIRING on real lakes: when the frame already materializes in
    * enough partitions to keep every core busy (≥ half the default
    * parallelism — probed from the planned RDD, no job runs), the
    * repartition is skipped. For a bare scan that is the file-split
    * count (a 24-file table parallelizes itself); for a derived frame it
    * is the real post-shuffle layout — NOT the leaf-file count, which
    * says nothing about how a filtered/windowed frame is actually laid
    * out. The fixture workaround therefore costs nothing where it isn't
    * needed, which `BASELINE.md` §multi-file quantifies.
    * `SPARK_GRAFT_FORCE_SPREAD=always|never` overrides for A/B
    * benchmarking.
    *
    * Only worth it when per-row compute dominates: a plain sum/min scan is
    * cheaper serial than shuffled. Callers whose repartition is a
    * DISTRIBUTION requirement (aligning a downstream agg so an exploded
    * stream shuffles once, e.g. dd04) repartition explicitly instead of
    * going through this. */
  def spread(s: SparkSession, df: DataFrame, key: String): DataFrame = {
    val n = s.sparkContext.defaultParallelism
    sys.env.get("SPARK_GRAFT_FORCE_SPREAD") match {
      case Some("never")  => df
      case Some("always") => df.repartition(n, col(key))
      case _ =>
        if (df.rdd.getNumPartitions >= n / 2) df
        else df.repartition(n, col(key))
    }
  }
}
