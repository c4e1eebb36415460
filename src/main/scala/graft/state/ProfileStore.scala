package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Persisted per-table PROFILE history for drift detection
  * (ref IntegrityChecks_VLDB.sql:56-61, 700-722: the reference keeps the
  * previous run's stats beside the current ones and shuffles
  * current → Previous* on every pass; this is the same two-generation
  * discipline for the data-shape profile [[graft.checks.Drift]] computes).
  *
  * Layout: one parquet dataset holding BOTH generations, tagged by a
  * `generation` column ('current' | 'previous'). `record()` demotes the
  * stored current to previous and writes the new profile as current —
  * atomically, via the same write-tmp-and-swap [[StateStore.save]] uses
  * (a killed run never leaves a half-written history; see StateStore for
  * the recovery-order proof). Profiles are one row per (table, metric):
  * driver-small at any corpus scale, so coalesce(1) is correct here. */
final class ProfileStore(spark: SparkSession, path: String) {

  private def fs = new Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def loadGen(gen: String): DataFrame = {
    val p = new Path(path)
    val tmp = new Path(path + ".tmp")
    val src =
      if (fs.exists(new Path(tmp, "_SUCCESS"))) Some(path + ".tmp")
      else if (fs.exists(p)) Some(path)
      else if (fs.exists(new Path(path + ".old"))) Some(path + ".old")
      else None
    src match {
      case Some(s) => spark.read.parquet(s)
        .filter(col("generation") === gen)
        .select("table_name", "metric", "value")
      case None => spark.emptyDataFrame
        .select(org.apache.spark.sql.functions.lit("").as("table_name"),
          org.apache.spark.sql.functions.lit("").as("metric"),
          org.apache.spark.sql.functions.lit(0.0).as("value"))
    }
  }

  /** The profile the LAST `record()` stored (what the next run compares
    * against); empty before the first run. */
  def current(): DataFrame = loadGen("current")

  /** The generation before that (what the last run compared against). */
  def previous(): DataFrame = loadGen("previous")

  /** Persist `profile` (table_name, metric, value) as the new current
    * generation, demoting the stored current to previous — the reference's
    * end-of-run stat shuffle (ref IC:700-722). Returns the demoted
    * generation so callers can run the drift comparison without a
    * re-read. */
  def record(profile: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.lit
    // materialize the old current BEFORE the swap overwrites the files it
    // reads from
    val prevRows = current().collect()
    val prev = spark.createDataFrame(
      spark.sparkContext.parallelize(prevRows.toSeq, 1), current().schema)
    val tmp = path + ".tmp"
    val old = path + ".old"
    profile.select("table_name", "metric", "value")
      .withColumn("generation", lit("current"))
      .unionByName(prev.withColumn("generation", lit("previous")))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val p = new Path(path)
    val pTmp = new Path(tmp)
    val pOld = new Path(old)
    if (fs.exists(pOld)) fs.delete(pOld, true)
    if (fs.exists(p)) fs.rename(p, pOld)
    fs.rename(pTmp, p)
    fs.delete(pOld, true)
    prev
  }
}
