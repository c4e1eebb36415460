package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every oracle-checkable query from the operator modules; the
  * driver runs each against /root/testdata/sf0.01 and compares to DuckDB.
  */
object SparkEntry {

  /** All registered queries, in module order. */
  def allQueries: Seq[Q] =
    operators.Relational.queries ++
      operators.ScaleOps.queries ++
      operators.AsOfJoin.queries ++
      checks.Checks.queries ++
      checks.Drift.queries ++
      scheduler.SchedulerQueries.queries ++
      maintenance.Compaction.queries ++
      pipeline.Dedup.queries ++
      pipeline.IncrementalDedup.queries ++
      pipeline.Similarity.queries ++
      pipeline.TextAnalysis.queries ++
      pipeline.CleanCorpus.queries ++
      pipeline.TrainingData.queries ++
      pipeline.Multimodal.queries ++
      streaming.EventQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q07RevenueByRegion.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
