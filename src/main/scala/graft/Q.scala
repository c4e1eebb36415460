package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query: the unit of the correctness gate.
  *
  * `run` builds the DataFrame against the parquet tables under `sfDir`;
  * `oracle` is the equivalent ANSI SQL the driver executes in DuckDB over
  * the same tables (None → driver records a weaker rows-only check).
  * Column names/aliases MUST match between the two sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
