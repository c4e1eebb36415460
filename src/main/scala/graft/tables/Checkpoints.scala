package graft.tables

import org.apache.spark.sql.DataFrame

/** One home for "materialize this intermediate for its ≥2 consumers".
  *
  * Default: `localCheckpoint` — executor-resident blocks, lineage severed.
  * Fastest, but NOT fault-tolerant: lose an executor mid-chain and the
  * blocks are gone with no lineage to rebuild them, so the whole job dies
  * (Spark resubmission can't help once lineage is cut). That is the right
  * trade for the fixture-scale feedback loop and for short chains, and the
  * wrong one for a 1000-executor cluster running a multi-hour iterative
  * chain (sim07/sim08/sim09 Lloyd training, dd06/dd09 component loops),
  * where SOME executor loss is a statistical certainty.
  *
  * Set `spark.graft.reliableCheckpoint=true` (plus
  * `sparkContext.setCheckpointDir` to a cluster-visible path, e.g. object
  * storage) and every materialization point in the library switches to a
  * RELIABLE checkpoint: the frame is written to the checkpoint store and
  * re-read, so an executor loss costs a task retry against storage instead
  * of the job. Same results either way — `RuntimeAdaptivitySpec` pins
  * that — the config only moves the durability/latency trade.
  */
object Checkpoints {
  def apply(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (s.conf.getOption("spark.graft.reliableCheckpoint").contains("true")) {
      // fail HERE with an actionable message, not at first materialization
      // deep inside a query with Spark's opaque "checkpoint directory has
      // not been set" error
      require(s.sparkContext.getCheckpointDir.nonEmpty,
        "spark.graft.reliableCheckpoint=true but no checkpoint directory " +
          "is configured: call sparkContext.setCheckpointDir(<cluster-" +
          "visible path>) before running, or unset the flag to use " +
          "localCheckpoint")
      df.checkpoint()
    } else
      df.localCheckpoint()
  }

  /** `df.materialized` — the call-site form of [[Checkpoints.apply]]. */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Checkpoints(df)
  }
}
