package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of the reference's incremental running mean
  * (ref IntegrityChecks_VLDB.sql:706: `avg += (new - avg) / n`, integer
  * division) — the batched equivalent of `StateStore.recordRun` for when
  * many observations of one object arrive in a single run.
  *
  * The reference's recurrence is ORDER-DEPENDENT (integer truncation each
  * step), so this Aggregator replays it over observations sorted by
  * arrival index — the buffer accumulates the observation list, and the
  * fold happens once in `finish`. That keeps merge associative (list
  * concat) while reproducing the reference bit-for-bit; it is the typed
  * Dataset surface (SURVEY §2.12) of the same state math.
  */
object IncrementalMean
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Long] {

  /** (arrivalIndex, durationMs) in; running-average ms out. */
  override def zero: Seq[(Long, Long)] = Seq.empty

  // prepend, not append: Seq is a List here and :+ copies the whole list
  // per element (O(n²) per group); finish() sorts anyway.
  override def reduce(b: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
    a +: b

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    a ++ b

  override def finish(buf: Seq[(Long, Long)]): Long =
    buf.sortBy(_._1).map(_._2).zipWithIndex.foldLeft(0L) {
      case (avg, (d, i)) => avg + (d - avg) / (i + 1)
    }

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
