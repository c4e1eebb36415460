package graft.executor

import java.sql.Timestamp
import java.util.UUID

import scala.collection.mutable.ArrayBuffer
import scala.util.control.NonFatal

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.model.{Clock, CommandLogEntry}

/** The execution/logging kernel — the `CommandExecute` contract
  * (ref ola/CommandExecute.sql:170-255, SURVEY.md §3.3): every check runs
  * through ONE choke point that owns timing, dry-run, error capture, and
  * the audit log.
  */
final class CommandLog(spark: SparkSession, path: Option[String]) {
  private val buf = ArrayBuffer.empty[CommandLogEntry]

  def append(e: CommandLogEntry): Unit = synchronized { buf += e }
  def entries: Seq[CommandLogEntry] = synchronized { buf.toSeq }

  /** Append-flush to parquet (ref CommandLog INSERT/UPDATE collapsed into
    * start+completion rows, SURVEY §2.1 S11). */
  def flush(): Unit = path.foreach { p =>
    import spark.implicits._
    val rows = entries
    if (rows.nonEmpty)
      rows.toDS().coalesce(1).write.mode(SaveMode.Append).parquet(p)
  }
}

/** Outcome of one command (ref CE:228-240 outcome messages). */
final case class ExecResult(
    entry: CommandLogEntry,
    outcome: String, // "Succeeded" | "Failed" | "Not Executed"
    violations: Long)

final class CommandExecutor(log: CommandLog, clock: Clock, execute: Boolean) {

  /** Run `action` (a Spark action returning a violation count) under the
    * CommandExecute contract. Dry-run (`execute=false`) logs the command
    * with outcome "Not Executed" and error columns NULL (ref CE:197,231,246).
    * A nonzero violation count is a check failure with errorNumber 8939
    * (the DBCC corruption error class); exceptions are captured, never
    * propagated (ref CE:204-222 TRY/CATCH mode). */
  def run(db: String, schema: String, obj: String, objType: String,
      command: String, commandType: String, extendedInfo: String = "{}")(
      action: => Long): ExecResult = {
    val start = clock.now()
    if (!execute) {
      val e = CommandLogEntry(UUID.randomUUID().toString, db, schema, obj,
        objType, extendedInfo, command, commandType,
        Timestamp.from(start), Some(Timestamp.from(clock.now())), None, None)
      log.append(e)
      ExecResult(e, "Not Executed", 0L)
    } else {
      val (err, msg, outcome, viol) =
        try {
          val v = action
          if (v == 0L) (Some(0), None, "Succeeded", 0L)
          else (Some(8939), Some(s"$v integrity violations"), "Failed", v)
        } catch {
          case NonFatal(ex) =>
            (Some(50000), Some(Option(ex.getMessage).getOrElse(ex.toString)),
              "Failed", -1L)
        }
      val e = CommandLogEntry(UUID.randomUUID().toString, db, schema, obj,
        objType, extendedInfo, command, commandType,
        Timestamp.from(start), Some(Timestamp.from(clock.now())), err, msg)
      log.append(e)
      ExecResult(e, outcome, viol)
    }
  }
}
