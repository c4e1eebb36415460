package graft.model

import java.sql.{Date, Timestamp}
import java.time.Instant

/** Durable + config schemas of the engine (SURVEY.md §7.1 step 1).
  *
  * `CheckObject` mirrors the reference's persistent check-history table
  * `dbo.CheckTableObjects` (ref IntegrityChecks_VLDB.sql:42-65);
  * `CommandLogEntry` mirrors `dbo.CommandLog` (ref ola/CommandLog.sql:7-28).
  */
final case class CheckObject(
    id: Long,
    database_name: String,
    dbtype: String, // 'S' system / 'U' user (ref IC:256-263)
    schema_name: String,
    object_name: String,
    object_type: String, // 'U' table / 'V' view
    used_page_count: Long, // lake analog: total file bytes of the table
    start_time: Option[Timestamp],
    end_time: Option[Timestamp],
    run_duration_ms: Long,
    command: String,
    number_of_executions: Long,
    avg_run_duration_ms: Long, // incremental mean (ref IC:706)
    previous_run_date: Option[Timestamp],
    previous_run_duration_ms: Long,
    last_check_date: Date, // sentinel 1900-01-01 (ref IC:62)
    active: Boolean) // soft delete via MERGE (ref IC:482-483)

object CheckObject {
  val SentinelDate: Date = Date.valueOf("1900-01-01")

  def fresh(id: Long, db: String, dbtype: String, schema: String,
      name: String, objType: String, size: Long): CheckObject =
    CheckObject(id, db, dbtype, schema, name, objType, size,
      None, None, 0L, "", 0L, 0L, None, 0L, SentinelDate, active = true)
}

final case class CommandLogEntry(
    id: String, // UUID (reference used int IDENTITY, ref D7)
    database_name: String,
    schema_name: String,
    object_name: String,
    object_type: String,
    extended_info: String, // JSON string (reference: opaque xml)
    command: String,
    command_type: String, // e.g. DBCC_CHECKTABLE analog
    start_time: Timestamp,
    end_time: Option[Timestamp],
    error_number: Option[Int], // None while running / dry-run (ref CE:246)
    error_message: Option[String])

/** The check vocabulary (ref ola/DatabaseIntegrityCheck.sql:720). */
sealed trait CheckCommand { def name: String }
object CheckCommand {
  case object CheckDb extends CheckCommand { val name = "CHECKDB" }
  case object CheckAlloc extends CheckCommand { val name = "CHECKALLOC" }
  case object CheckCatalog extends CheckCommand { val name = "CHECKCATALOG" }
  case object CheckTable extends CheckCommand { val name = "CHECKTABLE" }
  case object CheckFileGroup extends CheckCommand { val name = "CHECKFILEGROUP" }
  val all: Seq[CheckCommand] =
    Seq(CheckDb, CheckAlloc, CheckCatalog, CheckTable, CheckFileGroup)
}

/** Database processing-order strategies (ref DIC:1003-1089, validated at
  * DIC:824). The two REPLICA_LAST_GOOD_CHECK policies have no lake analog
  * (no replicas — SURVEY §2.1 S5) and are intentionally omitted. */
sealed trait DatabaseOrder { def name: String }
object DatabaseOrder {
  case object NameAsc extends DatabaseOrder { val name = "DATABASE_NAME_ASC" }
  case object NameDesc extends DatabaseOrder { val name = "DATABASE_NAME_DESC" }
  case object SizeAsc extends DatabaseOrder { val name = "DATABASE_SIZE_ASC" }
  case object SizeDesc extends DatabaseOrder { val name = "DATABASE_SIZE_DESC" }
  case object LastGoodCheckAsc extends DatabaseOrder {
    val name = "DATABASE_LAST_GOOD_CHECK_ASC" } // IC:583-595 behavior
  case object LastGoodCheckDesc extends DatabaseOrder {
    val name = "DATABASE_LAST_GOOD_CHECK_DESC" }
  val all: Seq[DatabaseOrder] = Seq(NameAsc, NameDesc, SizeAsc, SizeDesc,
    LastGoodCheckAsc, LastGoodCheckDesc)
  def parse(s: String): Either[String, DatabaseOrder] =
    all.find(_.name.equalsIgnoreCase(s))
      .toRight(s"unknown DatabaseOrder '$s' (ref DIC:824)")
}

/** Engine configuration (the reference's parameter surface, ref IC:22-29 +
  * DIC:12-30 extras). Validated like ref IC:355-402. */
final case class CheckConfig(
    databases: String = "ALL_DATABASES", // selection DSL
    objects: Option[String] = None, // 3-part object DSL (ref DIC:645-692)
    physicalOnly: Boolean = false, // ref IC:24
    dataPurity: Boolean = true, // ref IC:685-686
    maxDop: Int = 0, // ref IC:25 (0 = engine default)
    timeLimitSeconds: Option[Long] = None, // ref IC:26
    execute: Boolean = true, // dry-run when false (ref IC:29 / CE:197)
    logToTable: Boolean = true, // ref IC:28
    databaseOrder: DatabaseOrder = DatabaseOrder.LastGoodCheckAsc,
    // Spark-native form of the reference's parallel queue sessions
    // (SURVEY §2.11, ref Queue/QueueDatabase): how many INDEPENDENT
    // per-table checks may be in flight at once. 1 = the sequential
    // reference loop; >1 submits from a bounded pool with
    // budget-check-before-submit semantics preserved.
    concurrency: Int = 1) {

  def validate(): Either[String, CheckConfig] =
    if (maxDop < 0 || maxDop > 64)
      Left(s"maxDop must be in [0,64], got $maxDop") // ref IC:363-369
    else if (timeLimitSeconds.exists(_ < 0))
      Left(s"timeLimit must be >= 0") // ref IC:371-377
    else if (databases == null || databases.trim.isEmpty)
      Left("databases selection must be non-empty") // ref IC:379-385
    else if (concurrency < 1 || concurrency > 64)
      Left(s"concurrency must be in [1,64], got $concurrency")
    else Right(this)
}

/** Injectable clock — everything time-dependent in the scheduler takes one
  * (SURVEY.md §7.4 hard-problem #2; ref GETDATE() at IC:71,505,644,677).
  *
  * DETERMINISM CONTRACT (why three methods, not one): every `now()` call
  * is a DRIVER-THREAD event — the scheduler's deadline gates, admission
  * predictions, halfway flip and recorded check-start instants all read
  * it from the driver loop in submission order, so a deterministic clock
  * yields the same decision sequence at any concurrency. Worker/pool
  * threads must never call `now()` (with a ticking test clock that would
  * make the driver's tick stream depend on pool interleaving); they use
  * `observe()` for wall stamps and `elapsedMs` for durations instead. */
trait Clock {
  def now(): Instant

  /** Non-ticking observation for worker threads and audit-log stamps:
    * must not perturb the deterministic `now()` sequence. */
  def observe(): Instant = now()

  /** Duration of an action that began at monotonic `startNanos`
    * (System.nanoTime). Deterministic clocks return a FIXED value so
    * state recorded by concurrent runs is byte-identical run-to-run. */
  def elapsedMs(startNanos: Long): Long =
    (System.nanoTime() - startNanos) / 1000000L
}
object SystemClock extends Clock {
  def now(): Instant = Instant.now()
  override def observe(): Instant = Instant.now()
}

/** Deterministic test clock: starts at `start`, advances `tickMs` per call
  * plus any manual `advance`. `observe()` reads without ticking and
  * `elapsedMs` is the fixed `tickMs`, so concurrent scheduler runs make
  * exactly the driver's decision sequence and record identical state. */
final class ManualClock(start: Instant, tickMs: Long = 0L) extends Clock {
  private var current: Instant = start
  // synchronized: visibility across the scheduler's pool threads
  def now(): Instant = synchronized {
    val r = current; current = current.plusMillis(tickMs); r
  }
  override def observe(): Instant = synchronized { current }
  override def elapsedMs(startNanos: Long): Long = tickMs
  def advance(ms: Long): Unit = synchronized {
    current = current.plusMillis(ms)
  }
}
