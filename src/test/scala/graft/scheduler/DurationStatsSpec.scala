package graft.scheduler

import org.scalatest.funsuite.AnyFunSuite

/** The persisted IC:677 duration history round-trips EVERY legal unit
  * key. The round-14 review found unescape() left \uXXXX sequences
  * literal, so a unit name carrying a control character never matched
  * its own history entry again — predictMs silently returned None and
  * the cost gate was inert for exactly that unit, while record()
  * appended a fresh diverging entry per pass. */
class DurationStatsSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private def tmpPath(): String =
    java.nio.file.Files.createTempDirectory("graft-dstats")
      .toString + "/stats.json"

  test("unit keys with quotes, backslashes and control chars " +
      "round-trip through the persisted file") {
    val path = tmpPath()
    val nasty = Seq(
      "db.main.foo\tbar", // tab -> 	 (the review's case)
      "db.\"quoted\".t",
      "db.back\\slash.t",
      "db.newline\nname.t",
      "plain.unit")
    val w = new DurationStats(spark, path)
    nasty.zipWithIndex.foreach { case (u, i) =>
      w.record(u, 1000L * (i + 1)) }
    w.flush()
    // a FRESH instance re-parses the file: every key must match again
    val r = new DurationStats(spark, path)
    nasty.zipWithIndex.foreach { case (u, i) =>
      assert(r.predictMs(u) === Some(1000L * (i + 1)),
        s"key did not round-trip: ${u.map(_.toInt).mkString(",")}")
    }
    // and the recurrence keeps folding into the SAME entry, not a
    // diverging duplicate
    r.record(nasty.head, 3000L)
    r.flush()
    val r2 = new DurationStats(spark, path)
    assert(r2.predictMs(nasty.head) === Some(2000L)) // (1000+ (3000-1000)/2)
  }

  test("backslash-then-quote sequences are unambiguous (single-pass " +
      "unescape, not chained replace)") {
    val path = tmpPath()
    // escape() writes this as \\\" — a chained replace that handles
    // \" first would mis-parse it as a backslash-eating quote
    val tricky = "a\\\"b"
    val w = new DurationStats(spark, path)
    w.record(tricky, 500L)
    w.flush()
    assert(new DurationStats(spark, path).predictMs(tricky)
      === Some(500L))
  }

  test("record() is memory-only; flush() writes the file ONCE per pass " +
      "and a flush with nothing new is a no-op (round-14 verdict #2: a " +
      "20k-table inventory must not write O(tables²) driver JSON)") {
    val path = tmpPath()
    val w = new DurationStats(spark, path)
    val before = DurationStats.flushes.get()
    (1 to 50).foreach(i => w.record(s"db.s.t$i", 100L * i))
    // no file yet: nothing persisted until the pass-end flush
    assert(!new java.io.File(path).exists())
    assert(DurationStats.flushes.get() === before)
    w.flush()
    assert(DurationStats.flushes.get() === before + 1)
    // every in-pass record landed in the one write
    val r = new DurationStats(spark, path)
    (1 to 50).foreach(i =>
      assert(r.predictMs(s"db.s.t$i") === Some(100L * i)))
    // idempotent: a second flush with no new records writes nothing
    w.flush()
    assert(DurationStats.flushes.get() === before + 1)
  }

  test("a full incremental pass over a multi-table inventory flushes " +
      "the table history exactly once (the pass-level wiring)") {
    val base = java.nio.file.Files.createTempDirectory("graft-ds-pass")
    // two real tables so the pass records two table durations
    val db = s"$base/db"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(db))
    spark.read.parquet(s"$sfDir/nation.parquet")
      .write.parquet(s"$db/nation.parquet")
    spark.read.parquet(s"$sfDir/region.parquet")
      .write.parquet(s"$db/region.parquet")
    val log = new graft.executor.CommandLog(spark, None)
    val before = DurationStats.flushes.get()
    IncrementalScheduler.run(spark,
      new graft.catalog.DirInventory(spark, Map("db" -> db)),
      s"$base/ckpt", log, graft.model.SystemClock)
    assert(DurationStats.flushes.get() === before + 1)
    // and the one write carries BOTH tables' histories
    val r = new DurationStats(spark, s"$base/ckpt/table_stats.json")
    assert(r.predictMs("db.main.nation").isDefined)
    assert(r.predictMs("db.main.region").isDefined)
  }
}
