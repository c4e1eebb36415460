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
    // a FRESH instance re-parses the file: every key must match again
    val r = new DurationStats(spark, path)
    nasty.zipWithIndex.foreach { case (u, i) =>
      assert(r.predictMs(u) === Some(1000L * (i + 1)),
        s"key did not round-trip: ${u.map(_.toInt).mkString(",")}")
    }
    // and the recurrence keeps folding into the SAME entry, not a
    // diverging duplicate
    r.record(nasty.head, 3000L)
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
    assert(new DurationStats(spark, path).predictMs(tricky)
      === Some(500L))
  }
}
