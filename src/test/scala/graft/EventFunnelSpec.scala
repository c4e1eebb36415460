package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventQueries
import graft.tables.Tables

/** ev07 funnel cross-check: the one-exchange window formulation must agree
  * with a direct per-user fold over the sorted event list (the semantics a
  * `mapGroupsWithState` stream version would implement). */
class EventFunnelSpec extends AnyFunSuite {
  import SparkTestSession._

  private def bruteForce(): Map[Long, (Option[Timestamp], Option[Timestamp],
      Option[Timestamp])] = {
    val events = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    // full Timestamp.compareTo ordering (getTime drops sub-millisecond)
    def first(ts: Seq[Timestamp]): Option[Timestamp] =
      ts.sortWith((a, b) => a.compareTo(b) < 0).headOption
    events.groupBy(_._1).map { case (u, es) =>
      val fv = first(es.filter(_._2 == "view").map(_._3).toSeq)
      val fc = fv.flatMap(v => first(
        es.filter(e => e._2 == "click" && e._3.compareTo(v) > 0)
          .map(_._3).toSeq))
      val fp = fc.flatMap(c => first(
        es.filter(e => e._2 == "purchase" && e._3.compareTo(c) > 0)
          .map(_._3).toSeq))
      u -> ((fv, fc, fp))
    }
  }

  test("ev07: window formulation equals the per-user sorted fold") {
    val expected = bruteForce()
    val got = EventQueries.ev07Funnel.run(spark, sfDir).collect()
    assert(got.nonEmpty)
    assert(got.length === expected.size)
    got.foreach { r =>
      val u = r.getLong(0)
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getTimestamp(i))
      val (fv, fc, fp) = expected(u)
      assert(opt(1) === fv, s"first_view(user=$u)")
      assert(opt(2) === fc, s"first_click(user=$u)")
      assert(opt(3) === fp, s"first_purchase(user=$u)")
      val stage = r.getInt(4)
      val wantStage =
        if (fp.isDefined) 3 else if (fc.isDefined) 2 else if (fv.isDefined) 1
        else 0
      assert(stage === wantStage, s"stage(user=$u)")
      assert(r.getBoolean(5) === fp.isDefined, s"converted(user=$u)")
    }
  }

  test("ev08: offset-0 cell IS the cohort size; later cells never exceed it") {
    val rows = EventQueries.ev08CohortRetention.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val size0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val cohortSize = size0.getOrElse(r.getTimestamp(0),
        fail(s"cohort ${r.getTimestamp(0)} missing its offset-0 cell"))
      assert(r.getLong(2) <= cohortSize,
        s"cohort ${r.getTimestamp(0)} offset ${r.getLong(1)}")
      assert(r.getLong(1) >= 0L)
    }
  }

  test("ev07: stage timestamps are strictly ordered when present") {
    EventQueries.ev07Funnel.run(spark, sfDir).collect().foreach { r =>
      if (!r.isNullAt(2)) {
        assert(!r.isNullAt(1) && r.getTimestamp(2).after(r.getTimestamp(1)))
      }
      if (!r.isNullAt(3)) {
        assert(!r.isNullAt(2) && r.getTimestamp(3).after(r.getTimestamp(2)))
      }
    }
  }

  test("ev12: peak, peak time and midnight split match a crafted timeline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-conc").toString
    val base = 1772323200L // 2026-03-01 00:00:00 UTC
    def ns(sec: Long): Long = (base + sec) * 1000000000L
    // u1: session 10:00-10:10; u2: point session 10:05 (peak 2 on day 1);
    // u3: 23:50 -> 00:10 next day (20min gap => ONE session split across
    // the midnight boundary); u4: point session 00:05 day 2 (peak 2)
    Seq(
      (1L, ns(36000L), 1L, "view", 1.0, "{}"),
      (2L, ns(36600L), 1L, "view", 1.0, "{}"),
      (3L, ns(36300L), 2L, "view", 1.0, "{}"),
      (4L, ns(85800L), 3L, "view", 1.0, "{}"),
      (5L, ns(87000L), 3L, "view", 1.0, "{}"),
      (6L, ns(86700L), 4L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventQueries.ev12PeakConcurrency.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2).getTime / 1000L, r.getLong(3)))
    assert(got.toSeq === Seq(
      ("2026-03-01", 2L, base + 36300L, 3L),
      ("2026-03-02", 2L, base + 86700L, 2L)))
  }

  test("ev14: latency percentiles match a driver-side funnel fold") {
    val rows = EventQueries.ev14ConversionLatency.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    // reference: brute-force funnel (shared with the ev07 tests), then
    // exact interpolated percentiles per Monday-truncated cohort week
    val conv = bruteForce().toSeq.collect {
      case (_, (Some(fv), _, Some(fp))) =>
        val week = fv.toLocalDateTime.toLocalDate
          .`with`(java.time.DayOfWeek.MONDAY).toString
        (week, Math.floorDiv(fp.getTime, 1000L) -
          Math.floorDiv(fv.getTime, 1000L))
    }
    def pct(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted; val rank = p * (s.length - 1)
      val lo = s(rank.toInt); val hi = s(math.ceil(rank).toInt)
      val v = lo + (rank - rank.toInt) * (hi - lo)
      math.floor(v * 10000 + 0.5) / 10000
    }
    val expect = conv.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (w, xs) =>
        val ls = xs.map(_._2)
        (w, ls.length.toLong, pct(ls, 0.5), pct(ls, 0.9))
    }
    assert(rows.toSeq === expect)
    assert(rows.map(_._2).sum ===
      bruteForce().values.count(_._3.isDefined).toLong)
  }

  test("ev13: cover-day fan-out equals a per-day range scan of user-days") {
    // reference: for every day with activity, DAU = distinct users active
    // THAT day; active_7d = distinct users active in [day-6, day] — the
    // definition a naive range self-join implements, computed driver-side
    val userDays = Tables.events(spark, sfDir)
      .selectExpr("user_id", "to_date(ts) AS d").distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expect = userDays.map(_._2).distinct.sorted.map { day =>
      val win = userDays.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6)) }
      (day.toString,
        userDays.filter(_._2 == day).map(_._1).distinct.length.toLong,
        win.map(_._1).distinct.length.toLong)
    }
    val got = EventQueries.ev13RollingActives.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expect.toSeq)
  }
}
