package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventQueries

/** Property-based hardening of the sessionization family: the oracle pins
  * ev03/ev10 on the fixture; this pins the ALGORITHMS on arbitrary random
  * event sets against straight-line driver references — ties on ts,
  * sub-second gap edges, single-event users, cross-midnight days. */
class EventPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark

  // base instant: 2026-03-01 00:00:00 UTC (test session TZ is UTC)
  private val Base = 1772323200L

  private case class Ev(user: Long, sec: Long, id: Long, value: Double)

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(1, 80)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 4L)
      // offsets cluster around gap edges: multiples of ~30min ± seconds
      base <- Gen.choose(0L, 8L)
      jit <- Gen.choose(-3L, 3L)
      v <- Gen.choose(0, 50) // integer-valued doubles: exact sums
    } yield Ev(u, math.max(0L, base * 1800L + jit), 0L, v.toDouble))
  } yield evs.zipWithIndex.map { case (e, i) => e.copy(id = i.toLong) }

  private def toDf(evs: Seq[Ev]) = {
    import spark.implicits._
    evs.map(e => (e.user, new Timestamp((Base + e.sec) * 1000L), e.id,
        e.value))
      .toDF("user_id", "ts", "event_id", "value")
  }

  /** Reference sessionizer: sort, split on >30min floor-second gaps. */
  private def refSessions(evs: Seq[Ev])
      : Seq[(Long, Long, Long, Long, Long, Double)] =
    evs.groupBy(_.user).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.sec, e.id))
      val sessions = sorted.foldLeft(List.empty[List[Ev]]) { (acc, e) =>
        acc match {
          case cur :: rest if e.sec - cur.head.sec <= 1800 =>
            (e :: cur) :: rest // cur.head is the most recent (prepend)
          case _ => List(e) :: acc
        }
      }.reverse
      sessions.zipWithIndex.map { case (ses, i) =>
        val secs = ses.map(_.sec)
        (u, i + 1L, ses.size.toLong, secs.min, secs.max,
          math.floor(ses.map(_.value).sum * 100 + 0.5) / 100)
      }
    }

  test("ev03 sessionize equals the driver reference on random event sets") {
    val prop = Prop.forAll(genEvents) { evs =>
      val got = EventQueries.sessionize(toDf(evs)).collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getTimestamp(3).getTime / 1000L - Base,
          r.getTimestamp(4).getTime / 1000L - Base, r.getDouble(5))
      }.toSeq.sortBy(t => (t._1, t._2))
      val want = refSessions(evs).sortBy(t => (t._1, t._2))
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  /** Reference islands: distinct active days per user, consecutive runs. */
  private def refIslands(evs: Seq[Ev]): Seq[(Long, Long, Long, Long, Long)] =
    evs.groupBy(_.user).toSeq.flatMap { case (u, es) =>
      val byDay = es.groupBy(_.sec / 86400L).view.mapValues(_.size.toLong)
      val days = byDay.keys.toSeq.sorted
      val runs = days.foldLeft(List.empty[List[Long]]) { (acc, d) =>
        acc match {
          case cur :: rest if d == cur.head + 1 => (d :: cur) :: rest
          case _ => List(d) :: acc
        }
      }.reverse
      runs.map { run =>
        val r = run.reverse
        (u, r.head, r.last, r.size.toLong, r.map(byDay(_)).sum)
      }
    }

  test("ev10 islands equals the driver reference on random event sets") {
    // spread events over ~6 days so multi-day islands and gaps both occur
    val genDays = genEvents.map(_.map(e =>
      e.copy(sec = (e.id * 7919L) % (6L * 86400L) + e.sec % 3600L)))
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def dayStr(day: Long): String = fmt.format(
      new java.util.Date((Base + day * 86400L) * 1000L))
    val prop = Prop.forAll(genDays) { evs =>
      val got = EventQueries.activeIslands(toDf(evs)).collect().map { r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getLong(4))
      }.toSeq.sortBy(t => (t._1, t._2))
      val want = refIslands(evs).map { case (u, d0, d1, nd, ne) =>
        (u, dayStr(d0), dayStr(d1), nd, ne)
      }.sortBy(t => (t._1, t._2))
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
