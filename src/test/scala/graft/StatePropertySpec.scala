package graft

import java.time.Instant

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.InventoryRow
import graft.model.CheckObject
import graft.state.StateStore

/** Property-based hardening of the MERGE/state core (ref
  * IntegrityChecks_VLDB.sql:454-484, 700-722): the unit specs pin example
  * behavior; these pin the ALGEBRA under arbitrary inventories — the
  * invariants a 100k-table lake relies on every night. */
class StatePropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property (100 cases) and fail the suite on the
    * first counterexample (scalatestplus isn't on the classpath). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default, prop)
    assert(res.passed, res.status.toString)
  }

  private val genName: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))

  private val genScan: Gen[Seq[InventoryRow]] = for {
    names <- Gen.listOf(genName).map(_.distinct)
    sizes <- Gen.listOfN(names.size, Gen.choose(1L, 1000000L))
  } yield names.zip(sizes).map { case (n, sz) =>
    InventoryRow("db", "main", n, "U", sz, s"/x/$n.parquet")
  }

  private val genState: Gen[Seq[CheckObject]] = for {
    names <- Gen.listOf(genName).map(_.distinct)
    execs <- Gen.listOfN(names.size, Gen.choose(0, 50))
  } yield names.zipWithIndex.map { case (n, i) =>
    CheckObject.fresh(i + 1L, "db", "U", "main", n, "U", 10L)
      .copy(number_of_executions = execs(i))
  }

  test("reconcile is idempotent: a second MERGE with the same scan is a no-op") {
    check(Prop.forAll(genState, genScan) { (state, scan) =>
      val once = StateStore.reconcile(state, scan)
      val twice = StateStore.reconcile(once, scan)
      twice.sortBy(_.id) == once.sortBy(_.id)
    })
  }

  test("reconcile: scanned keys are active, unscanned soft-deleted, stats kept") {
    check(Prop.forAll(genState, genScan) { (state, scan) =>
      val merged = StateStore.reconcile(state, scan)
      val scanned = scan.map(_.object_name).toSet
      val statsKept = state.forall(o =>
        merged.find(_.object_name == o.object_name)
          .exists(_.number_of_executions == o.number_of_executions))
      merged.forall(o => o.active == scanned(o.object_name)) &&
        scanned.forall(n => merged.exists(_.object_name == n)) &&
        merged.map(_.object_name).distinct.size == merged.size &&
        statsKept
    })
  }

  test("reconcile: ids stay unique and never regress below the old maximum") {
    check(Prop.forAll(genState, genScan) { (state, scan) =>
      val merged = StateStore.reconcile(state, scan)
      val oldMax = (state.map(_.id) :+ 0L).max
      merged.map(_.id).distinct.size == merged.size &&
        state.forall(o => merged.exists(m =>
          m.object_name == o.object_name && m.id == o.id)) &&
        merged.filterNot(m => state.exists(_.object_name == m.object_name))
          .forall(_.id > oldMax)
    })
  }

  test("recordRun replays the IC:706 integer recurrence for any duration run") {
    val t0 = Instant.parse("2026-08-12T00:00:00Z")
    check(Prop.forAll(Gen.listOf(Gen.choose(0L, 3600000L))) { durations =>
      val o0 = CheckObject.fresh(1, "db", "U", "main", "t", "U", 1L)
      val end = durations.zipWithIndex.foldLeft(o0) { case (o, (d, i)) =>
        val start = t0.plusSeconds(i * 86400L) // a new day each run
        StateStore.recordRun(o, "C", start, start.plusMillis(d))
      }
      val expectedAvg = durations.zipWithIndex.foldLeft(0L) {
        case (avg, (d, i)) => avg + (d - avg) / (i + 1)
      }
      end.avg_run_duration_ms == expectedAvg &&
        end.number_of_executions == durations.size
    })
  }
}
