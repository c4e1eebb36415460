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

  // ---- ProfileStore N-generation history + trend (ref IC:706 applied
  // ---- to profile deltas) ----

  test("profile history is bounded at `keep` and run ids advance") {
    import SparkTestSession._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-profhist")
    val store = new graft.state.ProfileStore(spark,
      base.toString + "/profiles", keep = 4)
    (1 to 7).foreach { i =>
      store.record(Seq(("t", "n_rows", i.toDouble))
        .toDF("table_name", "metric", "value"))
    }
    val runs = store.history().select("run_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(runs === Seq(4L, 5L, 6L, 7L), "prunes beyond keep=4")
    assert(store.current().collect().head.getDouble(2) === 7.0)
    assert(store.previous().collect().head.getDouble(2) === 6.0)
  }

  test("legacy two-generation layout loads as runs 1/2 and migrates on record") {
    import SparkTestSession._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-proflegacy")
    val path = base.toString + "/profiles"
    Seq(("t", "n_rows", 10.0, "previous"), ("t", "n_rows", 20.0, "current"))
      .toDF("table_name", "metric", "value", "generation")
      .coalesce(1).write.parquet(path)
    val store = new graft.state.ProfileStore(spark, path)
    assert(store.current().collect().head.getDouble(2) === 20.0)
    assert(store.previous().collect().head.getDouble(2) === 10.0)
    store.record(Seq(("t", "n_rows", 30.0))
      .toDF("table_name", "metric", "value"))
    val hist = store.history().collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(hist === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("trend restates the IC:706 delta recurrence on arbitrary histories") {
    import SparkTestSession._
    import spark.implicits._
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val genVals = Gen.choose(3, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1.0, 1000.0)))
    val params = SCTest.Parameters.default.withMinSuccessfulTests(10)
    val prop = Prop.forAll(genVals) { vals =>
      val hist = vals.zipWithIndex
        .map { case (v, i) => (i + 1L, "t", "m", r4(v)) }
        .toDF("run_id", "table_name", "metric", "value")
      val rows = graft.state.ProfileStore.trendOf(hist).collect()
        .sortBy(_.getAs[Long]("run_id"))
      // reference fold: deltas r4-rounded per step; the incremental
      // recurrence a += (d - a)/n telescopes to the mean of prior deltas
      val vr = vals.map(r4)
      val deltas = vr.sliding(2).map { case Seq(a, b) =>
        r4(math.abs(b - a) / math.abs(a))
      }.toSeq
      rows.length == deltas.length && rows.zipWithIndex.forall {
        case (row, i) =>
          val priors = deltas.take(i)
          val wantAvg: Option[Double] =
            if (priors.isEmpty) None
            else Some(r4(priors.foldLeft((0.0, 0))((acc, d0) => {
              val n = acc._2 + 1; (acc._1 + (d0 - acc._1) / n, n)
            })._1))
          val d = row.getAs[Double]("delta")
          val gotAvg = if (row.isNullAt(row.fieldIndex("avg_prior_delta")))
            None else Some(row.getAs[Double]("avg_prior_delta"))
          val avgOk = (gotAvg, wantAvg) match {
            case (Some(a), Some(b)) =>
              // window mean vs recurrence may land one r4 step apart
              // when the mean sits on a floor tie (sum/count vs the
              // incremental fold differ in the last ulp); one step in
              // doubles is 0.0001000...1, so compare with headroom
              math.abs(a - b) < 1.5e-4
            case (a, b) => a.isEmpty && b.isEmpty
          }
          math.abs(d - deltas(i)) < 1e-9 &&
            (row.getAs[Long]("is_drifted") == 1L) == (d > 0.05) && avgOk
      }
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("trend flags acceleration only past the band AND 2x the history") {
    import SparkTestSession._
    import spark.implicits._
    // steady 10% growth: drifted every step, never accelerating (d = avg)
    // then a 50% jump: drifted AND accelerating
    val steady = Seq(100.0, 110.0, 121.0, 133.1, 146.41)
    val jump = steady :+ steady.last * 1.5
    val hist = jump.zipWithIndex
      .map { case (v, i) => (i + 1L, "t", "m", v) }
      .toDF("run_id", "table_name", "metric", "value")
    val rows = graft.state.ProfileStore.trendOf(hist).collect()
      .sortBy(_.getAs[Long]("run_id"))
    assert(rows.forall(_.getAs[Long]("is_drifted") == 1L))
    assert(rows.init.forall(_.getAs[Long]("is_accelerating") == 0L),
      "constant relative growth is not acceleration")
    assert(rows.last.getAs[Long]("is_accelerating") === 1L,
      "a jump past 2x the historical average step flags")
    // a quiet metric never flags either bit
    val quiet = Seq.fill(5)(42.0).zipWithIndex
      .map { case (v, i) => (i + 1L, "t", "m", v) }
      .toDF("run_id", "table_name", "metric", "value")
    val qrows = graft.state.ProfileStore.trendOf(quiet).collect()
    assert(qrows.forall(r => r.getAs[Long]("is_drifted") == 0L &&
      r.getAs[Long]("is_accelerating") == 0L))
  }
}
