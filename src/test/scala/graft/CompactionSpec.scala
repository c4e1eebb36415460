package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.maintenance.Compaction

/** Compaction planner invariants — the IndexOptimize-analog maintenance
  * tier plans merges over file METADATA only. */
class CompactionSpec extends AnyFunSuite {
  import SparkTestSession._

  private val T = 100L // target bytes for the synthetic listings

  private def listing(rows: (String, String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("table_name", "file", "bytes")
  }

  test("runs of small files pack into <2×target groups; big files stay solo") {
    val files = listing(
      ("a", "f01", 40), ("a", "f02", 40), ("a", "f03", 40), // 120 -> split
      ("a", "f04", 250), // big: solo, must NOT absorb neighbors
      ("a", "f05", 30), ("a", "f06", 30), // resume packing after the big
      ("b", "f01", 100)) // exactly at target: big by definition (>= T)
    val plan = Compaction.plan(files, T).collect()
    val byKey = plan.map(r =>
      (r.getAs[String]("table_name"), r.getAs[String]("first_file")) -> r)
      .toMap
    // every merge group is 2+ small files totalling < 2*target
    plan.filter(_.getAs[String]("action") == "merge").foreach { r =>
      assert(r.getAs[Long]("n_files") >= 2)
      assert(r.getAs[Long]("group_bytes") < 2 * T)
    }
    // the big file is its own noop group — neighbors untouched by it
    val solo = byKey(("a", "f04"))
    assert(solo.getAs[Long]("n_files") === 1)
    assert(solo.getAs[String]("action") === "noop")
    // f05/f06 merge together (60 bytes), not with anything else
    val tail = byKey(("a", "f05"))
    assert(tail.getAs[String]("last_file") === "f06")
    assert(tail.getAs[Long]("group_bytes") === 60)
    assert(tail.getAs[String]("action") === "merge")
    // an exactly-at-target file is already healthy: solo noop
    val bSolo = plan.filter(r => r.getAs[String]("table_name") == "b")
    assert(bSolo.length === 1 && bSolo.head.getAs[String]("action") == "noop")
  }

  test("every file lands in exactly one group (byte conservation)") {
    val files = listing((1 to 37).map(i =>
      ("t", f"f$i%02d", (i * 13 % 90 + 10).toLong)): _*)
    val plan = Compaction.plan(files, T).collect()
    val totalIn = (1 to 37).map(i => (i * 13 % 90 + 10).toLong).sum
    assert(plan.map(_.getAs[Long]("group_bytes")).sum === totalIn)
    assert(plan.map(_.getAs[Long]("n_files")).sum === 37L)
  }

  test("boundary-straddling small-file runs still merge (start bucketing)") {
    // end-bucketing regression: 60+60 @ target 100 has cumulative ENDS in
    // different buckets and would degenerate into two noop singletons —
    // on the exact pathology the planner exists to fix
    val plan = Compaction.plan(
      listing(("t", "f1", 60), ("t", "f2", 60)), T).collect()
    assert(plan.length === 1)
    assert(plan.head.getAs[String]("action") === "merge")
    assert(plan.head.getAs[Long]("group_bytes") === 120)
    // and iterated replanning converges: the merged 120 is >= target,
    // so the next round plans nothing further
    val next = Compaction.plan(listing(("t", "m1", 120)), T).collect()
    assert(next.forall(_.getAs[String]("action") == "noop"))
  }

  test("merges() proposes real merges on a multi-file table directory") {
    // the sf fixtures are one healthy file per table (their plan is all
    // noop rows) — build a real fragmented table dir to drive the merge
    // path end to end through listFiles
    val base = java.nio.file.Files.createTempDirectory("graft-compact")
    val dir = s"$base/frag.parquet"
    spark.read.parquet(s"$sfDir/nation.parquet")
      .repartition(5).write.mode("overwrite").parquet(dir)
    val files = Compaction.listFiles(spark, base.toString)
    assert(files.count() >= 5)
    val bytes = files.collect().map(_.getAs[Long]("bytes"))
    val target = bytes.sum // everything should pack toward one group
    val merges = Compaction.merges(files, target).collect()
    assert(merges.nonEmpty)
    assert(merges.forall(_.getAs[String]("action") == "merge"))
    assert(merges.map(_.getAs[Long]("n_files")).sum >= 2)

    val all = Compaction.plan(Compaction.listFiles(spark, sfDir),
      256 * 1024).collect()
    assert(all.nonEmpty) // clean fixture: report exists (noop rows)
  }

  test("plan rides ONE exchange (both windows share key and order)") {
    val files = Compaction.listFiles(spark, sfDir)
    val p = Compaction.plan(files, 256 * 1024)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1)
  }

  test("compact() executes the plan: fewer files, same rows, noop re-plan") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-x")
    val dir = s"$base/frag.parquet"
    val src = spark.read.parquet(s"$sfDir/nation.parquet")
    src.repartition(8).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val nFilesBefore = Compaction.listFiles(spark, base.toString).count()
    assert(nFilesBefore >= 8)

    val totalBytes = Compaction.listFiles(spark, base.toString)
      .collect().map(_.getAs[Long]("bytes")).sum
    // the nightly pass's quiet-table precheck: a fragmented table IS
    // worth planning...
    assert(Compaction.worthPlanning(spark, dir, totalBytes))
    val merged = Compaction.compact(spark, dir, targetBytes = totalBytes)
    assert(merged.merged >= 1)
    assert(!merged.leaseSkipped)
    // ...and the compacted one is not (<2 sub-target files can never
    // merge) — the nightly pass skips its lease + plan job entirely
    assert(!Compaction.worthPlanning(spark, dir, totalBytes))

    // same rows, fewer files, staging dir gone
    assert(spark.read.parquet(dir).count() === before)
    val after = Compaction.listFiles(spark, base.toString)
    assert(after.count() < nFilesBefore)
    assert(!new java.io.File(s"$dir/.compact-tmp").exists())
    // the durable record survives the staging-dir cleanup and explains
    // every deleted original's absence as compaction, not data loss —
    // the vanished-file reconciliation input (round-14 advice)
    val superseded = Compaction.supersededPaths(spark, dir)
    assert(superseded.nonEmpty)
    assert(superseded.forall(p => !new java.io.File(p).exists()))
    // convergence: with everything at/above target (or a single small
    // survivor), the re-plan proposes no further merges
    val replan = Compaction.merges(after, totalBytes).collect()
    assert(replan.isEmpty)
  }

  test("compact() honors a time budget at merge-group boundaries: the " +
      "committed prefix stands, the skip is loud, and a re-run " +
      "compacts exactly the remainder (IC:644)") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-b")
    val dir = s"$base/frag.parquet"
    spark.read.parquet(s"$sfDir/nation.parquet")
      .repartition(8).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val files = Compaction.tableFiles(spark, dir)
    val total = files.collect().map(_.getAs[Long]("bytes")).sum
    val target = total / 3
    assert(Compaction.merges(files, target).count() >= 2,
      "fixture must plan at least two merge groups")
    // the budget check reads the clock once per group head: 6 s per
    // read against a 10 s horizon admits group 0 and refuses group 1
    val t0 = java.time.Instant.parse("2026-01-01T00:00:00Z")
    val clock = new graft.model.Clock {
      private var calls = 0
      def now(): java.time.Instant = synchronized {
        calls += 1; t0.plusSeconds(6L * calls)
      }
      override def observe(): java.time.Instant = now()
    }
    val done = Compaction.compact(spark, dir, files, target,
      deadline = Some(t0.plusSeconds(10L)), clock = clock)
    assert(done.merged === 1)
    // nothing lost: the compacted group's rows and every untouched
    // original are all still readable
    assert(spark.read.parquet(dir).count() === before)
    // the next (unbudgeted) run picks up the remainder; iterated
    // re-planning converges to a no-merge plan (merged outputs can
    // themselves be sub-target and re-merge once more)
    val done2 = Compaction.compact(spark, dir, target)
    assert(done2.merged >= 1)
    assert(spark.read.parquet(dir).count() === before)
    var rounds = 0
    while (rounds < 3 && Compaction.merges(
        Compaction.tableFiles(spark, dir), target).count() > 0) {
      Compaction.compact(spark, dir, target); rounds += 1
    }
    assert(Compaction.merges(
      Compaction.tableFiles(spark, dir), target).count() === 0)
    assert(spark.read.parquet(dir).count() === before)
  }

  test("compact() refuses a table another compactor holds the lease on " +
      "(loud skip, zero groups, files untouched) and proceeds once " +
      "the lease is released — the nightly --compact-tables pass and " +
      "the weekly --compact job can overlap safely") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact-l")
    val dir = s"$base/frag.parquet"
    spark.read.parquet(s"$sfDir/nation.parquet")
      .repartition(8).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).count()
    val nFilesBefore = Compaction.listFiles(spark, base.toString).count()
    val total = Compaction.tableFiles(spark, dir)
      .collect().map(_.getAs[Long]("bytes")).sum
    // another live compactor: hold the same per-table lease
    val other = new graft.tables.StoreLease(spark, dir,
      "table compaction")
    other.acquire()
    try {
      val done = Compaction.compact(spark, dir, targetBytes = total)
      assert(done.merged === 0)
      // the decline reason travels back to the caller (round-14 #3)
      assert(done.leaseSkipped)
      // nothing moved, nothing deleted, no staging dir left behind
      assert(Compaction.listFiles(spark, base.toString).count()
        === nFilesBefore)
      assert(spark.read.parquet(dir).count() === before)
    } finally other.release()
    // lease released: the same call now compacts
    assert(Compaction.compact(spark, dir, targetBytes = total).merged >= 1)
    assert(spark.read.parquet(dir).count() === before)
  }

  test("planWithMembers: explicit member lists partition the listing exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // execution consumes the members column — so it must name every input
    // file exactly once across groups, and agree with n_files. This is
    // the invariant that frees execution from the contiguous-range
    // assumption the old [first_file, last_file] re-derivation baked in.
    val genFiles: Gen[List[(String, String, Long)]] = for {
      n <- Gen.choose(1, 40)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 3 * T))
    } yield sizes.zipWithIndex.map { case (sz, i) =>
      (if (i % 2 == 0) "a" else "b", f"f$i%03d", sz)
    }
    val prop = Prop.forAll(genFiles) { fs =>
      val plan = Compaction.planWithMembers(listing(fs: _*), T).collect()
      val members = plan.flatMap(_.getSeq[String](
        plan.head.fieldIndex("members")))
      val sizeOk = plan.forall(r =>
        r.getAs[Long]("n_files") == r.getSeq[String](
          r.fieldIndex("members")).size.toLong)
      members.sorted.toSeq == fs.map(_._2).sorted && sizeOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("packing invariants hold on random listings (property)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genFiles: Gen[List[(String, String, Long)]] = for {
      n <- Gen.choose(1, 50)
      sizes <- Gen.listOfN(n, Gen.choose(1L, 3 * T))
    } yield sizes.zipWithIndex.map { case (sz, i) =>
      (if (i % 3 == 0) "a" else "b", f"f$i%03d", sz)
    }
    val prop = Prop.forAll(genFiles) { fs =>
      val plan = Compaction.plan(listing(fs: _*), T).collect()
      val bytesOk = plan.map(_.getAs[Long]("group_bytes")).sum ==
        fs.map(_._3).sum
      val countOk = plan.map(_.getAs[Long]("n_files")).sum == fs.size.toLong
      val mergesOk = plan.forall { r =>
        (r.getAs[String]("action") == "merge") ==
          (r.getAs[Long]("n_files") >= 2)
      }
      val boundOk = plan
        .filter(_.getAs[String]("action") == "merge")
        .forall(_.getAs[Long]("group_bytes") < 2 * T)
      // every at/above-target input file is exactly one solo group
      val bigIn = fs.count(_._3 >= T)
      val bigSolo = plan.count(r => r.getAs[Long]("n_files") == 1L &&
        r.getAs[Long]("group_bytes") >= T)
      bytesOk && countOk && mergesOk && boundOk && bigIn == bigSolo
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
