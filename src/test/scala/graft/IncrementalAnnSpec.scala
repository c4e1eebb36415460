package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.IncrementalAnn

/** The incremental ANN tier's contract: an index bootstrapped on the
  * resident corpus and grown by per-batch `ingest` must hold EXACTLY
  * the assignments a monolithic assign-everything pass against the
  * same frozen centroids produces — across multi-batch evolutions,
  * crash replays, and on-disk round trips. sim14 pins the same
  * semantics against the DuckDB oracle on the fixtures. */
class IncrementalAnnSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Deterministic synthetic code vectors (8 dims, values in the int8
    * code range) — two loose blobs plus a drifted-arrival blob so
    * clusters are non-trivial and arrivals crowd one region. */
  private def vecs(ids: Seq[Long]): DataFrame =
    ids.map { i =>
      val blob = (i % 3).toInt
      val qv = (0 until 8).map(d =>
        (blob * 40 - 60 + ((i * 31 + d * 17) % 13) - 6).toLong).toArray
      (i, qv.toSeq)
    }.toDF("vec_id", "qv")

  private def asgSet(df: DataFrame): Set[(Long, Int)] =
    df.select(col("vec_id"), col("cluster").cast("int"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  /** Rows read by every task across the thunk's jobs — the
    * layout-independent pruning measure (IncrementalDedupSpec's). */
  private def recordsReadDuring(f: => Unit): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val recs = new java.util.concurrent.atomic.AtomicLong
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          recs.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
        ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try { f; Thread.sleep(2000) }
    finally spark.sparkContext.removeSparkListener(l)
    recs.get()
  }

  test("ingest ≡ monolithic assignment against the frozen centroids, " +
      "across batches, idempotent under replay, durable across load") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annstore").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")

    val resident = vecs(1L to 300L)
    val batch1 = vecs(301L to 340L)
    val batch2 = vecs(341L to 390L)

    val cents = IncrementalAnn.trainCentroids(resident, k = 4)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    store.ingest(batch1, batchId = 1L)
    store.ingest(batch2, batchId = 2L)

    // the store equals one monolithic pass over all-data-so-far
    val expect = asgSet(
      IncrementalAnn.assign(vecs(1L to 390L), cents))
    assert(asgSet(store.load().get) === expect)

    // crash replay: re-ingesting batch 2 under the same id overwrites
    // its own partition — no duplicate rows, same content
    store.ingest(batch2, batchId = 2L)
    val after = store.load().get
    assert(after.count() === 390L)
    assert(asgSet(after) === expect)

    // the frozen centroids round-trip through the metadata exactly
    val loaded = store.centroids
    assert(loaded.map { case (c, a) => (c, a.toSeq) } ===
      cents.map { case (c, a) => (c, a.toSeq) })

    // batch lineage is preserved: bootstrap is batch 0, arrivals keep
    // their batch ids
    val byBatch = after.groupBy("batch_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch === Map(0L -> 300L, 1L -> 40L, 2L -> 50L))
  }

  test("a store without centroid metadata is refused actionably") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annmeta").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 50L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 2)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    // simulate a copy that lost the metadata
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/ann/_graft_meta.json"),
      false)
    val e = intercept[IllegalStateException] { store.centroids }
    assert(e.getMessage.contains("_graft_meta.json"))
  }

  test("layout: one file per populated (batch, cluster) cell, and a " +
      "one-cell probe scans only that cluster's files") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annprune").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 300L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 4)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    store.ingest(vecs(301L to 360L), batchId = 1L)

    val loaded = store.load().get
    val allFiles = loaded.inputFiles.length.toLong
    val cells = loaded.select("batch_id", "cluster").distinct().count()
    assert(allFiles === cells,
      s"store has $allFiles files for $cells populated cells — the " +
        "writer is not coalescing per partition cell")

    // probe one cell: the executed scan admits only that cluster's
    // directories (both batches', but never another cluster's)
    def scannedFiles(df: DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    val probed = loaded.select("cluster").distinct()
      .orderBy("cluster").head().getInt(0)
    val oneCell = scannedFiles(loaded.filter(col("cluster") === probed))
    assert(oneCell < allFiles && oneCell <= 2,
      s"cluster=$probed probe scanned $oneCell of $allFiles files — " +
        "partition pruning is not engaging on the index layout")
  }

  test("searchTopK: the store SERVES queries — results equal a driver " +
      "union of probed cells ranked by exact integer L2, arrivals are " +
      "immediately searchable, and the scan is partition-pruned") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annsearch").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 300L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 4)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    store.ingest(vecs(301L to 360L), batchId = 1L)

    val queryIds = Seq(5L, 100L, 302L) // 302 arrived a moment ago
    val got = store.searchTopK(vecs(queryIds), k = 3, nprobe = 2)
    val gotRows = got.collect().map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getLong(3))).toSet

    // independent driver-side reference: plain Scala arithmetic over
    // the raw vectors (no Spark, no kernel, no store)
    def qvOf(i: Long): Array[Long] = {
      val blob = (i % 3).toInt
      (0 until 8).map(d =>
        (blob * 40 - 60 + ((i * 31 + d * 17) % 13) - 6).toLong).toArray
    }
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cellOf = (1L to 360L).map { i =>
      i -> cents.map { case (c, ct) => (l2(qvOf(i), ct), c) }.min._2
    }.toMap
    val want = queryIds.flatMap { q =>
      val probed = cents.map { case (c, ct) => (l2(qvOf(q), ct), c) }
        .sorted.take(2).map(_._2).toSet
      (1L to 360L).filter(i => i != q && probed(cellOf(i)))
        .map(i => (l2(qvOf(q), qvOf(i)), i))
        .sorted.take(3).zipWithIndex
        .map { case ((d, i), rk) => (q, rk + 1, i, d) }
    }.toSet
    assert(gotRows === want)

    // the probe read admits only the probed cells' ROWS: a one-query,
    // one-probe search must read a cell, not the store (the listener
    // measure IncrementalDedupSpec uses — layout-independent ground
    // truth of what partition pruning admitted)
    val storeRows = store.load().get.count()
    val recs = recordsReadDuring {
      store.searchTopK(vecs(Seq(5L)), k = 3, nprobe = 1).collect()
      ()
    }
    assert(recs < storeRows,
      s"one-cell search read $recs records of a $storeRows-row store — " +
        "partition pruning is not engaging on the search path")
  }

  test("store-backed searchTopK over the FIXTURE corpus equals the " +
      "strict-gated sim15 query — the oracle covers the store path " +
      "transitively") {
    import graft.pipeline.{IncrementalAnn => IA}
    val d = SparkTestSession.sfDir
    val base = java.nio.file.Files
      .createTempDirectory("graft-annsim15").toString
    val store = new IA.AnnIndexStore(spark, s"$base/ann")
    val codes = IA.codeVectors(spark, d)
    // same training as sim15: full corpus, k=8 (the oracle's literal)
    val cents = IA.trainCentroids(codes)
    store.save(cents, IA.assign(codes, cents))
    val got = store.searchTopK(
        codes.filter(col("vec_id") < 10), k = 5, nprobe = 2)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = graft.pipeline.Similarity.sim15IvfL2TopK.run(spark, d)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
  }

  test("compact(): per-batch file accretion folds into one file per " +
      "cluster cell, content and centroids unchanged") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-anncompact").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 300L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 4)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    store.ingest(vecs(301L to 330L), batchId = 1L)
    store.ingest(vecs(331L to 360L), batchId = 2L)
    val before = store.load().get
    val filesBefore = before.inputFiles.length.toLong
    val want = asgSet(before)
    store.compact()
    val after = store.load().get
    val clusters = after.select("cluster").distinct().count()
    assert(after.inputFiles.length.toLong === clusters,
      s"${after.inputFiles.length} files for $clusters cells after " +
        s"compact (was $filesBefore)")
    assert(after.inputFiles.length < filesBefore)
    assert(asgSet(after) === want)
    assert(after.filter(col("batch_id") =!= 0L).count() === 0L)
    assert(store.centroids.map { case (c, a) => (c, a.toSeq) } ===
      cents.map { case (c, a) => (c, a.toSeq) })
    // and the index keeps ingesting after a rebase
    store.ingest(vecs(361L to 380L), batchId = 3L)
    assert(store.load().get.count() === 380L)
  }

  test("writer lease (shared StoreLease): a second concurrent writer " +
      "fails loudly; a usurped writer's ingest aborts before any " +
      "store write") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annlease").toString
    val st1 = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val st2 = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 60L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 2)
    st1.acquireLease()
    st1.save(cents, IncrementalAnn.assign(resident, cents))
    val e = intercept[IllegalStateException](st2.acquireLease())
    assert(e.getMessage.contains("leased"), e.getMessage)
    // simulate a TTL lapse by AGING the holder's heartbeat in the lock
    // itself (the liveness source of truth): since round 15 a breaker's
    // patience is max(its ttl, the lock's declared ttl), so a
    // zero-patience acquire can no longer break a live long-TTL holder
    // — the round-14 advice hole this spec used to exploit
    val lockP = new org.apache.hadoop.fs.Path(s"$base/ann.lock")
    val lfs = lockP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holderId = {
      val in = lfs.open(lockP)
      (try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()).trim.split("\\s+")(0)
    }
    val aged = System.currentTimeMillis() -
      2 * graft.tables.StoreLease.DefaultTtlMs
    val out = lfs.create(lockP, true)
    out.writeBytes(
      s"$holderId $aged ${graft.tables.StoreLease.DefaultTtlMs}\n")
    out.close()
    // st2 now sees a genuinely stale lease and takes over
    st2.acquireLease()
    // the usurped writer must abort before touching the store
    val lost = intercept[IllegalStateException](
      st1.ingest(vecs(61L to 70L), batchId = 1L))
    assert(lost.getMessage.contains("lease lost"), lost.getMessage)
    // the usurper ingests fine, and release hands the store back
    st2.ingest(vecs(61L to 70L), batchId = 1L)
    st2.releaseLease()
    assert(st1.load().get.count() === 70L)
  }

  test("searchTopK as the FIRST call on an interrupted-swap store " +
      "serves the PROMOTED generation (round-12 verdict #3), and its " +
      "probe join broadcasts the probe side (#4)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annsearchrec").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // generation A (60 vectors) live at the store path
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val cents = IncrementalAnn.trainCentroids(vecs(1L to 60L), k = 2)
    store.save(cents, IncrementalAnn.assign(vecs(1L to 60L), cents))
    // generation B (90 vectors, same centroids) durable as a COMPLETE
    // tmp generation — the crash point is "tmp written, swap not run"
    val scratch = new IncrementalAnn.AnnIndexStore(spark, s"$base/next")
    scratch.save(cents, IncrementalAnn.assign(vecs(1L to 90L), cents))
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/next"),
      new org.apache.hadoop.fs.Path(s"$base/ann.tmp"))
    // a READER-ONLY process whose first call is a search: must recover
    // (promote B) and answer from it, not serve stale A
    val reader = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val got = reader.searchTopK(vecs(Seq(61L)), k = 3, nprobe = 2)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "probe-side join must broadcast explicitly")
    assert(!plan.contains("SortMergeJoin"),
      "store must never sort-merge against the probe frame")
    val rows = got.collect()
    assert(rows.nonEmpty)
    // vector 61 exists only in generation B; a search FOR it excluding
    // itself proves B is live (A would have no row 61 to exclude and
    // different membership); its nearest neighbors under B include
    // ids > 60 iff the promoted corpus is being served
    assert(reader.load().get.count() === 90L)
    val fresh = new IncrementalAnn.AnnIndexStore(spark, s"$base/ref")
    fresh.save(cents, IncrementalAnn.assign(vecs(1L to 90L), cents))
    val want = fresh.searchTopK(vecs(Seq(61L)), k = 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getLong(3))).toSet === want)
  }

  test("a reader does NOT complete a swap while a foreign LIVE lease " +
      "exists (fail-safe: serves the old generation); a stale lease " +
      "unblocks it, and maintenance reaps stranded lease tombstones") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annlivegate").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val cents = IncrementalAnn.trainCentroids(vecs(1L to 60L), k = 2)
    store.save(cents, IncrementalAnn.assign(vecs(1L to 60L), cents))
    val scratch = new IncrementalAnn.AnnIndexStore(spark, s"$base/next")
    scratch.save(cents, IncrementalAnn.assign(vecs(1L to 90L), cents))
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/next"),
      new org.apache.hadoop.fs.Path(s"$base/ann.tmp"))
    def writeLock(ts: Long): Unit = {
      val out = fs.create(
        new org.apache.hadoop.fs.Path(s"$base/ann.lock"), true)
      out.writeBytes(s"foreign-writer $ts\n"); out.close()
    }
    // LIVE foreign lease: the reader must not race the (live) writer's
    // swap — it serves the old generation untouched
    writeLock(System.currentTimeMillis())
    val reader = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    assert(reader.load().get.count() === 60L)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$base/ann.tmp")),
      "tmp generation must survive a gated (skipped) recover")
    // STALE foreign lease (dead writer): recovery proceeds
    writeLock(System.currentTimeMillis() -
      graft.tables.StoreLease.DefaultTtlMs - 1000L)
    // a stranded stale-break tombstone next to the store is reaped by
    // the same maintenance pass (round-12 verdict #8 / advice)
    val tomb = new org.apache.hadoop.fs.Path(
      s"$base/ann.lock.broken.deadbeef")
    fs.create(tomb, true).close()
    assert(reader.load().get.count() === 90L)
    assert(!fs.exists(tomb), "maintenance must sweep lease tombstones")
  }

  test("mid-swap READ availability: p missing + pOld present under a " +
      "LIVE foreign lease serves the archived generation read-only " +
      "(load AND searchTopK), mutating nothing; a stale lease lets " +
      "recover() promote it back") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annmidswap").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val cents = IncrementalAnn.trainCentroids(vecs(1L to 60L), k = 2)
    store.save(cents, IncrementalAnn.assign(vecs(1L to 60L), cents))
    // a writer crashed between its two swap renames: live generation
    // archived to .old, the new one never landed — and its lock is
    // still fresh (not yet TTL-stale)
    assert(fs.rename(p(s"$base/ann"), p(s"$base/ann.old")))
    def writeLock(ts: Long): Unit = {
      val out = fs.create(p(s"$base/ann.lock"), true)
      out.writeBytes(s"foreign-writer $ts\n"); out.close()
    }
    writeLock(System.currentTimeMillis())
    // an unleased reader is NOT blind for the lease TTL (round-13
    // advice): it serves the archived generation read-only
    val reader = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    assert(reader.load().get.count() === 60L)
    assert(reader.searchTopK(vecs(Seq(1L)), k = 3).count() === 3L)
    // ...and mutated NOTHING: p still absent, the archive untouched
    assert(!fs.exists(p(s"$base/ann")) && fs.exists(p(s"$base/ann.old")))
    // the lock goes stale (writer dead by the TTL contract): the same
    // reader's next load completes the recovery and serves from p
    writeLock(System.currentTimeMillis() -
      graft.tables.StoreLease.DefaultTtlMs - 1000L)
    assert(reader.load().get.count() === 60L)
    assert(fs.exists(p(s"$base/ann")) && !fs.exists(p(s"$base/ann.old")))
  }

  test("an unleased write is refused while ANOTHER writer's lease is " +
      "live (the lease is opt-in, but it cannot be ignored)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annunleased").toString
    val st1 = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val st2 = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val cents = IncrementalAnn.trainCentroids(vecs(1L to 60L), k = 2)
    st1.acquireLease()
    try {
      st1.save(cents, IncrementalAnn.assign(vecs(1L to 60L), cents))
      val e = intercept[IllegalStateException](
        st2.ingest(vecs(61L to 70L), batchId = 1L))
      assert(e.getMessage.contains("leased to writer"), e.getMessage)
    } finally st1.releaseLease()
    // lease released: the unleased write is allowed again (opt-in)
    st2.ingest(vecs(61L to 70L), batchId = 1L)
    assert(st2.load().get.count() === 70L)
  }

  test("maintain(): the monitor→action loop — drifted arrivals trigger " +
      "a REBUILD (new centroid generation, searchTopK serves it), " +
      "same-distribution arrivals are a no-op, batch accretion " +
      "triggers REORGANIZE (round-12 verdict directive #4)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annmaintain").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    // a far, tight blob the bootstrap distribution never visits
    def drifted(ids: Seq[Long]): DataFrame =
      ids.map { i =>
        (i, (0 until 8).map(d => (100 + ((i + d) % 5)).toLong).toSeq)
      }.toDF("vec_id", "qv")

    val resident = vecs(1L to 300L)
    val cents0 = IncrementalAnn.trainCentroids(resident, k = 4)
    store.save(cents0, IncrementalAnn.assign(resident, cents0))

    // 1) same-distribution arrivals: drift stays under threshold — the
    // index is NOT rewritten (the IndexOptimize below-both-thresholds
    // arm)
    store.ingest(vecs(301L to 360L), batchId = 1L)
    val r0 = store.maintain(rebuildDrift = 0.30, reorganizeBatches = 64L)
    assert(r0.action === "none", r0.toString)
    assert(r0.maxDrift < 0.30 && r0.arrivedBatches === 1L)
    def cseq(cs: Seq[(Int, Array[Long])]) =
      cs.map { case (c, a) => (c, a.toSeq) }
    assert(cseq(store.centroids) === cseq(cents0),
      "a no-op pass must not retrain")

    // 2) drifted arrivals crowd one stale cell: drift crosses the
    // threshold and maintain REBUILDS — fresh centroids, batches
    // folded to the new bootstrap generation, nothing lost
    store.ingest(drifted(361L to 420L), batchId = 2L)
    val r1 = store.maintain(rebuildDrift = 0.30, reorganizeBatches = 64L)
    assert(r1.action === "rebuild", r1.toString)
    assert(r1.maxDrift > 0.30 && r1.arrivedBatches === 2L)
    val centsNew = store.centroids
    assert(cseq(centsNew) !== cseq(cents0),
      "rebuild must retrain the centroids")
    val all = store.load().get
    assert(all.count() === 420L)
    assert(all.filter(col("batch_id") > 0L).count() === 0L,
      "rebuild folds every batch into the new bootstrap generation")
    // the re-tessellated index now has a cell FOR the drifted region:
    // a search there is served from the new generation and finds the
    // drifted arrivals as nearest neighbors
    val near = store.searchTopK(drifted(Seq(9999L)), k = 3, nprobe = 1)
      .collect().map(_.getLong(2)).toSet
    assert(near.nonEmpty && near.forall(id => id >= 361L && id <= 420L),
      s"drifted-region search must hit drifted arrivals, got $near")

    // 3) accretion with no drift: many committed batches trip the
    // REORGANIZE arm — compact() folds them, centroids unchanged
    store.ingest(vecs(421L to 440L), batchId = 10L)
    store.ingest(vecs(441L to 460L), batchId = 11L)
    store.ingest(vecs(461L to 480L), batchId = 12L)
    val r2 = store.maintain(rebuildDrift = 0.99, reorganizeBatches = 2L)
    assert(r2.action === "reorganize", r2.toString)
    assert(r2.arrivedBatches === 3L)
    assert(cseq(store.centroids) === cseq(centsNew),
      "reorganize must NOT retrain (compact keeps the centroids)")
    assert(store.load().get.filter(col("batch_id") > 0L).count() === 0L)
    assert(store.load().get.count() === 480L)
  }

  test("maintain() quiet-night gate: a second maintain with nothing " +
      "ingested since matches the decision watermark and runs ZERO " +
      "Spark jobs (round-14 verdict #1 — no corpus-sized occupancy " +
      "scan for an answer that cannot have moved); an ingest " +
      "invalidates the watermark and the next maintain re-measures; " +
      "a rebuild re-arms the gate against the post-swap state") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annquiet").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 200L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 4)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    store.ingest(vecs(201L to 240L), batchId = 1L)

    // first maintain: the real measured pass (writes the watermark)
    val r1 = store.maintain()
    assert(r1.action === "none" && r1.unchangedSinceBatch.isEmpty)
    assert(r1.arrivedBatches === 1L)

    // second maintain, nothing ingested since: the watermark matches —
    // same decision, same reported metrics, ZERO Spark jobs
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val r2 =
      try {
        val r = store.maintain()
        Thread.sleep(500) // listener bus is async; let events drain
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(r2.action === "none")
    assert(r2.unchangedSinceBatch === Some(1L))
    assert(r2.maxDrift === r1.maxDrift &&
      r2.arrivedBatches === r1.arrivedBatches)
    assert(jobs.get() === 0,
      s"quiet maintain ran ${jobs.get()} Spark job(s); the watermark " +
        "fast path must not touch the store")

    // the gate honors the CALLER's thresholds (round-15 review): with
    // the same quiet store, a tightened reorganizeBatches must NOT
    // short-circuit to the watermarked "none" — the stored batches=1
    // now exceeds the threshold, so the full path runs and reorganizes
    val rTight = store.maintain(reorganizeBatches = 0L)
    assert(rTight.action === "reorganize", rTight.toString)
    assert(rTight.unchangedSinceBatch.isEmpty)
    assert(store.load().get.count() === 240L)

    // an arrival invalidates the watermark: the next maintain is a
    // REAL measured pass again (max batch id moved)
    store.ingest(vecs(241L to 260L), batchId = 2L)
    val r3 = store.maintain()
    assert(r3.unchangedSinceBatch.isEmpty)
    assert(r3.arrivedBatches === 1L)

    // a rebuild swaps the generation (old watermark dies with the old
    // root) and re-arms the gate against the POST-swap state: the
    // quiet night after a rebuild is also zero-scan
    def drifted(ids: Seq[Long]): DataFrame =
      ids.map { i =>
        (i, (0 until 8).map(d => (100 + ((i + d) % 5)).toLong).toSeq)
      }.toDF("vec_id", "qv")
    store.ingest(drifted(261L to 340L), batchId = 3L)
    val r4 = store.maintain(rebuildDrift = 0.10)
    assert(r4.action === "rebuild", r4.toString)
    val r5 = store.maintain(rebuildDrift = 0.10)
    assert(r5.action === "none" && r5.unchangedSinceBatch === Some(0L),
      r5.toString)
  }

  test("maintain() watermark cannot serve a stale skip over an IN-PLACE " +
      "rewrite of an existing batch partition (round-15 advice): a " +
      "reset checkpoint replaying batch id 1 with different content " +
      "leaves max-batch-id and meta stats unchanged, so the ingest " +
      "path itself must re-arm the gate") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annrearm").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 200L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 4)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    store.ingest(vecs(201L to 240L), batchId = 1L)
    val r1 = store.maintain()
    assert(r1.action === "none" && r1.unchangedSinceBatch.isEmpty)
    // the quiet gate is armed; now rewrite batch 1 IN PLACE with a
    // drifted payload (a deleted/reset stream checkpoint restarting
    // batch ids against the existing store) — the probe's fingerprint
    // (max batch id = 1, same meta) cannot distinguish this from quiet
    def drifted(ids: Seq[Long]): DataFrame =
      ids.map { i =>
        (i, (0 until 8).map(d => (100 + ((i + d) % 5)).toLong).toSeq)
      }.toDF("vec_id", "qv")
    store.ingest(drifted(201L to 380L), batchId = 1L)
    val r2 = store.maintain(rebuildDrift = 0.10)
    assert(r2.unchangedSinceBatch.isEmpty,
      s"stale quiet skip served over a rewritten batch partition: $r2")
    // and the re-measure sees the REWRITTEN occupancy: the heavily
    // drifted replacement payload is far past the rebuild threshold
    assert(r2.action === "rebuild", r2.toString)
  }

  test("interrupted bootstrap swap completes on recover: a complete " +
      "tmp generation (with metadata) is promoted") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-annrecover").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    val resident = vecs(1L to 60L)
    val cents = IncrementalAnn.trainCentroids(resident, k = 2)
    store.save(cents, IncrementalAnn.assign(resident, cents))
    // simulate a crash between "tmp generation durable" and "swap":
    // move the live store back to .tmp as a complete next generation
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$base/ann"),
      new org.apache.hadoop.fs.Path(s"$base/ann.tmp"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/ann")))
    // any entry point (load / centroids / ingest) must finish the swap
    val after = store.load()
    assert(after.isDefined && after.get.count() === 60L)
    assert(store.centroids.nonEmpty)
  }
}
