package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.executor.CommandLog
import graft.pipeline.{Dedup, Forget, IncrementalAnn, IncrementalDedup}

/** Takedown/retention propagation (round-15 verdict #1): forgetting a
  * doc/vector set must leave each persisted store EQUAL to a
  * from-scratch build over (corpus − forgotten), rewrite only the
  * touched partition cells, be idempotent, and purge the emitted pair
  * partitions — with every commit audited through the command log. */
class ForgetSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Synthetic corpus with exact-duplicate classes (i % 7 shares one
    * text → one signature class), so representative repair is
    * non-trivial: forgetting a class min promotes a new rep. Class
    * texts share NO bigram (every token carries the class id), so
    * signatures can never collide across classes. */
  private def docs(ids: Seq[Long]): DataFrame =
    ids.map { i =>
      val c = i % 7
      (i, (0 to 9).map(j => s"tok${c}x$j").mkString(" "))
    }.toDF("doc_id", "text")

  private def sigCols = Seq("sig_key", "doc_id", "m0", "m1", "m2", "m3",
    "m4", "m5", "m6", "m7", "rep")

  /** (path → (mtime, len)) of every data file under a store root. */
  private def leafFiles(root: String): Map[String, (Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.Map.empty[String, (Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          buf += st.getPath.toUri.getPath ->
            ((st.getModificationTime, st.getLen))
      }
      buf.toMap
    }
  }

  test("SigStore.forget: post-forget store equals a from-scratch build " +
      "over (corpus − forgotten) — rows gone, representatives repaired " +
      "— rewriting ONLY the touched (pb0, pb1) cells; re-forget is a " +
      "no-op that writes nothing") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-sig").toString
    val store = new IncrementalDedup.SigStore(spark, s"$base/sigs")
    val all = (1L to 80L)
    store.withLease {
      store.save(IncrementalDedup.initialStore(
        Dedup.minhashSig(docs(all))), fanOut = 8)
    }
    // takedown set: the global class-min (1 — rep of class 1), one
    // plain member (2), an ENTIRE class (i%7==3), and an id not in the
    // store at all (999 — must not count or fail)
    val wholeClass = all.filter(_ % 7 == 3)
    val forgotten = (Seq(1L, 2L, 999L) ++ wholeClass).distinct
    val idsDf = forgotten.toDF("doc_id")
    val before = leafFiles(s"$base/sigs")
    // the cells the forget is ALLOWED to touch: the forgotten docs'
    // signature cells (classes live wholly in their signature's cell),
    // read off the persisted partition values before the forget
    val touchedRect = store.load().get
      .filter(col("doc_id").isInCollection(forgotten))
      .select("pb0", "pb1").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val pbs0 = touchedRect.map(_._1).toSet
    val pbs1 = touchedRect.map(_._2).toSet

    val r = store.withLease(store.forget(idsDf))
    assert(r.rowsForgotten === (2 + wholeClass.size).toLong, r.toString)
    assert(r.cellsTouched === touchedRect.length, r.toString)

    // set-equality with the from-scratch build over the survivors
    val survivors = all.filterNot(forgotten.contains)
    val want = IncrementalDedup.initialStore(
      Dedup.minhashSig(docs(survivors))).select(sigCols.map(col): _*)
    val got = store.load().get.select(sigCols.map(col): _*)
    assert(want.exceptAll(got).count() === 0L)
    assert(got.exceptAll(want).count() === 0L)
    // the repaired rep is visible: class 1 lost doc 1, so its
    // surviving min (8) is every member's rep now
    assert(got.filter(col("doc_id") === 8L).select("rep")
      .head().getLong(0) === 8L)

    // work ∝ touched cells: every file OUTSIDE the touched rectangle
    // is byte-for-byte the file it was (same path, mtime, length)
    val after = leafFiles(s"$base/sigs")
    def cellOf(p: String): (Int, Int) = {
      val re = """pb0=(\d+)/pb1=(\d+)""".r
      re.findFirstMatchIn(p).map(m =>
        (m.group(1).toInt, m.group(2).toInt)).get
    }
    val untouchedBefore = before.filter { case (p, _) =>
      val (a, b) = cellOf(p); !(pbs0.contains(a) && pbs1.contains(b))
    }
    assert(untouchedBefore.nonEmpty,
      "fixture degenerate: no untouched cells to pin")
    untouchedBefore.foreach { case (p, stat) =>
      assert(after.get(p).contains(stat),
        s"untouched cell file rewritten by forget: $p")
    }

    // idempotent re-forget: nothing matched, nothing written
    val r2 = store.withLease(store.forget(idsDf))
    assert(r2.rowsForgotten === 0L && r2.cellsTouched === 0)
    assert(leafFiles(s"$base/sigs") === after)
  }

  test("SigStore.forget can EMPTY the store: forgetting every doc " +
      "leaves no partition rows, and the emptied store reads as " +
      "absent (bootstrap-ready), not as corrupt") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-empty").toString
    val store = new IncrementalDedup.SigStore(spark, s"$base/sigs")
    store.withLease {
      store.save(IncrementalDedup.initialStore(
        Dedup.minhashSig(docs(1L to 30L))), fanOut = 4)
      val r = store.forget((1L to 30L).toDF("doc_id"))
      assert(r.rowsForgotten === 30L)
    }
    // every data file gone; the store reads as "no generation"
    assert(leafFiles(s"$base/sigs").isEmpty)
    assert(store.load().isEmpty)
  }

  test("AnnIndexStore.forget: vectors stop being stored AND searchable, " +
      "only touched (batch_id, cluster) cells rewrite, the maintain " +
      "watermark re-arms, and re-forget is a no-op") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-ann").toString
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    def vecs(ids: Seq[Long]): DataFrame =
      ids.map { i =>
        val blob = (i % 3).toInt
        (i, (0 until 8).map(d =>
          (blob * 40 - 60 + ((i * 31 + d * 17) % 13) - 6).toLong).toSeq)
      }.toDF("vec_id", "qv")
    store.withLease {
      val resident = vecs(1L to 200L)
      val cents = IncrementalAnn.trainCentroids(resident, k = 4)
      store.save(cents, IncrementalAnn.assign(resident, cents))
      store.ingest(vecs(201L to 240L), batchId = 1L)
      store.ingest(vecs(241L to 280L), batchId = 2L)
    }
    // arm the quiet-night watermark, then forget across all three tiers
    assert(store.maintain().action === "none")
    val forgotten = Seq(5L, 8L, 201L, 250L, 9999L)
    val before = leafFiles(s"$base/ann")
    val hitCells = store.load().get
      .filter(col("vec_id").isInCollection(forgotten))
      .select("batch_id", "cluster").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val r = store.withLease(store.forget(forgotten.toDF("vec_id")))
    assert(r.rowsForgotten === 4L, r.toString)
    assert(r.cellsTouched === hitCells.length)

    val left = store.load().get
    assert(left.count() === 280L - 4L)
    assert(left.filter(col("vec_id").isInCollection(forgotten))
      .count() === 0L)
    // not searchable: exhaustive top-k over every probe cell never
    // returns a forgotten id
    val near = store.searchTopK(vecs(Seq(5L)), k = 300, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(near.nonEmpty && forgotten.forall(id => !near.contains(id)))

    // untouched cells untouched
    val after = leafFiles(s"$base/ann")
    val bIds = hitCells.map(_._1).toSet
    val cls = hitCells.map(_._2).toSet
    val re = """batch_id=(\d+)/cluster=(\d+)""".r
    before.foreach { case (p, stat) =>
      val m = re.findFirstMatchIn(p).get
      val inRect = bIds.contains(m.group(1).toLong) &&
        cls.contains(m.group(2).toInt)
      if (!inRect) assert(after.get(p).contains(stat),
        s"untouched cell file rewritten by forget: $p")
    }

    // the watermark is gone: the next maintain is a MEASURED pass over
    // the post-forget store, never a stale quiet skip
    val m2 = store.maintain()
    assert(m2.unchangedSinceBatch.isEmpty, m2.toString)

    // idempotent
    val r2 = store.withLease(store.forget(forgotten.toDF("vec_id")))
    assert(r2.rowsForgotten === 0L && r2.cellsTouched === 0)
  }

  test("scrubPairs: pairs with a forgotten endpoint vanish from exactly " +
      "the touched batch_id directories; untouched directories keep " +
      "their files; a fully-forgotten directory empties; idempotent") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-pairs").toString
    val out = s"$base/pairs"
    def writeBatch(id: Long, pairs: Seq[(Long, Long)]): Unit =
      pairs.toDF("doc_a", "doc_b").coalesce(1)
        .write.mode("overwrite").parquet(s"$out/batch_id=$id")
    writeBatch(0L, Seq((1L, 2L), (3L, 4L), (5L, 6L)))
    writeBatch(1L, Seq((2L, 7L), (8L, 9L)))
    writeBatch(2L, Seq((10L, 11L)))
    val before = leafFiles(out)

    val r = Forget.scrubPairs(spark, out, Seq(2L, 6L).toDF("doc_id"))
    assert(r.rowsForgotten === 3L, r.toString) // (1,2) (5,6) (2,7)
    assert(r.cellsTouched === 2)
    val left = spark.read.parquet(out)
      .select(col("batch_id").cast("long"), col("doc_a"), col("doc_b"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(left === Set((0L, 3L, 4L), (1L, 8L, 9L), (2L, 10L, 11L)))
    // dir 2 untouched byte-for-byte
    val after = leafFiles(out)
    before.filter(_._1.contains("batch_id=2")).foreach { case (p, st) =>
      assert(after.get(p).contains(st))
    }
    // idempotent
    val r2 = Forget.scrubPairs(spark, out, Seq(2L, 6L).toDF("doc_id"))
    assert(r2.rowsForgotten === 0L && r2.cellsTouched === 0)

    // a directory whose every pair is forgotten EMPTIES but stays a
    // readable member of the sink
    val r3 = Forget.scrubPairs(spark, out, Seq(10L).toDF("doc_id"))
    assert(r3.rowsForgotten === 1L && r3.cellsTouched === 1)
    assert(spark.read.parquet(out)
      .filter(col("batch_id") === 2L).count() === 0L)
    assert(spark.read.parquet(out).count() === 2L)
  }

  test("scrubPairs is LAYOUT-PRESERVING: a multi-file batch directory " +
      "keeps its data-file multiplicity through the scrub (round-16 " +
      "verdict #2 — no coalesce(1) serialization of a skewed batch)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-layout").toString
    val out = s"$base/pairs"
    // a "skewed" batch: 60 pairs across 3 files, plus a 1-file batch
    (1L to 60L).map(i => (i, i + 1000L)).toDF("doc_a", "doc_b")
      .repartition(3).write.parquet(s"$out/batch_id=0")
    Seq((200L, 201L)).toDF("doc_a", "doc_b").coalesce(1)
      .write.parquet(s"$out/batch_id=1")
    def dataFiles(p: String): Int = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(hp).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
    }
    assert(dataFiles(s"$out/batch_id=0") === 3, "fixture degenerate")
    val r = Forget.scrubPairs(spark, out, Seq(5L, 6L).toDF("doc_id"))
    assert(r.rowsForgotten === 2L && r.cellsTouched === 1)
    // multiplicity survives: the rewritten directory still holds 3
    // data files (one per pre-scrub file), and the rows are right
    assert(dataFiles(s"$out/batch_id=0") === 3)
    assert(dataFiles(s"$out/batch_id=1") === 1)
    assert(spark.read.parquet(out).count() === 59L)
    assert(spark.read.parquet(out)
      .filter(col("doc_a").isin(5L, 6L)).count() === 0L)

    // ...but the multiplicity is CAPPED by the surviving fraction
    // (round-17 advice): a scrub that removes nearly all of the
    // 3-file dir must not spread the couple of survivors across 3
    // near-empty files
    val r2 = Forget.scrubPairs(spark, out,
      (1L to 57L).toDF("doc_a").select(col("doc_a").as("doc_id")))
    assert(r2.rowsForgotten === 55L, r2.toString) // 5,6 already gone
    assert(spark.read.parquet(s"$out/batch_id=0").count() === 3L)
    assert(dataFiles(s"$out/batch_id=0") === 1,
      "near-emptied dir should collapse its file count")
  }

  test("recoverPairSink sweeps scrub-crash residue from ANY writer " +
      "entry point: a hidden .forget-old batch dir with no live twin " +
      "is restored, staging garbage is dropped (round-16 advice — the " +
      "dedup ingest stream runs this at drain start)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-sweep").toString
    val out = s"$base/pairs"
    Seq((1L, 2L)).toDF("doc_a", "doc_b").coalesce(1)
      .write.parquet(s"$out/batch_id=0")
    Seq((3L, 4L)).toDF("doc_a", "doc_b").coalesce(1)
      .write.parquet(s"$out/batch_id=5")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window: batch 5 archived aside, replacement never renamed
    // in — the directory is hidden from every reader
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$out/batch_id=5"),
      new org.apache.hadoop.fs.Path(s"$out/.forget-old-5")))
    Seq((9L, 9L)).toDF("doc_a", "doc_b").coalesce(1)
      .write.parquet(s"$out/.forget-tmp-7")
    assert(spark.read.parquet(out).count() === 1L) // batch 5 invisible
    Forget.recoverPairSink(spark, out)
    // restored and readable again; staging garbage gone
    assert(spark.read.parquet(out).count() === 2L)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/.forget-tmp-7")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/.forget-old-5")))
  }

  test("post-commit/pre-cleanup forget crash: a leftover .bakparts " +
      "archive resurrects a fully-EMPTIED cell on recover() (dest " +
      "absent → restored) but never clobbers a REWRITTEN cell (dest " +
      "present → archive dropped); the retry re-forgets and converges " +
      "(round-16 advice)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-postcommit").toString
    val store = new IncrementalDedup.SigStore(spark, s"$base/sigs")
    store.withLease {
      store.save(IncrementalDedup.initialStore(
        Dedup.minhashSig(docs(1L to 80L))), fanOut = 8)
    }
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    val pre = store.load().get
      .select(col("doc_id"), col("pb0"), col("pb1")).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2))))
    val cellOf = pre.toMap
    // victim A: the WHOLE cell containing doc 3 (emptied by the forget)
    val cellA = cellOf(3L)
    val takedownA = pre.filter(_._2 == cellA).map(_._1).toSeq
    // victim B: one doc from a DIFFERENT, surviving cell (rewritten)
    val docB = pre.map(_._1).sorted
      .find(d => cellOf(d) != cellA &&
        pre.count(_._2 == cellOf(d)) > 1).get
    val cellB = cellOf(docB)
    def cellPath(root: String, c: (Int, Int)) =
      new org.apache.hadoop.fs.Path(s"$root/pb0=${c._1}/pb1=${c._2}")
    // keep pre-forget copies of both cells (what the crash's archive
    // would hold)
    val keepA = new org.apache.hadoop.fs.Path(s"$base/keepA")
    val keepB = new org.apache.hadoop.fs.Path(s"$base/keepB")
    org.apache.hadoop.fs.FileUtil.copy(fs, cellPath(s"$base/sigs", cellA),
      fs, keepA, false, conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, cellPath(s"$base/sigs", cellB),
      fs, keepB, false, conf)

    val takedown = (takedownA :+ docB).distinct
    val r = store.withLease(store.forget(takedown.toDF("doc_id")))
    assert(r.rowsForgotten === takedown.size.toLong)
    assert(!fs.exists(cellPath(s"$base/sigs", cellA)), "cell A not emptied")
    assert(fs.exists(cellPath(s"$base/sigs", cellB)), "cell B should survive")
    val postForget = store.load().get.select(sigCols.map(col): _*)
      .collect().map(_.toString).sorted

    // simulate the crash window: the dynamic overwrite COMMITTED but
    // the .bakparts cleanup never ran — both cells' pre-forget content
    // sits in the archive
    val bak = new org.apache.hadoop.fs.Path(s"$base/sigs.bakparts")
    org.apache.hadoop.fs.FileUtil.copy(fs, keepA,
      fs, cellPath(bak.toString, cellA), false, conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, keepB,
      fs, cellPath(bak.toString, cellB), false, conf)

    store.withLease {
      // recover() (via load): emptied cell A resurrects — the
      // documented transient — while rewritten cell B is NOT clobbered
      // with pre-forget rows (dest present → archive dropped)
      val resurrected = store.load().get
      assert(resurrected.filter(col("doc_id")
        .isInCollection(takedownA)).count() === takedownA.size.toLong,
        "emptied cell should transiently resurrect from the archive")
      assert(resurrected.filter(col("doc_id") === docB).count() === 0L,
        "rewritten cell must keep its post-forget content")
      assert(!fs.exists(bak), "archive should be consumed by recover()")
      // the RETRY converges: re-forget removes exactly the resurrected
      // rows and the store equals the post-forget state again
      val r2 = store.forget(takedown.toDF("doc_id"))
      assert(r2.rowsForgotten === takedownA.size.toLong, r2.toString)
    }
    val after = store.load().get.select(sigCols.map(col): _*)
      .collect().map(_.toString).sorted
    assert(after.toSeq === postForget.toSeq,
      "retry did not converge to the post-forget store")
  }

  test("Forget.run: one composed pass over both stores + the pair sink, " +
      "one FORGET audit row per target through the command log") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-run").toString
    val sigStore = new IncrementalDedup.SigStore(spark, s"$base/sigs")
    sigStore.withLease {
      sigStore.save(IncrementalDedup.initialStore(
        Dedup.minhashSig(docs(1L to 40L))))
    }
    val annStore = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    annStore.withLease {
      val vs = (1L to 60L).map(i =>
        (i, (0 until 8).map(d => ((i % 5) * 20 + d).toLong).toSeq))
        .toDF("vec_id", "qv")
      val cents = IncrementalAnn.trainCentroids(vs, k = 2)
      annStore.save(cents, IncrementalAnn.assign(vs, cents))
    }
    Seq((1L, 2L), (3L, 7L)).toDF("doc_a", "doc_b").coalesce(1)
      .write.parquet(s"$base/pairs/batch_id=0")
    val log = new CommandLog(spark, None)
    // one ids frame carrying BOTH columns (the CLI's parquet shape)
    val ids = Seq((7L, 3L), (12L, 60L)).toDF("doc_id", "vec_id")
    val outcome = Forget.run(spark,
      docIds = Some(ids), vecIds = Some(ids),
      sigStorePath = s"$base/sigs", annStorePath = s"$base/ann",
      pairsDir = s"$base/pairs", log, graft.model.SystemClock)
    assert(outcome.sig.rowsForgotten === 2L)
    assert(outcome.ann.rowsForgotten === 2L)
    assert(outcome.pairs.rowsForgotten === 1L) // (3,7)
    val rows = log.entries.filter(_.command_type == "FORGET")
    assert(rows.size === 3, rows.map(_.object_name).toString)
    assert(rows.forall(_.error_number.isEmpty))
    assert(sigStore.load().get
      .filter(col("doc_id").isin(7L, 12L)).count() === 0L)
    assert(annStore.load().get
      .filter(col("vec_id").isin(3L, 60L)).count() === 0L)
  }

  test("Forget.hard (--forget --hard, round-16 verdict residual #2): " +
      "the chained FORCED retrain re-tessellates the ANN centroids so " +
      "they equal a from-scratch train over (corpus − forgotten) — no " +
      "waiting for drift to cross 0.10 — with a FORGET-HARD audit row; " +
      "a doc-only request skips the retrain (no vector-derived residue)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-hard").toString
    def vecs(ids: Seq[Long]): DataFrame =
      ids.map { i =>
        val blob = (i % 3).toInt
        (i, (0 until 8).map(d =>
          (blob * 40 - 60 + ((i * 31 + d * 17) % 13) - 6).toLong).toSeq)
      }.toDF("vec_id", "qv")
    val store = new IncrementalAnn.AnnIndexStore(spark, s"$base/ann")
    store.withLease {
      val resident = vecs(1L to 200L)
      val cents = IncrementalAnn.trainCentroids(resident, k = 4)
      store.save(cents, IncrementalAnn.assign(resident, cents))
      store.ingest(vecs(201L to 240L), batchId = 1L)
    }
    val preCents = store.centroids.sortBy(_._1)
    val log = new CommandLog(spark, None)
    val forgotten = (1L to 40L) ++ (201L to 210L)
    val (out, action) = Forget.hard(spark,
      docIds = None, vecIds = Some(forgotten.toDF("vec_id")),
      sigStorePath = s"$base/sigs", annStorePath = s"$base/ann",
      pairsDir = s"$base/pairs", log, graft.model.SystemClock)
    assert(out.ann.rowsForgotten === 50L)
    assert(action === "rebuild")
    // the centroid geometry equals a FROM-SCRATCH train over the
    // surviving corpus (training is deterministic on the vector set:
    // k-smallest-id init, integer Lloyd updates) — and actually moved
    val survivors = ((41L to 200L) ++ (211L to 240L)).toSeq
    val want = IncrementalAnn.trainCentroids(vecs(survivors), k = 4)
      .sortBy(_._1)
    val got = store.centroids.sortBy(_._1)
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case ((c, g), (_, w)) =>
      assert(g.toSeq === w.toSeq, s"cluster $c centroid differs")
    }
    assert(preCents.map(_._2.toSeq) !== got.map(_._2.toSeq),
      "fixture degenerate: retrain produced identical centroids")
    // the retrained index still serves and holds no forgotten vector
    assert(store.load().get.count() === 190L)
    assert(store.searchTopK(vecs(Seq(41L)), k = 200, nprobe = 4)
      .select("neighbor_id").collect().map(_.getLong(0))
      .forall(id => !forgotten.contains(id)))
    // audited: the ordinary FORGET row AND the FORGET-HARD retrain row
    val rows = log.entries.filter(_.command_type == "FORGET")
    assert(rows.exists(_.command.startsWith("FORGET-HARD")),
      rows.map(_.command).mkString("\n"))
    // a DOC-ONLY hard request: the centroid geometry never derived
    // from doc-tier content — the retrain is skipped, stated so
    val (_, a2) = Forget.hard(spark,
      docIds = Some(Seq(1L).toDF("doc_id")), vecIds = None,
      sigStorePath = s"$base/sigs", annStorePath = s"$base/ann",
      pairsDir = s"$base/pairs", log, graft.model.SystemClock)
    assert(a2 === "skipped")
  }

  test("interrupted forget commit: recover() restores archived cells " +
      "(pre-forget content back), and the RETRY converges to the " +
      "post-forget store — the at-least-once replay discipline") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-forget-crash").toString
    val store = new IncrementalDedup.SigStore(spark, s"$base/sigs")
    store.withLease {
      store.save(IncrementalDedup.initialStore(
        Dedup.minhashSig(docs(1L to 40L))), fanOut = 4)
    }
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: archive one populated cell to
    // .bakparts and DELETE it from the store (the dynamic overwrite's
    // delete-before-rename window, frozen mid-flight)
    val cells = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/sigs"))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("pb0="))
    val victim = fs.listStatus(cells.head.getPath)
      .filter(_.isDirectory).head.getPath
    val rel = s"${victim.getParent.getName}/${victim.getName}"
    val bak = new org.apache.hadoop.fs.Path(s"$base/sigs.bakparts/$rel")
    fs.mkdirs(bak.getParent)
    assert(fs.rename(victim, bak))
    val preCount = store.withLease {
      // recover() (via load) restores the archived cell
      store.load().get.count()
    }
    assert(preCount === 40L,
      "archived cell not restored by recover()")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$base/sigs.bakparts")))
    // the retry then forgets cleanly
    val r = store.withLease(store.forget(Seq(1L, 2L).toDF("doc_id")))
    assert(r.rowsForgotten === 2L)
    assert(store.load().get.count() === 38L)
  }
}
