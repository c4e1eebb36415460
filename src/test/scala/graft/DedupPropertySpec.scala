package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Property-based hardening of the distributed connected-components
  * primitive: the oracle pins dd06 on the fixture graph; this pins the
  * ALGORITHM on arbitrary random graphs against a reference union-find —
  * chains, cliques, forests, isolated pairs, label-order adversaries. */
class DedupPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min of component = the root under min-union
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
  }

  // threshold 0 forces the DISTRIBUTED pointer-jumping loop; the default
  // (2M) routes these small graphs through the driver union-find path —
  // both must agree with the reference on every graph
  test("label propagation equals union-find on random graphs (both paths)") {
    import spark.implicits._
    val genEdge: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 39L)
      b <- Gen.choose(0L, 39L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val genGraph: Gen[List[(Long, Long)]] =
      Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, genEdge))
    val prop = Prop.forAll(genGraph) { edges =>
      val distinctPairs = edges.distinct
      val want = unionFind(distinctPairs)
      val viaDriver = Dedup.connectedComponents(
          distinctPairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaCluster = Dedup.connectedComponents(
          distinctPairs.toDF("doc_a", "doc_b"), smallGraphMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      viaDriver == want && viaCluster == want
    }
    // 20 graphs — each case runs a full multi-round Spark fixpoint
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("lshPairs: an all-identical corpus collapses to star edges, no mega-bucket") {
    import spark.implicits._
    // 2000 copies of one text: every doc has the SAME signature, so before
    // the exact-collapse this was ONE bucket of 2000 docs — a 2M-element
    // in-bucket pair expansion inside a single aggregation buffer. Now the
    // class collapses to its min-id representative and the pair output is
    // the n-1 star, with every bucket at size 1.
    val docs = (1L to 2000L).map(i => (i, "the same boilerplate page text"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshPairsOf(Dedup.minhashSig(docs), maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.length === 1999)
    assert(pairs.forall(_._1 == 1L))
    assert(pairs.map(_._2).toSeq === (2L to 2000L))
  }

  test("lshPairs: a degenerated banding fails loudly instead of expanding") {
    import spark.implicits._
    // 10 DISTINCT signatures that share band 0 (m0..m3 equal): the collapse
    // cannot help, so the bucket genuinely holds 10 entries and the cap
    // must refuse the quadratic expansion with a diagnosable error.
    val sig = (1L to 10L).map(i =>
        (i, "a", "b", "c", "d", s"e$i", s"f$i", s"g$i", s"h$i"))
      .toDF("doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7")
    // the guard raises from inside the window stage (executor-side
    // raise_error), so it surfaces wrapped in Spark's job failure — walk
    // the cause chain for the diagnosable message
    val e = intercept[Throwable] {
      Dedup.lshPairsOf(sig, maxBucket = 5).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("maxBucket=5"))
    assert(msgs.contains("10"))
  }

  test("lshPairs: bucketCap.mode=truncate clips a mega-bucket, flags its pairs, run survives") {
    import spark.implicits._
    // Same degenerated corpus as the fail-loudly case: 10 DISTINCT
    // signatures sharing band 0, cap 5 — throw mode refuses it (previous
    // test). Truncate mode must keep a deterministic 5-entry sample of the
    // bucket, emit only its C(5,2)=10 in-bucket pairs, flag every one
    // bucket_truncated=true, and complete without error.
    val sig = (1L to 10L).map(i =>
        (i, "a", "b", "c", "d", s"e$i", s"f$i", s"g$i", s"h$i"))
      .toDF("doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7")
    spark.conf.set("spark.graft.bucketCap.mode", "truncate")
    try {
      val out = Dedup.lshPairsOf(sig, maxBucket = 5)
      assert(out.columns.toSeq ===
        Seq("doc_a", "doc_b", "bucket_truncated"))
      val rows = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.length === 10) // C(5,2) from the clipped bucket
      assert(rows.forall(_._3), "every pair from the clipped bucket flagged")
      val kept = rows.flatMap(p => Seq(p._1, p._2)).distinct
      assert(kept.length === 5, "exactly maxBucket docs survive the clip")
      // determinism: the md5 ranking is a pure function of the bucket key
      // and doc ids — a second run keeps the identical sample
      val again = Dedup.lshPairsOf(sig, maxBucket = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(again.toSet === rows.toSet)

      // a corpus with NO oversize bucket: truncate mode emits the same
      // pairs as throw mode, every flag false
      val ok = Seq(
        (1L, "a", "a", "a", "a", "x", "x", "x", "x"),
        (2L, "a", "a", "a", "a", "y", "y", "y", "y"),
        (3L, "b", "b", "b", "b", "y", "y", "y", "y"))
        .toDF("doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7")
      val tPairs = Dedup.lshPairsOf(ok, maxBucket = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(tPairs.forall(!_._3))
      spark.conf.unset("spark.graft.bucketCap.mode")
      val thPairs = Dedup.lshPairsOf(ok, maxBucket = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(tPairs.map(p => (p._1, p._2)).toSet === thPairs.toSet)
    } finally spark.conf.unset("spark.graft.bucketCap.mode")
  }

  test("dd04/dd05: an exact-dup pile yields LINEAR star output, never the clique") {
    import spark.implicits._
    // the GenSkew stress finding at regression scale: before the
    // star-collapse fix, dd04 emitted C(n,2) pairs on an identical-doc
    // pile (5.2e9 rows at n=100k). Pin: n identical docs produce exactly
    // n-1 star pairs at hamming 0, and output stays linear overall.
    val dir = java.nio.file.Files.createTempDirectory("graft-pile").toString
    val n = 3000
    val pile = (0 until n).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta", "en", "web", 38L))
    val distinctDocs = Seq(
      (900001L, "one completely different document body", "en", "web", 37L),
      (900002L, "another unrelated text entirely here", "en", "web", 36L))
    (pile ++ distinctDocs)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val dd04 = Dedup.dd04Simhash.run(spark, dir).collect()
    val starPile = dd04.filter(r => r.getLong(0) == 0L && r.getLong(2) == 0L)
    assert(starPile.length === n - 1,
      "pile collapses to a star on its min-doc rep")
    assert(dd04.length < n + 10, s"linear output, got ${dd04.length}")
    // dd05: identical vectors collapse the same way
    val vecs = (0 until 2000).map(i =>
      (i.toLong, Array(0.6f, 0.8f, 0.0f, 0.0f), 1)) ++ Seq(
      (900001L, Array(0.0f, 0.0f, 1.0f, 0.0f), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val dd05 = Dedup.dd05EmbeddingDup.run(spark, dir).collect()
    assert(dd05.count(r => r.getLong(0) == 0L && r.getDouble(2) >= 0.9999)
      === 1999, "vector pile collapses to a star on its min-id rep")
    assert(dd05.length < 2010, s"linear output, got ${dd05.length}")
    // dd09: the SemDeDup cell expansion collapses the same way (the
    // trainer still sees the full multiset; only pair work dedups)
    val dd09 = Dedup.dd09SemanticDedup.run(spark, dir).collect()
    val star09 = dd09.filter(r => r.getLong(1) == 0L &&
      r.getDouble(3) >= 0.9999)
    assert(star09.length === 1999,
      s"dd09 pile collapses to a star, got ${star09.length}")
    assert(dd09.length < 2100, s"dd09 linear output, got ${dd09.length}")
  }

  test("lshPairs: star-collapse preserves components and stays within clique pairs") {
    import spark.implicits._
    // Random signature frames over a tiny alphabet (forcing band collisions
    // AND identical-signature classes): the star form must yield exactly
    // the connected components of the full clique expansion — that is the
    // contract every consumer (dd06, the cleaning chains) relies on — and
    // emit only pairs the clique form would also emit.
    val genSig: Gen[(Long, String, String, String, String)] = for {
      id <- Gen.choose(1L, 24L)
      b0 <- Gen.oneOf("x", "y", "z")   // band-0 key
      b1 <- Gen.oneOf("p", "q", "r")   // band-1 key
    } yield (id, b0, b1, b0, b1)
    val prop = Prop.forAll(Gen.choose(2, 24).flatMap(n =>
        Gen.listOfN(n, genSig))) { rows =>
      val docs = rows.distinctBy(_._1)
      val sig = docs.map { case (id, b0, b1, _, _) =>
        (id, b0, b0, b0, b0, b1, b1, b1, b1) }
        .toDF("doc_id", "m0", "m1", "m2", "m3", "m4", "m5", "m6", "m7")
      val clique = (for {
        a <- docs; b <- docs
        if a._1 < b._1 && (a._2 == b._2 || a._3 == b._3)
      } yield (a._1, b._1)).distinct
      val got = Dedup.lshPairsOf(sig, maxBucket = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sameComponents = clique.isEmpty && got.isEmpty || {
        val want = unionFind(clique)
        val have = unionFind(got.toSeq)
        want == have
      }
      sameComponents && got.subsetOf(clique.toSet)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("autoK: scale-aware centroid count — oracle floor at fixture " +
      "scale, k proportional to corpus above it") {
    import graft.pipeline.Similarity
    // the oracle's literal k=8 governs every driver fixture (<= 6400
    // vectors at cell size 800), so the gated queries and the production
    // default coincide there...
    assert(Similarity.autoK(0) === 8)
    assert(Similarity.autoK(500) === 8)    // sf0.01
    assert(Similarity.autoK(2000) === 8)   // sf0.1
    assert(Similarity.autoK(6400) === 8)
    // ...and above fixture scale k grows with the corpus so cells stay
    // ~800 vectors — chosen on the measured sf1 Pareto (SCALE.md auto-k
    // sweep: cell 800 -> k=25, 7.3 s, recall 0.796; cell 300 -> k=67,
    // 6.5 s but recall 0.571; fixed k=8 -> the 15.3 s quadratic)
    assert(Similarity.autoK(6401) === 9)
    assert(Similarity.autoK(20000) === 25)  // sf1 -> the measured regime
    assert(Similarity.autoK(50000000) === 62500)
    // ceil semantics + monotonicity on a sweep
    val ks = (1L to 100L).map(n => Similarity.autoK(n * 500))
    assert(ks === ks.sorted)
    assert(Similarity.autoK(801) === math.ceil(801.0 / 800).toInt.max(8))
    // the 2^24 cap: absurd corpus sizes saturate instead of overflowing
    assert(Similarity.autoK(Long.MaxValue / 4) === (1 << 24))
    assert(Similarity.autoK(Long.MaxValue / 4) > 0)
  }

  test("dd09: multi-probe emission is exactly-once and within the exact truth") {
    // the oracle REPLAYS the first-match-wins logic, so a suppression bug
    // that double-emits pairs sharing both probes would pass the hash gate
    // in both engines — this asserts uniqueness independently, against
    // driver-computed truth
    val rows = Dedup.dd09SemanticDedup.run(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ids = rows.map(p => (p._1, p._2)).toSeq
    assert(ids.distinct.length === ids.length,
      "a pair sharing both probes was emitted more than once")
    // every emitted pair must satisfy the threshold under an independent
    // driver-side cosine (1e-9 tolerance for accumulation-order ulps)
    val vecs = graft.tables.Tables.embeddings(spark, SparkTestSession.sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(rows.forall { case (a, b, _) =>
      cos(vecs(a), vecs(b)) >= 0.35 - 1e-9 })
  }

  test("kmeansTop2From equals the explode+pivot spelling it replaced " +
      "(round-17 dd09 shave): same (c1, c2) per vector on random " +
      "vectors including duplicate piles — tiebreaks and all") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(1742)
    // random quantized vectors + a duplicate pile (ties in dist2 across
    // vectors) + near-centroid points (tight dist2 races)
    val vecs = ((1L to 400L).map(i =>
        (i, Seq.fill(8)((rnd.nextInt(121) - 60).toLong))) ++
      (401L to 430L).map(i => (i, Seq.fill(8)(7L))))
      .toDF("vec_id", "qv")
    val want = graft.pipeline.Similarity
      .kmeansProbesFrom(vecs, 2, 8)
      .groupBy("vec_id")
      .agg(max(when(col("rk") === 1, col("cluster"))).as("c1"),
        max(when(col("rk") === 2, col("cluster"))).as("c2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val got = graft.pipeline.Similarity.kmeansTop2From(vecs, 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("dd02: the broadcast-tier guard refuses an over-budget corpus loudly") {
    // a 1 KiB budget is below any real corpus — the probe must throw
    // BEFORE collecting anything, and the message must name the scale path
    val e = intercept[IllegalStateException] {
      Dedup.ngramJaccardPairs(SparkTestSession.spark,
        SparkTestSession.sfDir, maxBroadcastBytes = 1024L)
    }
    assert(e.getMessage.contains("jaccardVerify"))
    assert(e.getMessage.contains("dd03"))
  }

  test("jaccardVerify on all pairs reproduces dd02's exact output") {
    import spark.implicits._
    val docs = graft.tables.Tables.documents(spark, SparkTestSession.sfDir)
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val allPairs = (for { a <- ids; b <- ids if a < b } yield (a, b))
      .toSeq.toDF("doc_a", "doc_b")
    val got = Dedup.jaccardVerify(docs, allPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.dd02NgramJaccard.run(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
    assert(want.nonEmpty) // the fixture must actually exercise the compare
  }

  test("jaccardVerify(LSH candidates) is exactly dd02 restricted to candidates") {
    // the production chain: dd03 candidates -> exact confirmation. Every
    // confirmed pair must appear in dd02's all-pairs truth with the SAME
    // rounded Jaccard (the verifier adds no false positives).
    val spark0 = spark
    val d = SparkTestSession.sfDir
    val docs = graft.tables.Tables.documents(spark0, d)
    val cand = Dedup.lshPairsOf(Dedup.minhashSig(docs))
    val got = Dedup.jaccardVerify(docs, cand)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val truth = Dedup.dd02NgramJaccard.run(spark0, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.subsetOf(truth))
  }

  test("a 30-vertex path (worst-case diameter) converges on both paths") {
    import spark.implicits._
    val chain = (0L until 29L).map(i => (i, i + 1))
    val want = (0L to 29L).map(_ -> 0L).toMap
    Seq(2000000L, 0L).foreach { thr =>
      val got = Dedup.connectedComponents(chain.toDF("doc_a", "doc_b"),
          smallGraphMaxEdges = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"threshold $thr")
    }
  }

  test("dd12: spans are exactly the cross-doc shared runs, never within-doc") {
    import spark.implicits._
    // the fixture exercises dd12 on organic dups; this pins the CLASSES:
    // whole-doc dup -> one full-width span; a 5-token run shared mid-doc
    // -> one minimal span at the right offset on BOTH sides; within-doc
    // repetition alone -> no span (that is tx05's signal, not cross-doc
    // contamination); sub-shingle docs -> absent.
    val dir = java.nio.file.Files.createTempDirectory("graft-spans").toString
    Seq(
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12", "en", "t", 0L),
      (2L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11 a12", "en", "t", 0L),
      (3L, "c1 c2 c3 c4 c5 s1 s2 s3 s4 s5 c6 c7 c8 c9", "en", "t", 0L),
      (4L, "d1 d2 d3 d4 s1 s2 s3 s4 s5 d5 d6 d7", "en", "t", 0L),
      (5L, "e1 e2 e3 e4 e5 e6 r r r r r r r r e7", "en", "t", 0L),
      (6L, "f1 f2 f3", "en", "t", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Dedup.dd12DupSpans.run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 0L, 12L, 8L),  // whole doc: positions 0..7, 8+5-1=12 tokens
      (2L, 0L, 12L, 8L),
      (3L, 5L, 5L, 1L),   // only the exact "s1..s5" shingle is shared
      (4L, 4L, 5L, 1L)))  // same run, its offset in doc 4
  }

  test("dd13: overlap matrix reports exactly the shared shingles, pairwise") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ovl").toString
    // A and B share exactly ONE 5-token shingle; C shares nothing
    Seq(
      (1L, "x1 x2 x3 x4 x5 a1 a2 a3 a4 a5", "en", "A", 0L),
      (2L, "b1 b2 b3 x1 x2 x3 x4 x5", "en", "B", 0L),
      (3L, "c1 c2 c3 c4 c5", "en", "C", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.dd13SourceOverlap.run(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "A" && r.getString(1) === "B")
    assert(r.getAs[Long]("shared") === 1L)
    assert(r.getAs[Long]("n_a") === 6L) // 10 tokens -> 6 distinct shingles
    assert(r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Double]("containment_a") === 0.1667)
    assert(r.getAs[Double]("containment_b") === 0.25)
    assert(r.getAs[Double]("jaccard") === 0.1111) // 1 / (6 + 4 - 1)
  }

  test("dd14: keep_doc is the longest member (min doc_id on ties); counts add up") {
    // reference recompute from dd06's own labels — dd14 must agree with
    // the keep-the-longest policy on every cluster, not just the fixture's
    val chars = graft.tables.Tables.documents(spark, SparkTestSession.sfDir)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Dedup.dd06DupClusters.run(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).map { case (cl, ms) =>
        val members = ms.map(_._1)
        val keep = members.minBy(d => (-chars(d), d))
        (cl, keep, chars(keep), members.length.toLong,
          members.length.toLong - 1)
      }.toSet
    val got = Dedup.dd14ClusterReps.run(spark, SparkTestSession.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // every cluster retires at least one member by construction
    got.foreach { case (_, _, _, n, dropped) =>
      assert(n >= 2 && dropped === n - 1)
    }
  }

  test("pipe17: shares sum to ~1 and drops reconcile with dd14") {
    val rows = Dedup.pipe17DedupMixture.run(spark, SparkTestSession.sfDir)
      .collect()
    assert(rows.nonEmpty)
    // shares are r4-rounded, so the sums land within |sources|·1e-4 of 1
    val eps = rows.length * 1e-4
    assert(math.abs(rows.map(_.getAs[Double]("share_before")).sum - 1) < eps)
    assert(math.abs(rows.map(_.getAs[Double]("share_after")).sum - 1) < eps)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"))
      assert(r.getAs[Long]("n_after") >= 0L)
    }
    // total docs dropped must equal dd14's per-cluster drop counts
    val dropped = rows.map(r =>
      r.getAs[Long]("n_before") - r.getAs[Long]("n_after")).sum
    val dd14Dropped = Dedup.dd14ClusterReps.run(spark, SparkTestSession.sfDir)
      .collect().map(_.getAs[Long]("n_dropped")).sum
    assert(dropped === dd14Dropped)
  }

  test("dd15: calibration covers exactly dd03's candidates, arithmetic consistent") {
    val pairs3 = Dedup.dd03MinhashLsh.run(spark, SparkTestSession.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Dedup.dd15MinhashCalibration
      .run(spark, SparkTestSession.sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet === pairs3)
    rows.foreach { r =>
      val m = r.getAs[Long]("n_match")
      assert(m >= 0 && m <= 8)
      assert(r.getAs[Double]("est_sim") === m / 8.0)
      val err = math.floor(math.abs(m / 8.0 - r.getAs[Double]("jaccard"))
        * 10000 + 0.5) / 10000
      assert(r.getAs[Double]("abs_err") === err)
    }
  }
}
