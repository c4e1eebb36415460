package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, IncrementalDedup}

/** The incremental dedup tier's restriction-equality contract: per
  * arriving batch, `ingest` must emit EXACTLY the pairs the monolithic
  * chain over all-data-so-far emits that involve a batch doc, and the
  * evolved store must equal the monolithic signature state — on random
  * corpora engineered for signature collisions, rep takeovers and
  * shared LSH buckets, across multi-batch evolutions. dd16 pins the
  * same contract against the DuckDB oracle on the fixtures. */
class IncrementalDedupSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  /** Tiny-vocabulary corpora: few distinct bigrams force identical
    * signatures (star classes), near-identical signatures (shared
    * bands), and plenty of bucket collisions. */
  private val vocab = Vector("alpha", "beta", "gamma", "delta")
  private def genDoc(id: Long): Gen[(Long, String)] = for {
    n <- Gen.choose(2, 5)
    ws <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield (id, ws.mkString(" "))

  private def sigsOf(docs: Seq[(Long, String)]): DataFrame =
    Dedup.minhashSig(docs.toDF("doc_id", "text"))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def storeKey(df: DataFrame): Set[(String, Long, Long)] =
    df.select("sig_key", "doc_id", "rep").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  /** full-corpus pairs restricted to those involving `batch` ids. */
  private def fullRestricted(all: Seq[(Long, String)],
      batch: Set[Long]): Set[(Long, Long)] =
    pairSet(Dedup.lshPairsOf(sigsOf(all)))
      .filter(p => batch(p._1) || batch(p._2))

  test("one batch: ingest == monolithic chain restricted to new docs " +
      "(random corpora, random splits)") {
    val genCorpus: Gen[(List[(Long, String)], Int)] = for {
      n <- Gen.choose(4, 18)
      docs <- Gen.sequence[List[(Long, String)], (Long, String)](
        (1 to n).map(i => genDoc(i.toLong)))
      cut <- Gen.choose(0, n) // empty old store and empty batch included
    } yield (docs, cut)
    val prop = Prop.forAll(genCorpus) { case (docs, cut) =>
      val (olds, news) = docs.splitAt(cut)
      if (news.isEmpty) Prop(true) // nothing arrives -> nothing to assert
      else {
        val store = IncrementalDedup.initialStore(sigsOf(olds))
        val inc = IncrementalDedup.ingest(store, sigsOf(news))
        val got = pairSet(inc.pairs)
        val want = fullRestricted(docs, news.map(_._1).toSet)
        val storeOk = storeKey(inc.updatedStore) ==
          storeKey(Dedup.sigWithRep(sigsOf(docs)))
        Prop(got == want) :| s"pairs got=$got want=$want" &&
          Prop(storeOk) :| "updated store != monolithic sigWithRep"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("three-batch evolution: every batch equals the monolithic chain " +
      "over data-so-far; rep takeovers handled (descending ids)") {
    // ids arrive DESCENDING so later batches contain smaller ids and
    // take over as class representatives — the hardest path: the
    // incremental run must emit the new rep's star AND banding pairs
    // exactly as the full run re-labels them
    val texts = Seq(
      "alpha beta alpha beta", // classes collide heavily
      "alpha beta alpha beta",
      "gamma delta gamma",
      "alpha beta alpha beta",
      "gamma delta gamma",
      "beta alpha beta",
      "alpha beta alpha beta",
      "gamma delta gamma",
      "delta gamma delta")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      ((100 - i).toLong, t) // 100, 99, ... descending
    }
    val batches = docs.grouped(3).toSeq
    var store = IncrementalDedup
      .initialStore(sigsOf(Seq.empty[(Long, String)]))
    var sofar = Seq.empty[(Long, String)]
    batches.foreach { b =>
      sofar = sofar ++ b
      val inc = IncrementalDedup.ingest(store, sigsOf(b))
      val got = pairSet(inc.pairs)
      val want = fullRestricted(sofar, b.map(_._1).toSet)
      assert(got === want, s"batch ${b.map(_._1)}")
      assert(storeKey(inc.updatedStore) ===
        storeKey(Dedup.sigWithRep(sigsOf(sofar))))
      store = inc.updatedStore.localCheckpoint(true)
    }
  }

  test("SigStore: swap round-trip, crash-tmp recovery precedence") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-sigstore").toString
    val st = new IncrementalDedup.SigStore(spark, s"$base/sigs")
    assert(st.load().isEmpty)
    val docs = Seq((1L, "alpha beta alpha"), (2L, "alpha beta alpha"),
      (3L, "gamma delta"))
    val frame = IncrementalDedup.initialStore(sigsOf(docs))
    st.save(frame)
    val loaded = st.load().get
    assert(storeKey(loaded) === storeKey(frame))
    // second generation replaces the first atomically
    val docs2 = docs :+ (4L, "delta gamma")
    st.save(IncrementalDedup.initialStore(sigsOf(docs2)))
    assert(st.load().get.count() === 4)
  }

  test("skew pile: a batch arriving into a 3000-copy identical class " +
      "emits |batch| star rows, never a clique") {
    // the GenSkew finding applied to arrival: 600 new copies of a doc
    // already present 2400 times must attach as 600 star edges on the
    // class min — C(600,2) in-batch pairs or 600*2400 cross pairs would
    // be the quadratic regression the star collapse exists to prevent
    val text = "alpha beta gamma delta epsilon zeta"
    val olds = (1L to 2400L).map(i => (i, text))
    val news = (10001L to 10600L).map(i => (i, text))
    val store = IncrementalDedup.initialStore(sigsOf(olds))
    val inc = IncrementalDedup.ingest(store, sigsOf(news))
    val got = pairSet(inc.pairs)
    assert(got === news.map(n => (1L, n._1)).toSet,
      s"expected 600 star edges on rep 1, got ${got.size} pairs")
    // and a new SMALLER id taking over the pile's rep stays linear too:
    // the full run re-labels every star edge to the new rep, and the
    // restriction keeps exactly the class edges (they all involve doc 0
    // now) — |class| - 1 rows, not a clique
    val inc2 = IncrementalDedup.ingest(
      inc.updatedStore.localCheckpoint(true), sigsOf(Seq((0L, text))))
    val got2 = pairSet(inc2.pairs)
    assert(got2 === (olds.map(_._1) ++ news.map(_._1))
      .map(i => (0L, i)).toSet,
      s"rep takeover must re-emit the star linearly, got ${got2.size}")
  }

  test("truncate mode: the bucket_truncated audit flag rides through " +
      "ingest like the batch chain") {
    // force a clipped bucket: identical band keys across >cap classes
    // would need a degenerate banding; instead just assert the schema
    // contract both ways — throw mode emits exactly (doc_a, doc_b),
    // truncate mode carries the flag column
    val docs = Seq((1L, "alpha beta alpha"), (2L, "alpha beta alpha"),
      (3L, "gamma delta gamma"))
    val store = IncrementalDedup.initialStore(sigsOf(docs.take(2)))
    val throwOut = IncrementalDedup.ingest(store, sigsOf(docs.drop(2)))
    assert(throwOut.pairs.columns.toSeq === Seq("doc_a", "doc_b"))
    spark.conf.set("spark.graft.bucketCap.mode", "truncate")
    try {
      val truncOut = IncrementalDedup.ingest(store, sigsOf(docs.drop(2)))
      assert(truncOut.pairs.columns.toSeq ===
        Seq("doc_a", "doc_b", "bucket_truncated"))
      assert(truncOut.pairs.collect()
        .forall(!_.getAs[Boolean]("bucket_truncated")),
        "no bucket is oversize here, so no pair may be flagged")
    } finally spark.conf.unset("spark.graft.bucketCap.mode")
  }

  test("work scales with the batch: an untouched store contributes no " +
      "pair work (disjoint-signature batch)") {
    // old docs and the batch share NO bigrams -> no common sig classes,
    // no shared buckets (verified), so the only pairs are within-batch
    val olds = (1L to 6L).map(i => (i, "alpha beta alpha beta"))
    val news = Seq((10L, "zeta eta zeta"), (11L, "zeta eta zeta"))
    val store = IncrementalDedup.initialStore(sigsOf(olds))
    val inc = IncrementalDedup.ingest(store, sigsOf(news))
    val got = pairSet(inc.pairs)
    assert(got === Set((10L, 11L)), got)
    // and the full-restriction contract still holds
    assert(got === fullRestricted(olds ++ news, Set(10L, 11L)))
  }
}
