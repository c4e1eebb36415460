package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Multimodal

/** Invariants of the multimodal plumbing (rows-only in the oracle gate —
  * the decode step is a marked deterministic fake, so the driver cannot
  * hash-check it; these pin the contract the plumbing must keep when the
  * fake is swapped for a real codec). */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("mm01: decode is deterministic and total (one row per doc)") {
    val total = graft.tables.Tables.documents(spark, sfDir).count()
    val a = Multimodal.mm01DecodeMeta.run(spark, sfDir).collect()
    val b = Multimodal.mm01DecodeMeta.run(spark, sfDir).collect()
    assert(a.length.toLong === total)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // metadata domains hold (the DATA_PURITY of the fake codec's output)
    a.foreach { r =>
      assert(r.getAs[Int]("n_bytes") >= 0)
      assert(Set("jpeg", "png", "webm")(r.getAs[String]("format")))
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 80)
      assert(r.getAs[Int]("height") >= 16 && r.getAs[Int]("height") < 80)
      assert(r.getAs[Int]("n_frames") >= 1)
    }
  }

  test("mm02: exactly n_frames rows per multi-frame doc, 40ms spacing") {
    val meta = Multimodal.mm01DecodeMeta.run(spark, sfDir)
      .filter(col("n_frames") > 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_frames"))
      .toMap
    val frames = Multimodal.mm02FrameSample.run(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(frames.keySet === meta.keySet)
    frames.foreach { case (id, rows) =>
      assert(rows.length === meta(id))
      val idx = rows.map(_.getAs[Int]("frame_idx")).sorted
      assert(idx.toSeq === (0 until meta(id)))
      rows.foreach(r => assert(
        r.getAs[Int]("frame_ts_ms") === r.getAs[Int]("frame_idx") * 40))
    }
  }

  test("mm03: resize plan fits the 224 box and preserves aspect ordering") {
    Multimodal.mm03ResizePlan.run(spark, sfDir).collect().foreach { r =>
      val (w, h) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(w <= 224 && h <= 224)
      assert(w == 224 || h == 224) // the long side lands on the box
    }
  }

  test("mm04: probe scores are valid cosines in descending order") {
    val rows = Multimodal.mm04FeatureExtract.run(spark, sfDir).collect()
    assert(rows.length === 20)
    val scores = rows.map(_.getAs[Double]("probe_cosine"))
    assert(scores.toSeq === scores.sorted.reverse.toSeq)
    scores.foreach(s => assert(s >= -1.0001 && s <= 1.0001 && !s.isNaN))
  }

  test("mm06: segments are maximal non-silent islands with in-range energy") {
    import graft.pipeline.Multimodal
    val rows = Multimodal.mm06AudioSegments.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("seg_frames") >= 1L)
      val e = r.getAs[Double]("avg_energy")
      assert(e >= 200.0 && e < 1000.0) // every member frame is >= 200
    }
    // maximality: consecutive segments of one doc are separated by at
    // least one silent frame (else the island trick would have merged
    // them)
    rows.groupBy(_.getLong(0)).values.foreach { segs =>
      segs.sortBy(_.getAs[Long]("seg_start")).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("seg_start")
            > a.getAs[Long]("seg_start") + a.getAs[Long]("seg_frames"))
        case _ =>
      }
    }
    // determinism: the fake decode is a pure function of the payload
    val again = Multimodal.mm06AudioSegments.run(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("mm07: byte-identical payloads group; distinct payloads don't") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    // docs 1/3/7 share bytes; 2/5 share bytes; 4/6 are singletons
    Seq(
      (1L, "same image bytes A", "en", "t", 0L),
      (2L, "same image bytes B", "en", "t", 0L),
      (3L, "same image bytes A", "en", "t", 0L),
      (4L, "unique payload one", "en", "t", 0L),
      (5L, "same image bytes B", "en", "t", 0L),
      (6L, "unique payload two", "en", "t", 0L),
      (7L, "same image bytes A", "en", "t", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Multimodal.mm07PhashDup.run(spark, dir).collect()
      .map(r => (r.getAs[Long]("n_images"), r.getAs[Long]("rep_doc"),
        r.getAs[String]("sample_docs"))).toSet
    assert(got === Set((3L, 1L, "1,3,7"), (2L, 2L, "2,5")))
  }

  test("mm08: paired/missing/orphan accounting on a crafted misalignment") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cov").toString
    // source A: docs 1,2 (vec for 2 only); source B: doc 3 (vec); vec 4
    // has NO doc -> '(orphan)'
    Seq(
      (1L, "a", "en", "A", 1L), (2L, "b", "en", "A", 1L),
      (3L, "c", "en", "B", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    Seq((2L, Array(1.0f), 0), (3L, Array(1.0f), 0), (4L, Array(1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Multimodal.mm08ModalityCoverage.run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSet
    assert(got === Set(
      ("A", 2L, 1L, 1L, 0.5),
      ("B", 1L, 1L, 0L, 1.0),
      ("(orphan)", 0L, 0L, 0L, null)))
  }

  test("mm09: identical payloads pair at hamming 0; distinct ones verify out") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phnd").toString
    // 1,2,5 share a payload (one hamming-0 clique), 3 and 4 are unique —
    // the md5 fake has no near-collisions, so candidates that reach the
    // verify via a chance segment match must be REJECTED by hamming > 2
    Seq(
      (1L, "same image bytes", "en", "t", 0L),
      (2L, "same image bytes", "en", "t", 0L),
      (3L, "different bytes", "en", "t", 0L),
      (4L, "yet another payload", "en", "t", 0L),
      (5L, "same image bytes", "en", "t", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = Multimodal.mm09PhashNearDup.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq === Seq((1L, 2L, 0L, true), (1L, 5L, 0L, true),
      (2L, 5L, 0L, true)))
  }

  test("mm09: the hex hamming fold equals bit-level distance on known hashes") {
    import spark.implicits._
    // f=1111 vs e=1110 -> 1 bit; 0 vs 3 -> 2 bits; identical tails -> 0
    val df = Seq(
      ("ffffffffffffffff", "efffffffffffffff", 1L),
      ("0000000000000000", "3000000000000000", 2L),
      ("0123456789abcdef", "0123456789abcdef", 0L),
      ("0000000000000000", "ffffffffffffffff", 64L)
    ).toDF("pa", "pb", "want")
    val rows = df.withColumn("got", expr(
      """aggregate(transform(sequence(1, 16), i ->
        |  bit_count((instr('0123456789abcdef', substring(pa, i, 1)) - 1)
        |          ^ (instr('0123456789abcdef', substring(pb, i, 1)) - 1))),
        |  0, (acc, x) -> acc + x)""".stripMargin).cast("long")).collect()
    rows.foreach(r => assert(r.getAs[Long]("got") === r.getAs[Long]("want")))
  }
}
