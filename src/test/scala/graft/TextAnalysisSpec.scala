package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextAnalysis

/** Semantic gates for the text-analysis tier beyond the DuckDB oracle:
  * properties that must hold on ANY corpus, not just the fixture. */
class TextAnalysisSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tx09: redacted text carries ZERO residual PII matches") {
    // the invariant that makes a redaction pass shippable: re-running the
    // detectors on their own output finds nothing, for every document
    val residual = TextAnalysis.piiRedacted(spark, sfDir)
      .select(
        size(regexp_extract_all(col("r"), lit(TextAnalysis.piiEmail), lit(0)))
          .as("e"),
        size(regexp_extract_all(col("r"), lit(TextAnalysis.piiIp), lit(0)))
          .as("i"),
        size(regexp_extract_all(col("r"), lit(TextAnalysis.piiPhone), lit(0)))
          .as("p"))
      .agg(sum(col("e") + col("i") + col("p"))).head.getLong(0)
    assert(residual === 0L)
  }

  test("tx09: every augmented doc yields the injected detections") {
    val rows = TextAnalysis.tx09PiiRedact.run(spark, sfDir)
    val bad = rows
      .filter(col("n_emails") < 2 || col("n_ips") < 1 || col("n_phones") < 1)
      .count()
    assert(bad === 0L)
    assert(rows.count() > 0)
  }

  test("tx10: Simpson numerator equals a driver recompute on every doc") {
    val got = TextAnalysis.tx10LexicalDiversity.run(spark, sfDir)
      .select("doc_id", "n_tokens", "n_types", "sum_sq").collect()
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ", -1).toSeq
      val counts = toks.groupBy(identity).map(_._2.size.toLong)
      assert(r.getInt(1) === toks.size, "n_tokens")
      assert(r.getInt(2) === counts.size, "n_types")
      assert(r.getLong(3) === counts.map(c => c * c).sum, "sum_sq")
    }
  }

  test("tx09: redaction shrinks or preserves length, never corrupts md5 width") {
    val probe = TextAnalysis.piiRedacted(spark, sfDir)
      .select(md5(col("r")).as("m"))
      .filter(length(col("m")) =!= 32).count()
    assert(probe === 0L)
  }

  test("tx14: each gopher rule trips independently on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gopher").toString
    val fluent = ("the quick brown fox jumps over that lazy dog " +
      "and then they have fun with friends ") // 16 words, all rules pass
    Seq(
      (1L, (fluent * 4).trim, "en", "t", 0L),               // 64 w: all pass
      (2L, "the cat and dog have fun with mice", "en", "t", 0L), // 8 w
      (3L, ("a " * 58).trim + " the and", "en", "t", 0L),   // mean len ~1.07
      (4L, (fluent.trim.split(" ").take(12).mkString(" ") + " " +
        ("12345 " * 48)).trim, "en", "t", 0L),              // alpha 12/60
      (5L, (fluent.trim.split(" ").take(13).mkString(" ") + " " +
        (fluent * 3).trim + " " + ("# " * 8)).trim, "en", "t", 0L), // 69 w, 8 '#'
      (6L, ("cat " * 60).trim, "en", "t", 0L)               // no stop words
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.tx14GopherRules.run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    def flags(id: Long): (Boolean, Boolean, Boolean, Boolean, Boolean) = {
      val r = rows(id)
      (r.getAs[Boolean]("pass_word_count"), r.getAs[Boolean]("pass_mean_len"),
        r.getAs[Boolean]("pass_alpha"), r.getAs[Boolean]("pass_symbol"),
        r.getAs[Boolean]("pass_stop"))
    }
    assert(flags(1L) === ((true, true, true, true, true)))
    assert(rows(1L).getAs[Boolean]("gopher_pass"))
    assert(flags(2L) === ((false, true, true, true, true))) // too short only
    assert(flags(3L) === ((true, false, true, true, true))) // mean len only
    assert(flags(4L) === ((true, true, false, true, true))) // alpha only
    assert(flags(5L) === ((true, true, true, false, true))) // symbols only
    assert(flags(6L) === ((true, true, true, true, false))) // stops only
    assert((2L to 6L).forall(!rows(_).getAs[Boolean]("gopher_pass")))
  }

  test("tx15: hashed scores are per-token additive, bounded, sign-gated") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hashclf").toString
    Seq(
      (1L, "foo", "en", "t", 0L),
      (2L, "foo foo foo", "en", "t", 0L),
      (3L, "bar", "en", "t", 0L),
      (4L, "foo bar", "en", "t", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = TextAnalysis.tx15HashClassifier.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def ssum(id: Long): Long = m(id).getAs[Long]("score_sum")
    // the same token always hits the same bucket: a doc of n copies
    // scores exactly n times the single-token doc, and the MEAN is equal
    assert(ssum(2L) === 3L * ssum(1L))
    assert(m(2L).getAs[Double]("score") === m(1L).getAs[Double]("score"))
    // mixed doc's sum is the token-weight sum
    assert(ssum(4L) === ssum(1L) + ssum(3L))
    // weights live in [-500, 500]; the keep gate is the integer sign
    m.values.foreach { r =>
      assert(math.abs(r.getAs[Long]("score_sum"))
        <= 500L * r.getAs[Long]("n_tokens"))
      assert(r.getAs[Boolean]("keep") === (r.getAs[Long]("score_sum") >= 0L))
      assert(math.abs(r.getAs[Double]("score")) <= 0.5)
    }
  }

  test("tx16: control and replacement chars are counted; CJK is low-ascii clean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-encqc").toString
    Seq(
      (1L, "plain ascii text", "en", "t", 0L),
      (2L, "bad\u0001ctrl\u001fdoc", "en", "t", 0L),
      (3L, "lost \uFFFD bytes \uFFFD here", "en", "t", 0L),
      (4L, "\u4e2d\u6587\u6587\u672c ok", "zh", "t", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val m = TextAnalysis.tx16EncodingQc.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Double]("ascii_ratio") === 1.0)
    assert(m(1L).getAs[Boolean]("clean"))
    assert(m(2L).getAs[Long]("n_control") === 2L)
    assert(!m(2L).getAs[Boolean]("clean"))
    assert(m(3L).getAs[Long]("n_replacement") === 2L)
    assert(!m(3L).getAs[Boolean]("clean"))
    // CJK: legitimately low ASCII share, but CLEAN — the ratio is a
    // feature, the verdict comes only from the damage counts
    assert(m(4L).getAs[Double]("ascii_ratio") < 0.5)
    assert(m(4L).getAs[Boolean]("clean"))
  }

  test("tx17: slope matches closed-form least squares on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    // one source, token frequencies 8/4/2/1 → ranks 1..4, no rank ties
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).mkString(" ")
    Seq((1L, text, "en", "S", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.tx17ZipfFit.run(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getString(0) === "S" && r.getLong(1) === 4L)
    // ordinary least squares of ln(freq) on ln(rank), computed directly
    val x = Seq(1.0, 2.0, 3.0, 4.0).map(math.log)
    val y = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val (mx, my) = (x.sum / 4, y.sum / 4)
    val slope = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum /
      x.map(a => (a - mx) * (a - mx)).sum
    assert(math.abs(r.getDouble(2) - slope) < 1e-3)
    assert(r.getDouble(2) < 0) // Zipf: frequency falls with rank
  }

  test("tx17: every fixture source fits with negative slope and sane R2") {
    val rows = TextAnalysis.tx17ZipfFit.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 500L)
      assert(r.getDouble(2) < 0, s"source ${r.getString(0)} slope not < 0")
      val r2 = r.getDouble(3)
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("tx18: ARI matches hand computation; edge docs degrade as specified") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ari").toString
    Seq(
      (1L, "The cat sat. The dog ran!", "en", "t", 0L), // 6 words, 2 sents
      (2L, "no terminator here", "en", "t", 0L),        // 1 implied sentence
      (3L, "", "en", "t", 0L),                          // 0 words -> unscored
      (4L, "!!!", "en", "t", 0L)                        // punct only: 1 word
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.tx18Readability.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: chars = len("The cat sat. The dog ran!") - 5 spaces = 20,
    // words = 6, sentences = 2
    val ari1 = math.floor((4.71 * (20.0 / 6) + 0.5 * (6.0 / 2) - 21.43)
      * 100 + 0.5) / 100
    assert(rows(1L).getInt(1) === 20 && rows(1L).getInt(2) === 6 &&
      rows(1L).getInt(3) === 2)
    assert(rows(1L).getDouble(4) === ari1)
    assert(rows(2L).getInt(3) === 1) // terminator-less: one sentence
    assert(rows(3L).isNullAt(4) && rows(3L).getString(5) === "unscored")
    // every band agrees with its rounded score on the real fixture
    TextAnalysis.tx18Readability.run(spark, sfDir).collect().foreach { r =>
      val band = r.getString(5)
      if (r.isNullAt(4)) assert(band === "unscored")
      else {
        val a = r.getDouble(4)
        val want = if (a < 6) "elementary" else if (a < 10) "middle"
          else if (a < 14) "high" else "college"
        assert(band === want, s"doc ${r.getLong(0)}: ari=$a band=$band")
      }
    }
  }

  test("tx20/tx21: model scored by an independent driver fold reproduces the eval") {
    // independent reimplementation: token slots via MessageDigest md5,
    // labels from tx14's (separately tested) gate output, model from
    // tx20's published weight table — the confusion counts must equal
    // tx21's row exactly
    val labels = TextAnalysis.tx14GopherRules.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("gopher_pass")).toMap
    val model = TextAnalysis.tx20TrainClassifier.run(spark, sfDir).collect()
      .map(r => r.getLong(0).toInt -> (r.getLong(1), r.getLong(2))).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def slot(tok: String): Int = {
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 16).toInt
    }
    var (tp, fp, fn, tn) = (0L, 0L, 0L, 0L)
    graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().foreach { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        if (toks.nonEmpty) {
          val x = Array.fill(16)(0L)
          toks.foreach(t => x(slot(t)) += 1L)
          val score = (0 until 16).map { i =>
            val (w, mid) = model(i); w * (x(i) * 1000000L - mid)
          }.sum
          val (y, yhat) = (labels(r.getLong(0)), score >= 0L)
          if (y && yhat) tp += 1 else if (!y && yhat) fp += 1
          else if (y && !yhat) fn += 1 else tn += 1
        }
      }
    val ev = TextAnalysis.tx21ClassifierEval.run(spark, sfDir).collect().head
    assert((ev.getLong(1), ev.getLong(2), ev.getLong(3), ev.getLong(4)) ===
      ((tp, fp, fn, tn)))
    assert(ev.getLong(0) === tp + fp + fn + tn)
    // the student must actually have learned: beat the majority base rate
    val base = math.max(tp + fn, fp + tn).toDouble / ev.getLong(0)
    assert(ev.getDouble(5) > base,
      s"accuracy ${ev.getDouble(5)} not above base rate $base")
  }

  test("tx22: held-out rows reproduced by a driver fold trained on train only") {
    // independent refit: same md5 slots, labels from tx14, but the class
    // means come ONLY from train-split docs — every per-split confusion
    // row must match tx22 exactly, proving val/test never leak into
    // training on the engine side either
    val labels = TextAnalysis.tx14GopherRules.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("gopher_pass")).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex8(sx: String): Long = java.lang.Long.parseLong(
      md.digest(sx.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(8), 16)
    def slot(tok: String): Int = (hex8(tok) % 16).toInt
    def split(docId: Long): String = {
      val b = hex8(docId.toString) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().flatMap { r =>
        val toks = r.getString(1).split(" ").filter(_.nonEmpty)
        if (toks.isEmpty) None else {
          val x = Array.fill(16)(0L)
          toks.foreach(t => x(slot(t)) += 1L)
          Some((r.getLong(0), split(r.getLong(0)), labels(r.getLong(0)), x))
        }
      }
    val train = docs.filter(_._2 == "train")
    val np = train.count(_._3)
    val nn = train.length - np
    val w = Array.fill(16)(0L)
    val mid = Array.fill(16)(0L)
    (0 until 16).foreach { i =>
      val sp = train.filter(_._3).map(_._4(i)).sum
      val sn = train.filterNot(_._3).map(_._4(i)).sum
      val mp = math.floor(sp.toDouble * 1000000L / np).toLong
      val mn = math.floor(sn.toDouble * 1000000L / nn).toLong
      w(i) = mp - mn
      mid(i) = math.floor((mp + mn) / 2.0).toLong
    }
    val want = docs.groupBy(_._2).map { case (sp, ds) =>
      var (tp, fp, fn, tn) = (0L, 0L, 0L, 0L)
      ds.foreach { case (_, _, y, x) =>
        val score = (0 until 16).map(i => w(i) * (x(i) * 1000000L - mid(i))).sum
        if (y && score >= 0) tp += 1 else if (!y && score >= 0) fp += 1
        else if (y) fn += 1 else tn += 1
      }
      sp -> ((ds.length.toLong, tp, fp, fn, tn))
    }
    val rows = TextAnalysis.tx22HeldoutEval.run(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("test", "train", "val"))
    rows.foreach { r =>
      val (n, tp, fp, fn, tn) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) === ((n, tp, fp, fn, tn)), s"split ${r.getString(0)}")
    }
    // the held-out population partitions tx21's full population
    val total21 = TextAnalysis.tx21ClassifierEval.run(spark, sfDir)
      .collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum === total21)
  }

  test("tx19: tf-idf matches hand computation on a crafted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfidf").toString
    // 'cat' in 1/3 docs (idf ln 3), 'the' in all (idf 0), 'dog' in 2/3
    Seq(
      (1L, "the cat cat sat", "en", "t", 0L),
      (2L, "the dog ran", "en", "t", 0L),
      (3L, "the dog dog slept", "en", "t", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val got = TextAnalysis.tx19TfidfKeywords.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val doc1 = got.filter(_._1 == 1L)
    // doc 1: cat tf=2 idf=ln(3) tops; sat tf=1 idf=ln(3); the tf=1 idf=0
    assert(doc1.map(t => (t._2, t._3, t._4, t._5)).toSeq === Seq(
      (1, "cat", 2L, r4(2 * math.log(3.0))),
      (2, "sat", 1L, r4(math.log(3.0))),
      (3, "the", 1L, 0.0)))
    // top-5 cap: no doc emits more than 5 keywords, ranks are 1..k
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.length))
    }
  }
}
