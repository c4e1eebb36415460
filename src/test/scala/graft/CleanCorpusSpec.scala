package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.CleanCorpus

/** Invariants of the composed cleaning pipeline beyond the oracle gate. */
class CleanCorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  test("survival flags are monotone: s3 implies s2 implies s1") {
    val bad = CleanCorpus.survivalFlags(spark, sfDir)
      .filter((col("s3") && !col("s2")) || (col("s2") && !col("s1")))
      .count()
    assert(bad === 0L)
  }

  test("cleaned corpus matches pipe01's n_clean and has no exact dups") {
    val summary = CleanCorpus.pipe01CleanCorpus.run(spark, sfDir).head()
    val cleaned = CleanCorpus.cleaned(spark, sfDir)
    assert(cleaned.count() === summary.getAs[Long]("n_clean"))
    // exact dedup really held: every surviving text is unique
    val (n, distinctN) = {
      val r = cleaned.agg(count(lit(1)), countDistinct(md5(col("text")))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(n === distinctN)
  }

  test("docs with <2 tokens are counted and survive when quality passes") {
    import spark.implicits._
    // the fixture corpus has no shingle-less docs, so pin the class here:
    // a 1-token doc and an empty doc have NO bigram shingles (no minhash
    // signature row) — they must still appear in the flags frame, must not
    // be treated as near-dups of EACH OTHER, and must reach the cleaned
    // corpus when quality passes.
    val dir = java.nio.file.Files.createTempDirectory("graft-shortdoc")
      .toString
    Seq(
      (1L, "one", "en", "t", 3L), // 1 token: sig-less
      (2L, "one", "en", "t", 3L), // exact dup of 1 (sig-less too)
      (3L, "", "en", "t", 0L),    // empty: sig-less
      (4L, "the quick brown fox jumps over the lazy dog again and again",
        "en", "t", 59L),
      (5L, "the quick brown fox jumps over the lazy dog again and again",
        "en", "t", 59L)           // exact dup of 4
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val flags = CleanCorpus.survivalFlags(spark, dir)
      .select("doc_id", "s1", "s2", "s3")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(flags.keySet === Set(1L, 2L, 3L, 4L, 5L)) // nobody vanishes
    assert(flags(1L)._1 && !flags(2L)._1)  // exact dedup still applies
    assert(flags(4L)._1 && !flags(5L)._1)
    // quality of a 1-token doc: 0.4·ttr(1) + 0.3·(1/100) + 0 ≈ 0.403 ≥
    // 0.35 → s2; sig-less docs have no near-dups → s3 follows s2
    assert(flags(1L) === ((true, true, true)))
    assert(flags(3L) === ((true, true, true))) // NOT a dup of doc 1
    val cleanedIds = CleanCorpus.cleaned(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(cleanedIds.contains(1L) && cleanedIds.contains(3L))
  }

  test("cleanedStrict keeps one doc per near-dup component, within cleaned") {
    val strict = CleanCorpus.cleanedStrict(spark, sfDir)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val loose = CleanCorpus.cleaned(spark, sfDir)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    // cluster-level is a refinement: every strict survivor also survives
    // the bucket-level pass
    assert(strict.subsetOf(loose))
    // and it is exactly: every s2 doc that is its component's min (or has
    // no near-dup evidence at all)
    val flags = CleanCorpus.survivalFlags(spark, sfDir)
      .filter(col("s2")).select("doc_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    val pairs = graft.pipeline.Dedup.dd03MinhashLsh.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => flags(p._1) && flags(p._2))
    // union-find over the surviving-pair graph (same reference
    // implementation shape as DedupPropertySpec)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = flags.filter(v => find(v) == v)
    assert(strict === expected)
  }

  test("no two cleaned docs share an LSH bucket (near-dup removal held)") {
    val cleanedIds = CleanCorpus.cleaned(spark, sfDir).select("doc_id")
    val buckets = graft.pipeline.Dedup
      .minhashBands(graft.tables.Tables.documents(spark, sfDir)
        .join(cleanedIds, "doc_id"))
      .groupBy("band", "band_key").count().filter(col("count") > 1).count()
    assert(buckets === 0L)
  }

  test("pipe15: funnel chains exactly and one doc dies per stage on a crafted corpus") {
    import spark.implicits._
    val fluent = ("the quick brown fox jumps over that lazy dog " +
      "and then they have fun with friends ")
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    Seq(
      (1L, (fluent * 4).trim, "en", "t", 0L),               // survives
      (2L, (fluent * 4).trim, "en", "t", 0L),               // exact_dup
      (3L, "the cat and dog have fun with mice", "en", "t", 0L), // word_count
      (4L, ("a " * 58).trim + " the and", "en", "t", 0L),   // mean_word_len
      (5L, (fluent.trim.split(" ").take(12).mkString(" ") + " " +
        ("12345 " * 48)).trim, "en", "t", 0L),              // alpha_ratio
      (6L, (fluent.trim.split(" ").take(13).mkString(" ") + " " +
        (fluent * 3).trim + " " + ("# " * 8)).trim, "en", "t", 0L), // symbol
      (7L, ("cat " * 60).trim, "en", "t", 0L)               // stop_words
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = CleanCorpus.pipe15FilterFunnel.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows === Array(
      (1L, "exact_dup", 7L, 1L, 6L), (2L, "word_count", 6L, 1L, 5L),
      (3L, "mean_word_len", 5L, 1L, 4L), (4L, "alpha_ratio", 4L, 1L, 3L),
      (5L, "symbol_ratio", 3L, 1L, 2L), (6L, "stop_words", 2L, 1L, 1L)))
  }

  test("pipe15: on the fixture, n_in/n_out chain and stages partition the kills") {
    val rows = CleanCorpus.pipe15FilterFunnel.run(spark, sfDir).collect()
    assert(rows.length === 6)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") === b.getAs[Long]("n_in"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out")
        === r.getAs[Long]("n_in") - r.getAs[Long]("n_killed"))
    }
    val total = graft.tables.Tables.documents(spark, sfDir).count()
    assert(rows.head.getAs[Long]("n_in") === total)
    assert(rows.last.getAs[Long]("n_out")
      === total - rows.map(_.getAs[Long]("n_killed")).sum)
  }
}
