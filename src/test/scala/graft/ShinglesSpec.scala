package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Shingles

/** The NGramShingles kernel must be element-for-element identical to the
  * declarative spellings it replaces:
  * `transform(sequence(0, size(l)-n), i -> array_join(slice(l, i+1, n), ' '))`
  * over `l = split(text, ' ')` (keep-empty) or
  * `l = filter(split(text, ' '), x -> x <> '')` (skip-empty, the
  * tx19/dd12/dd13 tokenization), with optional `array_distinct`. */
class ShinglesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",            // single bigram
    "one",            // 1 token -> empty
    "",               // empty text -> 1 empty token -> empty
    " ",              // two empty tokens -> one " " bigram
    "a  b",           // consecutive spaces -> empty middle token
    "a b ",           // trailing space -> trailing empty token kept
    " leading space",
    "dup dup dup dup",            // repeated bigram (distinct collapses)
    "héllo wörld déjà vu héllo wörld", // multibyte UTF-8 + repeat
    "tab\tand\nnewline stay intact",   // only 0x20 splits
  )

  private def declarative(distinct: Boolean) = {
    val base = expr(
      """CASE WHEN size(l) >= 2
        |  THEN transform(sequence(0, size(l) - 2),
        |                 i -> concat(l[i], ' ', l[i+1]))
        |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
    if (distinct) array_distinct(base) else base
  }

  private def viaSpark(distinct: Boolean): Seq[Seq[String]] = {
    import spark.implicits._
    val kernelCol =
      if (distinct) Shingles.distinctBigramsCol(col("text"))
      else Shingles.bigramsCol(col("text"))
    val rows = texts.toDF("text")
      .select(col("text"), split(col("text"), " ").as("l"))
      .select(kernelCol.as("k"), declarative(distinct).as("d"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"kernel vs declarative (distinct=$distinct)")
    }
    rows.map(_.getSeq[String](0))
  }

  test("kernel equals the declarative spelling on edge-case texts") {
    viaSpark(distinct = false)
    viaSpark(distinct = true)
  }

  test("kernel-level: slices, empties, distinct order") {
    def k(s: String, d: Boolean): Seq[String] =
      Shingles.bigrams(UTF8String.fromString(s), d)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    assert(k("a b c", d = false) === Seq("a b", "b c"))
    assert(k("one", d = false) === Seq.empty)
    assert(k("", d = false) === Seq.empty)
    assert(k(" ", d = false) === Seq(" "))         // two empty tokens
    assert(k("a  b", d = false) === Seq("a ", " b"))
    assert(k("x y x y x", d = false) === Seq("x y", "y x", "x y", "y x"))
    assert(k("x y x y x", d = true) === Seq("x y", "y x")) // first-occurrence order
  }

  test("n-gram kernel equals the declarative array_join spelling") {
    import spark.implicits._
    for (n <- Seq(2, 3, 5); skipEmpty <- Seq(false, true);
         distinct <- Seq(false, true)) {
      val tokExpr =
        if (skipEmpty) expr("filter(split(text, ' '), x -> x <> '')")
        else split(col("text"), " ")
      val base = expr(
        s"""CASE WHEN size(l) >= $n
           |  THEN transform(sequence(0, size(l) - $n),
           |                 i -> array_join(slice(l, i + 1, $n), ' '))
           |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
      val decl = if (distinct) array_distinct(base) else base
      texts.toDF("text")
        .select(col("text"), tokExpr.as("l"))
        .select(
          Shingles.ngramsCol(col("text"), n, skipEmpty, distinct)
            .as("k"),
          decl.as("d"))
        .collect().foreach { r =>
          assert(r.getSeq[String](0) === r.getSeq[String](1),
            s"n=$n skipEmpty=$skipEmpty distinct=$distinct")
        }
    }
  }

  test("randomized n-gram agreement with a JVM-string reference") {
    val rnd = new scala.util.Random(11)
    def randText(): String =
      (0 until rnd.nextInt(25)).map(_ =>
        if (rnd.nextInt(4) == 0) "" else ("wé" + rnd.nextInt(5)))
        .mkString(" ")
    for (_ <- 0 until 150; n <- Seq(2, 5); skipEmpty <- Seq(false, true)) {
      val t = randText()
      val toks0 = t.split(" ", -1).toSeq
      val toks = if (skipEmpty) toks0.filter(_.nonEmpty) else toks0
      // split("") = [""]: the keep-empty tokenizer always has >= 1 token
      val ref =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      def k(d: Boolean) =
        Shingles.ngrams(UTF8String.fromString(t), n, skipEmpty, d)
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
      assert(k(false) === ref, s"text=[$t] n=$n skip=$skipEmpty")
      assert(k(true) === ref.distinct, s"text=[$t] n=$n skip=$skipEmpty")
    }
  }

  test("1-grams of the skip-empty tokenizer ARE the filtered token array") {
    import spark.implicits._
    texts.toDF("text")
      .select(
        Shingles.ngramsCol(col("text"), 1, skipEmpty = true,
          distinct = false).as("k"),
        expr("filter(split(text, ' '), x -> x <> '')").as("d"))
      .collect().foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1))
      }
  }

  test("TokenStats kernel equals the filter-per-type declarative spelling") {
    import spark.implicits._
    val decl = expr("aggregate(transform(array_distinct(l), " +
      "v -> CAST(size(filter(l, x -> x = v)) AS BIGINT)), 0L, " +
      "(acc, c) -> acc + c * c)")
    texts.toDF("text")
      .select(expr("filter(split(text, ' '), x -> x <> '')").as("l"))
      .filter(size(col("l")) >= 1)
      .select(graft.functions.TokenStats.typeStatsCol(col("l")).as("ts"),
        size(array_distinct(col("l"))).cast("long").as("nt"), decl.as("ss"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) === Seq(r.getLong(1), r.getLong(2)))
      }
  }

  test("wordStats kernel equals the fold + RLIKE declarative spelling") {
    import spark.implicits._
    (texts ++ Seq("UPPER mixedCase 123 #!? ábç 漢字 a1")).toDF("text")
      .select(expr("filter(split(text, ' '), x -> x <> '')").as("l"))
      .select(graft.functions.TokenStats.wordStatsCol(col("l")).as("ws"),
        expr("aggregate(l, 0L, (a, x) -> a + length(x))").as("sl"),
        expr("size(filter(l, x -> x rlike '[A-Za-z]'))").cast("long")
          .as("na"))
      .collect().foreach { r =>
        assert(r.getSeq[Long](0) === Seq(r.getLong(1), r.getLong(2)))
      }
  }

  test("GraftExtensions.register exposes shingle_ngrams to SQL") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val got = Seq("a b c d e").toDF("text")
      .selectExpr("shingle_ngrams(text) AS bi",
        "shingle_ngrams(text, 3) AS tri",
        "shingle_ngrams(text, 2, false, true) AS dist")
      .collect().head
    assert(got.getSeq[String](0) === Seq("a b", "b c", "c d", "d e"))
    assert(got.getSeq[String](1) === Seq("a b c", "b c d", "c d e"))
    assert(got.getSeq[String](2) === Seq("a b", "b c", "c d", "d e"))
  }

  test("randomized agreement with a JVM-string reference") {
    val rnd = new scala.util.Random(7)
    def randText(): String =
      (0 until rnd.nextInt(30)).map(_ =>
        if (rnd.nextInt(5) == 0) "" else ("abé" + rnd.nextInt(6)))
        .mkString(" ")
    for (_ <- 0 until 200) {
      val t = randText()
      val toks = t.split(" ", -1)
      val ref =
        if (toks.length < 2) Seq.empty
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      def k(d: Boolean) = Shingles.bigrams(UTF8String.fromString(t), d)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(k(false) === ref, s"text=[$t]")
      assert(k(true) === ref.distinct, s"text=[$t]")
    }
  }
}
