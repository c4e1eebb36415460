package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HashedCounts, PairExpand, Shingles}

/** Round-8 kernels vs the declarative spellings they replaced — each
  * must be element-for-element (and ORDER-for-order, since every caller
  * explodes) identical to its higher-order-function twin.
  *
  * CharNgramsSpec / HashedCountsSpec / PairExpandSpec referenced from
  * the call-site comments all live here (one session-sharing suite —
  * they pin three kernels of the same family). */
class KernelTwinsSpec extends AnyFunSuite {
  import SparkTestSession._

  // ---- CharNgramsSpec: Shingles.charNgrams vs transform(sequence) ----

  private val triTexts = Seq(
    "hello world",
    "ab",                 // < n codepoints -> empty
    "abc",                // exactly one trigram
    "",                   // empty -> empty
    "aaaa",               // repeats (distinct collapses 'aaa','aaa')
    "héllo wörld déjà",   // 2-byte UTF-8 codepoints
    "日本語のテキスト",      // 3-byte CJK
    "mix 日本 and ascii",
    "a😀b😀a", // surrogate-pair emoji between ascii
    "  spaces  count ",
  )

  test("char_ngrams(2) equals the tx12 declarative spelling") {
    val decl = expr(
      """CASE WHEN length(text) >= 2
        |  THEN transform(sequence(1, length(text) - 1),
        |                 i -> substring(text, i, 2))
        |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
    import spark.implicits._
    triTexts.toDF("text")
      .select(
        Shingles.charNgramsCol(col("text"), 2, distinct = false).as("k"),
        decl.as("d"))
      .collect()
      .foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("char_ngrams(3) equals the tx08 declarative spelling") {
    val decl = expr(
      """CASE WHEN length(text) >= 3
        |  THEN transform(sequence(1, length(text) - 2),
        |                 i -> substring(text, i, 3))
        |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)
    import spark.implicits._
    triTexts.toDF("text")
      .select(
        Shingles.charNgramsCol(col("text"), 3, distinct = false).as("k"),
        decl.as("d"),
        Shingles.charNgramsCol(col("text"), 3, distinct = true).as("kd"),
        array_distinct(decl).as("dd"))
      .collect()
      .foreach { r =>
        assert(r.getSeq[String](0) === r.getSeq[String](1), "plain")
        assert(r.getSeq[String](2) === r.getSeq[String](3), "distinct")
      }
  }

  // ---- HashedCountsSpec: HashedCounts.counts vs the md5-slot fold ----

  test("hashed_counts equals the tx20 aggregate/transform fold") {
    val slots = 16
    val decl = expr(
      s"""aggregate(l, array_repeat(0L, $slots),
         |  (acc, t) -> transform(acc, (v, i) -> v +
         |    IF(i = cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)
         |         % $slots, 1L, 0L)))""".stripMargin)
    import spark.implicits._
    val toks = Seq(
      Seq("the", "quick", "the", "fox"),
      Seq.empty[String],
      Seq("solo"),
      Seq("héllo", "wörld", "日本語", "the", "the", "the"),
      (1 to 200).map(i => s"tok$i"), // exercises every slot
    )
    toks.toDF("l")
      .select(HashedCounts.countsCol(col("l"), slots).as("k"), decl.as("d"))
      .collect()
      .foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("hashed_counts ignores null tokens like the fold's IF(NULL)") {
    import spark.implicits._
    val withNull = Seq((1L, Seq(Some("a"), None, Some("b"))))
      .toDF("id", "l")
    val decl = expr(
      """aggregate(l, array_repeat(0L, 16),
        |  (acc, t) -> transform(acc, (v, i) -> v +
        |    IF(i = cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)
        |         % 16, 1L, 0L)))""".stripMargin)
    val r = withNull
      .select(HashedCounts.countsCol(col("l"), 16).as("k"), decl.as("d"))
      .collect().head
    assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    assert(r.getSeq[Long](0).sum === 2L) // the null contributed nothing
  }

  // ---- BottomHashes: the tx04 fingerprint kernel vs its twin ----

  test("bottom_hashes(4) equals the sort/distinct/slice md5 spelling") {
    import graft.functions.BottomHashes
    val decl = expr(
      """array_join(slice(array_sort(array_distinct(
        |  transform(sh, t -> md5(t)))), 1, 4), '|')""".stripMargin)
    import spark.implicits._
    val lists = Seq(
      Seq("a b c", "b c d", "c d e", "d e f", "e f g", "f g h"),
      Seq("one two three"),                    // fewer than k hashes
      Seq("dup x y", "dup x y", "dup x y"),    // duplicates collapse
      Seq.empty[String],                       // empty -> empty string
      (1 to 100).map(i => s"sh $i tokens"),    // eviction path exercised
      Seq("héllo wörld x", "日本 語 テキスト"),   // multibyte shingles
    )
    lists.toDF("sh")
      .select(BottomHashes.bottomKCol(col("sh"), 4).as("k"), decl.as("d"))
      .collect()
      .foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("tx15 weighted fold equals hashed_counts x literal-weight dot") {
    // the per-token fold and the counts-then-dot factorization must agree
    // exactly: sum over tokens of w[slot(t)] = sum over slots c[s]*w[s]
    import spark.implicits._
    val fold = expr(
      """aggregate(l, 0L, (a, x) -> a +
        |  cast(conv(substring(md5(concat('w', cast(
        |    cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint) % 256
        |  as string))), 1, 8), 16, 10) as bigint) % 1001 - 500)"""
        .stripMargin)
    val md = java.security.MessageDigest.getInstance("MD5")
    val wLit = (0 until 256).map { slot =>
      val hex = md.digest(s"w$slot".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 1001 - 500
    }.mkString("array(", "L,", "L)")
    val toks = Seq(
      Seq("the", "quick", "fox", "the"),
      (1 to 500).map(i => s"tok$i"),
      Seq("héllo", "wörld"),
    )
    toks.toDF("l")
      .withColumn("hc", graft.functions.HashedCounts
        .countsCol(col("l"), 256))
      .select(fold.as("a"),
        expr(s"""aggregate(zip_with(hc, $wLit, (c, w) -> c * w),
             0L, (a, v) -> a + v)""").as("b"))
      .collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  // ---- PairExpandSpec: three modes vs the flatten(transform) twins ----

  test("pair_expand(long) equals the flatten/slice spelling, same order") {
    val decl = expr(
      """flatten(transform(ids, (x, i) ->
        |  transform(slice(ids, i + 2, size(ids)),
        |    y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin)
    import spark.implicits._
    val idLists = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(5L, 9L),
      Seq(7L),
      Seq.empty[Long],
      (1L to 40L).toSeq,
    )
    idLists.toDF("ids")
      .select(PairExpand.pairsCol(col("ids")).as("k"), decl.as("d"))
      .selectExpr("transform(k, p -> concat(p.doc_a, ':', p.doc_b)) AS k",
        "transform(d, p -> concat(p.doc_a, ':', p.doc_b)) AS d")
      .collect()
      .foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("pair_expand(unseen) equals the banding filter spelling") {
    val decl = expr(
      """flatten(transform(ids, (x, i) ->
        |  filter(
        |    transform(slice(ids, i + 2, size(ids)),
        |      y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
        |                  x.prev_key = y.prev_key AS seen)),
        |    p -> NOT p.seen)))""".stripMargin)
    import spark.implicits._
    // mirrors the banding frame: sorted structs, prev_key collisions
    // suppress pairs band 0 already emitted
    val lists = Seq(
      Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "c")),
      Seq((1L, "x"), (2L, "x")), // fully suppressed -> empty
      Seq((5L, "p"), (6L, "q")),
      Seq.empty[(Long, String)],
    )
    lists.toDF("raw")
      .select(expr(
        "transform(raw, t -> struct(t._1 AS doc_id, t._2 AS prev_key))")
        .as("ids"))
      .select(PairExpand.pairsUnseenCol(col("ids")).as("k"), decl.as("d"))
      .selectExpr("transform(k, p -> concat(p.doc_a, ':', p.doc_b)) AS k",
        "transform(d, p -> concat(p.doc_a, ':', p.doc_b)) AS d")
      .collect()
      .foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  test("pair_expand(unseen): a NULL prev_key on either side drops the " +
      "pair, matching SQL null semantics of the declarative twin") {
    import spark.implicits._
    // NOT (x.prev_key = y.prev_key) is NULL when either side is NULL, and
    // filter() rejects NULL — the kernel must drop those pairs too (and
    // never NPE on the null-first element).
    val lists = Seq(
      Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option("b"))),
      Seq((4L, Option.empty[String]), (5L, Option.empty[String])),
      Seq((6L, Option.empty[String]), (7L, Option("x")), (8L, Option("y"))),
    )
    val decl = expr(
      """flatten(transform(ids, (x, i) ->
        |  filter(
        |    transform(slice(ids, i + 2, size(ids)),
        |      y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b,
        |                  x.prev_key = y.prev_key AS seen)),
        |    p -> NOT p.seen)))""".stripMargin)
    val rows = lists.toDF("raw")
      .select(expr(
        "transform(raw, t -> struct(t._1 AS doc_id, t._2 AS prev_key))")
        .as("ids"))
      .select(PairExpand.pairsUnseenCol(col("ids")).as("k"), decl.as("d"))
      .selectExpr("transform(k, p -> concat(p.doc_a, ':', p.doc_b)) AS k",
        "transform(d, p -> concat(p.doc_a, ':', p.doc_b)) AS d")
      .collect()
    rows.foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
    // and the only surviving pair is the two non-null distinct keys
    assert(rows(2).getSeq[String](0) === Seq("7:8"))
    assert(rows(1).getSeq[String](0).isEmpty)
  }

  test("pair_expand(strTagged) equals the concat pairs+markers spelling") {
    val decl = expr(
      "concat(" +
        "flatten(transform(srcs, (x, i) -> transform(" +
        "slice(srcs, i + 2, size(srcs))," +
        " y -> named_struct('src_a', x, 'src_b', y))))," +
        " transform(srcs, x -> named_struct('src_a', x, 'src_b', '')))")
    import spark.implicits._
    val lists = Seq(
      Seq("web", "books", "code"),
      Seq("web"),
      Seq.empty[String],
      Seq("a", "b", "c", "d", "e"),
    )
    lists.toDF("srcs")
      .select(PairExpand.pairsStrTaggedCol(col("srcs")).as("k"),
        decl.as("d"))
      .selectExpr("transform(k, p -> concat(p.src_a, '~', p.src_b)) AS k",
        "transform(d, p -> concat(p.src_a, '~', p.src_b)) AS d")
      .collect()
      .foreach(r => assert(r.getSeq[String](0) === r.getSeq[String](1)))
  }

  // ---- L2CodePair: pairwise integer squared-L2 vs aggregate/zip_with --

  test("l2_code_pair equals the aggregate/zip_with declarative spelling") {
    import spark.implicits._
    val rows = Seq(
      (Seq(0L, 0L, 0L), Seq(0L, 0L, 0L)),          // zero distance
      (Seq(1L, 2L, 3L), Seq(3L, 2L, 1L)),          // symmetric diffs
      (Seq(-127L, 127L, 0L), Seq(127L, -127L, 64L)), // code-range extremes
      (Seq(5L), Seq(-5L)),                          // single dim
    )
    val decl = expr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, " +
        "(s, x) -> s + x)")
    rows.toDF("a", "b")
      .select(graft.functions.CodeDists.l2PairCol(col("a"), col("b"))
          .as("k"), decl.as("d"))
      .collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }
}
