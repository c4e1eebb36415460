package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinhashSig, Shingles}
import graft.pipeline.Dedup

/** The MinhashSig kernel must be bit-identical to BOTH the declarative
  * array_min(transform(... md5 ...)) spelling it replaces and the batch
  * explode+groupBy signature (duplicate-insensitive md5 mins). */
class MinhashSigSpec extends AnyFunSuite {
  import SparkTestSession._

  test("kernel equals the declarative HOF spelling per row") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "a  b", "dup dup dup dup",
      "héllo wörld déjà vu héllo wörld",
      (0 until 200).map(i => s"w${i % 37}").mkString(" "))
    val df = texts.toDF("text")
      .select(Shingles.distinctBigramsCol(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
    val decl = (0 until 8).map(k => expr(
      s"""array_min(transform(sh, t -> md5(concat('$k', '|', t))))"""
    ).as(s"d$k"))
    val rows = df.select(
        (MinhashSig.sigCol(col("sh")).as("ms") +: decl): _*)
      .collect()
    rows.foreach { r =>
      val ks = r.getSeq[String](0)
      assert(ks.length === 8)
      (0 until 8).foreach(k => assert(ks(k) === r.getString(k + 1)))
    }
  }

  test("per-row signature equals the batch explode+groupBy signature") {
    val docs = graft.tables.Tables.documents(spark, sfDir)
    val batch = Dedup.minhashSig(docs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val perRow = Dedup.minhashSigPerRow(docs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    assert(perRow === batch)
  }
}
