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
}
