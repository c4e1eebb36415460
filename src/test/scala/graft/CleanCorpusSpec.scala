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

  test("no two cleaned docs share an LSH bucket (near-dup removal held)") {
    val cleanedIds = CleanCorpus.cleaned(spark, sfDir).select("doc_id")
    val buckets = graft.pipeline.Dedup
      .minhashBands(graft.tables.Tables.documents(spark, sfDir)
        .join(cleanedIds, "doc_id"))
      .groupBy("band", "band_key").count().filter(col("count") > 1).count()
    assert(buckets === 0L)
  }
}
