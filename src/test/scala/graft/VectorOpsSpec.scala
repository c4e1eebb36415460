package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps

class VectorOpsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  test("FloatDot matches manual dot product (codegen path)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(VectorOps.dot(col("a"), col("b"))).as[Double].collect()
    assert(got(0) === 1.0 * 4 + 2 * 5 + 3 * 6)
    assert(got(1) === 0.5 * 2 + -1.5 * 2)
  }

  test("FloatDot matches the interpreted HOF formulation on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = df
      .select(abs(VectorOps.dot(col("embedding"), col("embedding")) - hof)
        .as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diff < 1e-9)
  }

  test("FloatDot is null-safe and norm is sqrt(self-dot)") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Array(3.0f, 4.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val row = df.select(
      VectorOps.norm(col("a")), VectorOps.dot(col("a"), col("b"))).head
    assert(row.getDouble(0) === 5.0)
    assert(row.isNullAt(1))
  }

  test("GraftExtensions.register exposes float_dot to SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head.getDouble(0)
    assert(got === 11.0)
  }

  test("sim06: quantized scores are exact integer dots (driver recompute)") {
    // the float[] codes + double accumulator must BE integer arithmetic:
    // recompute every (query, neighbor) score with BigInt math and demand
    // equality, not tolerance
    val d = SparkTestSession.sfDir
    val got = pipeline.Similarity.sim06QuantizedTopK.run(spark, d)
      .select("query_id", "neighbor_id", "qscore").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def codes(v: Seq[Float]): Array[Long] = v.map { x =>
      math.max(-127L, math.min(127L, math.floor(x.toDouble * 64.0 + 0.5).toLong))
    }.toArray
    val vecs = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> codes(r.getSeq[Float](1))).toMap
    assert(got.nonEmpty)
    got.foreach { case ((q, n), s) =>
      val exact = vecs(q).zip(vecs(n)).map { case (a, b) => a * b }.sum
      assert(s === exact, s"qscore($q,$n)")
    }
  }

  test("zero-norm vectors yield NULL cosine, not an ANSI divide error") {
    // Spark 4 defaults spark.sql.ansi.enabled=true, where even double
    // division by zero THROWS — a single all-zero embedding (a failed
    // encoder output, inevitable at real corpus scale) must degrade to
    // NULL (dropped by every rank/filter), never kill the job
    val s2 = spark
    import s2.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        graft.pipeline.Similarity.cosine(
          col("a.embedding"), col("b.embedding")).as("c"))
      .collect()
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) ->
      Option(r.get(2))).toMap
    assert(m((1L, 2L)).isEmpty && m((2L, 2L)).isEmpty) // zero side → NULL
    assert(m((1L, 3L)).exists(v => math.abs(
      v.asInstanceOf[Double] - 0.6) < 1e-6))
  }

  test("FloatDot rejects non-float arrays at analysis time") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VectorOps.dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("float"))
  }

  test("sim10: range result is exactly the brute-force pairs above the radius") {
    import graft.pipeline.Similarity
    import org.apache.spark.sql.functions._
    // completeness + soundness against the same scored pair space the
    // top-k baseline uses: every returned pair clears the radius, and the
    // count matches an independent recompute (no pair silently dropped)
    val got = Similarity.sim10RangeSearch.run(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Double]("cosine") >= 0.25))
    val e = graft.tables.Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val expected = q.crossJoin(
        e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", graft.functions.StableRound.r4(
        Similarity.cosine(col("qe"), col("ce"))))
      .filter(col("cosine") >= 0.25)
      .count()
    assert(got.length.toLong === expected)
  }

  test("sim11: picks equal a reference greedy MMR over the same rounded scores") {
    import graft.pipeline.Similarity
    // driver-side reference implementation of the unrolled relational
    // greedy: same rounded cosines, same λ, same tiebreaks — the query
    // must agree pick for pick
    val vecs = graft.tables.Tables.embeddings(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    def cos(a: Long, b: Long) = {
      val (va, vb) = (vecs(a), vecs(b))
      r4(dot(va, vb) / (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))))
    }
    // literals 0.7/0.3 exactly as both engines spell them — (1 - 0.7) is
    // 0.30000000000000004 in IEEE and would NOT reproduce the query
    val expected = vecs.keys.filter(_ < 10).toSeq.sorted.flatMap { q =>
      val cand = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cos(q, c)))
        .sortBy { case (c, rel) => (-rel, c) }
        .take(8)
      val picks = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
      picks += cand.head
      (2 to 3).foreach { _ =>
        val best = cand.filterNot(c => picks.exists(_._1 == c._1))
          .map { case (c, rel) =>
            val pen = picks.map(p => cos(c, p._1)).max
            (c, rel, 0.7 * rel - 0.3 * pen)
          }
          .minBy { case (c, _, score) => (-score, c) }
        picks += ((best._1, best._2))
      }
      picks.zipWithIndex.map { case ((c, rel), i) => (q, i + 1, c, rel) }
    }.toSet
    val got = Similarity.sim11MmrTopK.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
  }

  test("sim12: verdicts equal a reference top-5 majority vote") {
    import graft.pipeline.Similarity
    val rows = graft.tables.Tables.embeddings(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val vecs = rows.map(r => r._1 -> r._2).toMap
    val labels = rows.map(r => r._1 -> r._3).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val expected = vecs.keys.filter(_ < 50).toSeq.sorted.map { q =>
      val top5 = vecs.keys.filter(_ != q).toSeq
        .map { c =>
          val (vq, vc) = (vecs(q), vecs(c))
          (c, r4(dot(vq, vc) /
            (math.sqrt(dot(vq, vq)) * math.sqrt(dot(vc, vc)))))
        }
        .sortBy { case (c, rel) => (-rel, c) }.take(5)
      val pred = top5.groupBy(p => labels(p._1))
        .map { case (l, ps) => (l, ps.size) }.toSeq
        .minBy { case (l, v) => (-v, l) }._1
      (q, labels(q), pred, labels(q) == pred)
    }.toSet
    val got = Similarity.sim12KnnClassify.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
      .toSet
    assert(got === expected)
  }
}
