package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, TrainingData}

/** Invariants of the corpus-preparation operators beyond the oracle gate:
  * the oracle pins VALUES at one sf; these pin the structural properties
  * that must hold on any corpus. */
class TrainingDataSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dd06 clusters: label is the component min and endpoints agree") {
    val clusters = Dedup.dd06DupClusters.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every cluster id is itself a member and the minimum of its members
    val byCluster = clusters.toSeq.groupBy(_._2).view.mapValues(_.map(_._1))
    byCluster.foreach { case (cid, members) =>
      assert(members.min === cid,
        s"cluster $cid: min member ${members.min}")
    }
    // every LSH pair's endpoints landed in the SAME cluster — the property
    // pairwise keep-min gets wrong on chains (a-b, b-c)
    val pairs = Dedup.dd03MinhashLsh.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("pipe02 split is exhaustive, disjoint, and deterministic") {
    val total = graft.tables.Tables.documents(spark, sfDir).count()
    val rows = TrainingData.pipe02TrainSplit.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("split")).toSet ===
      Set("train", "val", "test"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    // determinism: a second evaluation assigns identical counts (no RNG)
    val again = TrainingData.pipe02TrainSplit.run(spark, sfDir).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq.sorted ===
      again.map(r => (r.getString(0), r.getLong(1))).toSeq.sorted)
  }

  test("pipe03 shares sum to ~1 and weights invert shares") {
    val rows = TrainingData.pipe03MixtureWeights.run(spark, sfDir).collect()
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-2) // rounded 4dp shares
    val n = rows.length
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      val weight = r.getAs[Double]("weight")
      // weight ≈ (1/n_sources) / share, up to the 4dp rounding of both
      assert(math.abs(weight * share - 1.0 / n) < 2e-3,
        s"${r.getString(0)}: weight $weight share $share n $n")
    }
  }

  test("pipe05 chunks partition every doc's tokens exactly") {
    val docTokens = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TrainingData.pipe05PackChunks.run(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet === docTokens.keySet)
    chunks.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      assert(sorted.map(_.getAs[Long]("chunk_idx")).toSeq ===
        (0L until sorted.length.toLong))
      // full 32-token chunks except possibly the last; sizes sum to the doc
      assert(sorted.init.forall(_.getAs[Int]("chunk_tokens") == 32))
      assert(sorted.map(_.getAs[Int]("chunk_tokens")).sum === docTokens(id))
    }
  }

  test("packChunks boundary cases: empty, single, exact-multiple, runs of spaces") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""),                                  // splits to [""] → 1 token
      (2L, "one"),
      (3L, Seq.fill(32)("t").mkString(" ")),     // exactly one full chunk
      (4L, Seq.fill(33)("t").mkString(" ")),     // full chunk + 1-token tail
      (5L, Seq.fill(64)("t").mkString(" ")),     // two exact chunks
      (6L, "a  b")                               // "" token from double space
    ).toDF("doc_id", "text")
    val got = TrainingData.packChunks(docs).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getInt(2)).toSeq).toMap
    assert(got === Map(
      1L -> Seq(1), 2L -> Seq(1), 3L -> Seq(32), 4L -> Seq(32, 1),
      5L -> Seq(32, 32), 6L -> Seq(3)))
  }

  test("pipe04 flags no eval docs and only >=3-shingle overlaps") {
    val rows = TrainingData.pipe04Decontaminate.run(spark, sfDir).collect()
    assert(rows.nonEmpty) // fixture corpus has near-dups crossing the split
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 50 != 0L) // corpus side only
      assert(r.getAs[Long]("eval_id") % 50 === 0L)
      assert(r.getAs[Long]("n_shared") >= 3L)
    }
  }

  test("pipe11 plan respects the budget and the 4-epoch cap") {
    val rows = graft.pipeline.TrainingData.pipe11EpochPlan
      .run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val supply = r.getAs[Long]("n_tokens")
      val target = r.getAs[Long]("target_tokens")
      val epochs = r.getAs[Double]("epochs")
      val planned = r.getAs[Long]("planned_tokens")
      assert(epochs > 0.0 && epochs <= 4.0)
      assert(planned <= target)
      assert(planned <= 4L * supply)
      // the plan fills the target unless the cap binds
      if (epochs < 4.0) assert(planned === target)
    }
  }

  test("pipe14: temperature resample flattens the head and conserves budget") {
    val rows = TrainingData.pipe14TemperatureMix.run(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("target_docs")).sum <= total)
    rows.foreach { r =>
      assert(r.getAs[Long]("thr") <= 1000000L)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
    val head = rows.maxBy(_.getAs[Long]("n_docs"))
    val tail = rows.minBy(_.getAs[Long]("n_docs"))
    // alpha=0.5 flattening: the head language is genuinely downsampled,
    // the tail is kept in full (its sqrt-share exceeds its raw share)
    assert(head.getAs[Long]("thr") < 1000000L)
    assert(head.getAs[Long]("n_sampled") < head.getAs[Long]("n_docs"))
    assert(tail.getAs[Long]("thr") === 1000000L)
    assert(tail.getAs[Long]("n_sampled") === tail.getAs[Long]("n_docs"))
    // membership is a pure function of doc_id: a re-run samples the
    // identical counts (no RNG anywhere)
    val again = TrainingData.pipe14TemperatureMix.run(spark, sfDir).collect()
    assert(rows.map(r => (r.getString(0), r.getAs[Long]("n_sampled"))).toSeq
      === again.map(r => (r.getString(0), r.getAs[Long]("n_sampled"))).toSeq)
  }

  test("pipe16: manifest population equals the pipe15 funnel's survivors") {
    val manifest = TrainingData.pipe16TrainManifest.run(spark, sfDir).collect()
    assert(manifest.nonEmpty)
    manifest.foreach { r =>
      assert(Set("train", "val", "test")(r.getAs[String]("split")))
      assert((0L to 7L).contains(r.getAs[Long]("shard")))
      // every surviving doc has >= 50 words (the word_count gate held)
      assert(r.getAs[Long]("n_tokens") >= 50L * r.getAs[Long]("n_docs"))
    }
    // the funnel and the manifest are two views of the SAME gate: total
    // manifest docs == funnel survivors after the last stage
    val funnel = graft.pipeline.CleanCorpus.pipe15FilterFunnel
      .run(spark, sfDir).collect()
    assert(manifest.map(_.getAs[Long]("n_docs")).sum
      === funnel.last.getAs[Long]("n_out"))
  }

  test("pipe18: schedule agrees with pipe08's shards and orders by mean length") {
    // reference recompute: shard means from pipe08's own assignment
    // joined to tx03's token definition
    val shardOf = TrainingData.pipe08ShardShuffle.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val toks = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(expr("filter(split(text, ' '), x -> x != '')")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    val byShard = toks.groupBy(t => shardOf(t._1))
      .map { case (sh, ts) =>
        sh -> (ts.length.toLong, ts.map(_._2).sum)
      }
    val rows = TrainingData.pipe18CurriculumOrder.run(spark, sfDir)
      .collect()
    assert(rows.length === byShard.size)
    rows.foreach { r =>
      val (nDocs, total) = byShard(r.getLong(0))
      assert(r.getLong(1) === nDocs)
      assert(r.getLong(2) === total)
    }
    // ranks are the permutation sorting shards by unrounded mean (shard
    // tiebreak)
    val expectedOrder = byShard.toSeq
      .sortBy { case (sh, (n, tot)) => (tot.toDouble / n, sh) }
      .map(_._1)
    val gotOrder = rows.sortBy(_.getInt(4)).map(_.getLong(0)).toSeq
    assert(gotOrder === expectedOrder)
  }

  test("two-pass prefix equals the naive per-group window on skewed data") {
    // the pipe07/pipe08 recipe, property-tested beyond the fixture: a
    // skewed synthetic frame (one group holds ~80% of rows, sparse and
    // duplicate-free ids, adversarial bucket boundaries) must produce
    // bit-identical running sums and ranks under both formulations
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    val rows = (0 until 2000).map { i =>
      val g = if (rnd.nextInt(5) > 0) "hot" else s"g${rnd.nextInt(7)}"
      // sparse, shuffled, unique ids spanning several bucket widths
      (g, i.toLong * 977 % 131071, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("g", "id", "v")
    val naiveW = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df
      .withColumn("cum", sum("v").over(naiveW))
      .withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy("id")))
      .orderBy("g", "id").collect().map(_.toSeq).toSeq
    val bounds = df.agg(min("id"), max("id")).head()
    val width = math.max(1L, (bounds.getLong(1) - bounds.getLong(0)) / 7 + 1)
    val base = df.withColumn("bucket",
      floor((col("id") - bounds.getLong(0)) / width))
    val offs = base.groupBy("g", "bucket")
      .agg(sum("v").as("bv"), count(lit(1)).as("bn"))
      .withColumn("voff",
        sum("bv").over(Window.partitionBy("g").orderBy("bucket"))
          - col("bv"))
      .withColumn("noff",
        sum("bn").over(Window.partitionBy("g").orderBy("bucket"))
          - col("bn"))
      .select("g", "bucket", "voff", "noff")
    val lw = Window.partitionBy("g", "bucket").orderBy("id")
    val twoPass = base
      .withColumn("lcum", sum("v").over(
        lw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lrk", row_number().over(lw))
      .join(broadcast(offs), Seq("g", "bucket"))
      .select(col("g"), col("id"), col("v"),
        (col("voff") + col("lcum")).as("cum"),
        (col("noff") + col("lrk")).cast("int").as("rk"))
      .orderBy("g", "id").collect().map(_.toSeq).toSeq
    assert(twoPass === naive)
  }

  test("pipe07 degrades to an empty result on an empty corpus, no NPE") {
    // null min/max(doc_id) must not crash the two-pass bounds collect
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    spark.createDataset(Seq.empty[(Long, String, String, String, Long)])
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    assert(TrainingData.pipe07PackBins.run(spark, dir).count() === 0L)
  }
}
