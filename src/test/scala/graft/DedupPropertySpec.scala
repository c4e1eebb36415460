package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Property-based hardening of the distributed connected-components
  * primitive: the oracle pins dd06 on the fixture graph; this pins the
  * ALGORITHM on arbitrary random graphs against a reference union-find —
  * chains, cliques, forests, isolated pairs, label-order adversaries. */
class DedupPropertySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min of component = the root under min-union
    edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
  }

  // threshold 0 forces the DISTRIBUTED pointer-jumping loop; the default
  // (2M) routes these small graphs through the driver union-find path —
  // both must agree with the reference on every graph
  test("label propagation equals union-find on random graphs (both paths)") {
    import spark.implicits._
    val genEdge: Gen[(Long, Long)] = for {
      a <- Gen.choose(0L, 39L)
      b <- Gen.choose(0L, 39L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val genGraph: Gen[List[(Long, Long)]] =
      Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, genEdge))
    val prop = Prop.forAll(genGraph) { edges =>
      val distinctPairs = edges.distinct
      val want = unionFind(distinctPairs)
      val viaDriver = Dedup.connectedComponents(
          distinctPairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaCluster = Dedup.connectedComponents(
          distinctPairs.toDF("doc_a", "doc_b"), smallGraphMaxEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      viaDriver == want && viaCluster == want
    }
    // 20 graphs — each case runs a full multi-round Spark fixpoint
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("a 30-vertex path (worst-case diameter) converges on both paths") {
    import spark.implicits._
    val chain = (0L until 29L).map(i => (i, i + 1))
    val want = (0L to 29L).map(_ -> 0L).toMap
    Seq(2000000L, 0L).foreach { thr =>
      val got = Dedup.connectedComponents(chain.toDF("doc_a", "doc_b"),
          smallGraphMaxEdges = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"threshold $thr")
    }
  }
}
