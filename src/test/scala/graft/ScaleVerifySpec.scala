package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-free at-scale invariant battery (graft.pipeline.ScaleVerify
  * — the correctness check for the eight chains whose DuckDB oracle
  * times out above sf0.1) must itself stay green and regression-tested:
  * this runs the full battery at sf0.01, where every invariant also has
  * the strict DuckDB gate as ground truth, so a battery bug (an
  * invariant that cannot fail, or one that fails on correct output)
  * surfaces here rather than silently at sf1. */
class ScaleVerifySpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("invariant battery: 18/18 green at sf0.01 (strict-gated scale)") {
    val results = graft.pipeline.ScaleVerify.runAll(spark,
      "/root/testdata/sf0.01")
    assert(results.size === 18)
    val failed = results.filterNot(_.pass)
    assert(failed.isEmpty,
      failed.map(r => s"${r.name}: ${r.detail}").mkString("; "))
    // the battery must actually LOOK at data — spot-check a few detail
    // strings carry nonzero universe sizes (a vacuous pass is a bug)
    val dd06 = results.find(_.name == "dd06_edge_label_consistency").get
    assert(!dd06.detail.contains("of 0 "), dd06.detail)
    val dd09 = results.find(_.name == "dd09_autok_pair_stream").get
    assert(dd09.detail.contains("pairs=") &&
      !dd09.detail.startsWith("pairs=0 "), dd09.detail)
    val fg = results.find(_.name == "forget_takedown_propagation").get
    assert(!fg.detail.contains("rows=0/0"), fg.detail)
  }
}
