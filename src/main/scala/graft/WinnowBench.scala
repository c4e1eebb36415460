package graft

/** Micro-gauge for the winnowing fingerprint kernel (round-18 verdict
  * #4's "kernel micro-A/B"): synthesizes a deterministic corpus on the
  * driver — no Spark session, no I/O, nothing but the kernel — and
  * times `Winnow.fingerprint` at the two production parameter points
  * (tx07/dd08's bounded maxPieces=8 and winnowPairs' unbounded
  * Int.MaxValue). `runMain graft.WinnowBench [nDocs] [docLen]`. The
  * pieces checksum is printed so an A/B across kernel versions also
  * cross-checks output equivalence on the same seeded corpus. */
object WinnowBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val len = args.lift(1).map(_.toInt).getOrElse(2000)
    val rnd = new java.util.Random(42)
    val docs = Array.fill(nDocs) {
      val sb = new StringBuilder(len)
      var i = 0
      while (i < len) { sb.append(('a' + rnd.nextInt(27)).toChar); i += 1 }
      org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
    }
    for (mp <- Seq(8, Int.MaxValue); rep <- 1 to 4) {
      val t0 = System.nanoTime()
      var pieces = 0L
      var sum = 0L
      var i = 0
      while (i < docs.length) {
        val a = graft.functions.Winnow.fingerprint(docs(i), 8, 16, mp)
        pieces += a.numElements()
        var j = 0
        while (j < a.numElements()) { sum += a.getLong(j); j += 1 }
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"winnowbench mp=$mp rep=$rep docs=$nDocs len=$len " +
        f"sec=$dt%.3f pieces=$pieces sum=$sum")
    }
  }
}
