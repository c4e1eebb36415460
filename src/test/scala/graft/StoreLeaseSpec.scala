package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tables.StoreLease

/** The shared writer-lease's liveness contract, round-14 hardening:
  * the holder's declared TTL travels IN the lock (third token), so
  * every judge that reads someone ELSE's lock — canMaintain's sweep
  * allowance, assertStillHeld's unleased-write guard — honors a
  * non-default lease instead of declaring it dead at the 15-minute
  * default; and a corrupt (≥4-token) lock fails SAFE instead of
  * parsing as instantly stale and breakable. */
class StoreLeaseSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-lease").toString +
      "/store"

  private def writeLockFile(path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + ".lock")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.writeBytes(content)
    out.close()
  }

  test("a long-TTL holder between renews stays LIVE to every judge: " +
      "canMaintain stays false and an unleased write is refused, even " +
      "past the 15-minute default") {
    val path = freshPath()
    // a holder that declared a 2h TTL, last heartbeat 20 min ago — the
    // arrival pass's lease shape between renews
    val hb = System.currentTimeMillis() - 20 * 60 * 1000L
    writeLockFile(path, s"holder-uuid $hb ${2 * 60 * 60 * 1000L}\n")
    val observer = new StoreLease(spark, path, "test store")
    assert(!observer.canMaintain,
      "a live long-TTL lease must block maintenance sweeps")
    val e = intercept[IllegalStateException](observer.assertStillHeld())
    assert(e.getMessage.contains("leased to writer holder-uuid"))
    // the same heartbeat age under the DEFAULT declaration is stale:
    // maintenance unblocks and an unleased write is allowed
    writeLockFile(path, s"holder-uuid $hb ${StoreLease.DefaultTtlMs}\n")
    assert(observer.canMaintain)
    observer.assertStillHeld() // no throw
  }

  test("a corrupt >=4-token lock fails SAFE (recent mtime = live): " +
      "not breakable, not maintainable — the old instantly-stale " +
      "sentinel let a torn write on a live holder's lock be usurped") {
    val path = freshPath()
    writeLockFile(path, "garbage torn write tokens everywhere\n")
    val breaker = new StoreLease(spark, path, "test store")
    // mtime is NOW, so under the default TTL the lock reads live
    assert(!breaker.canMaintain)
    val e = intercept[IllegalStateException](breaker.acquire())
    assert(e.getMessage.contains("is leased to writer"))
  }

  test("acquire()'s stale-break patience honors the HOLDER's declared " +
      "TTL: a default-TTL acquirer cannot break a live 2h-lease holder " +
      "20 minutes after its last heartbeat (round-14 advice), but a " +
      "genuinely lapsed long lease IS breakable") {
    val path = freshPath()
    val hb = System.currentTimeMillis() - 20 * 60 * 1000L
    writeLockFile(path, s"holder-uuid $hb ${2 * 60 * 60 * 1000L}\n")
    val breaker = new StoreLease(spark, path, "test store")
    // patience = max(breaker's default 15 min, the lock's declared 2 h)
    val e = intercept[IllegalStateException](breaker.acquire())
    assert(e.getMessage.contains("leased to writer holder-uuid"),
      e.getMessage)
    // past the HOLDER's OWN declaration the lease is dead — breakable
    val lapsed = System.currentTimeMillis() - 3 * 60 * 60 * 1000L
    writeLockFile(path, s"holder-uuid $lapsed ${2 * 60 * 60 * 1000L}\n")
    breaker.acquire()
    breaker.release()
  }

  test("acquire writes the declared TTL into the lock; renew keeps it") {
    val path = freshPath()
    val holder = new StoreLease(spark, path, "test store")
    holder.acquire(ttlMs = 60 * 60 * 1000L)
    try {
      holder.renew()
      val p = new org.apache.hadoop.fs.Path(path + ".lock")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString finally in.close()
      val toks = txt.trim.split("\\s+")
      assert(toks.length === 3, txt)
      assert(toks(2) === (60 * 60 * 1000L).toString, txt)
    } finally holder.release()
  }
}
