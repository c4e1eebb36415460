package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.executor.{CommandExecutor, CommandLog}
import graft.model.SystemClock

/** The transient-vs-hard error contract (ref ola/CommandExecute.sql:214-217:
  * deadlock/lock-timeout errors are downgraded and the run continues; the
  * lake analogs are storage throttles and connection resets). */
class CommandExecutorSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def executor(log: CommandLog) =
    new CommandExecutor(log, SystemClock, execute = true,
      maxTransientRetries = 2, retryBackoffMs = 0L)

  test("a transient blip then success records ONE clean execution") {
    val log = new CommandLog(spark, None)
    var calls = 0
    val r = executor(log).run("db", "s", "t", "TABLE", "CHECK t", "CHECK") {
      calls += 1
      if (calls == 1) throw new java.net.SocketTimeoutException("read timed out")
      0L
    }
    assert(calls === 2)
    assert(r.outcome === "Succeeded")
    assert(r.violations === 0L)
    assert(log.entries.size === 1) // no failure rows for retried attempts
    assert(log.entries.head.error_number === Some(0))
    assert(log.entries.head.extended_info.contains("\"transient_retries\": 1"))
  }

  test("exhausted transient retries log the hard 50000 failure") {
    val log = new CommandLog(spark, None)
    var calls = 0
    val r = executor(log).run("db", "s", "t", "TABLE", "CHECK t", "CHECK") {
      calls += 1
      throw new java.io.IOException("Service Unavailable (Status Code: 503)")
    }
    assert(calls === 3) // first attempt + 2 retries
    assert(r.outcome === "Failed")
    assert(r.violations === -1L) // state stays untouched; object stays due
    assert(log.entries.size === 1)
    assert(log.entries.head.error_number === Some(50000))
  }

  test("a hard error never retries") {
    val log = new CommandLog(spark, None)
    var calls = 0
    val r = executor(log).run("db", "s", "t", "TABLE", "CHECK t", "CHECK") {
      calls += 1
      throw new IllegalStateException("schema mismatch")
    }
    assert(calls === 1)
    assert(r.outcome === "Failed")
    assert(log.entries.head.error_number === Some(50000))
    assert(log.entries.head.error_message === Some("schema mismatch"))
  }

  test("violations are a check failure (8939), not a retryable condition") {
    val log = new CommandLog(spark, None)
    var calls = 0
    val r = executor(log).run("db", "s", "t", "TABLE", "CHECK t", "CHECK") {
      calls += 1; 4L
    }
    assert(calls === 1)
    assert(r.outcome === "Failed")
    assert(r.violations === 4L)
    assert(log.entries.head.error_number === Some(8939))
  }

  test("transient classification walks the cause chain; defaults are hard") {
    import CommandExecutor.isTransient
    assert(isTransient(new java.net.ConnectException("refused")))
    assert(isTransient(new RuntimeException("wrapped",
      new java.net.SocketTimeoutException("t"))))
    assert(isTransient(new java.io.IOException("please reduce your request rate: SlowDown")))
    assert(!isTransient(new java.io.IOException("file not found")))
    assert(!isTransient(new IllegalArgumentException("timeout"))) // not IO
    assert(!isTransient(new RuntimeException("corrupt footer")))
  }
}
