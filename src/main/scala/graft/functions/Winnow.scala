package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash winnowing fingerprint (the MOSS/winnowing scheme): Rabin-
  * Karp polynomial hashes over every k-BYTE window of the document,
  * computed with the O(n) ROLLING recurrence
  * `h' = ((h − c_out·B^(k−1))·B + c_in) mod M`, then the minimum hash of
  * each w consecutive window-hashes (sliding min via a monotonic deque,
  * also O(n)), deduplicated and returned as the `maxPieces` smallest
  * minima ascending — a compact, alignment-robust document fingerprint:
  * two documents sharing any k-byte stretch of length ≥ k+w−1 share a
  * fingerprint piece regardless of where it sits in either document.
  *
  * Kernel notes:
  *  - hashes BYTES (B=257 > any byte, M=1e9+7 keeps `h·B + c` < 2^40 —
  *    exact in long arithmetic). For ASCII text the oracle reproduces the
  *    identical values per character; the byte formulation is the
  *    byte-BPE-style choice for arbitrary input.
  *  - O(n) per document and embarrassingly parallel — the per-row cost a
  *    100 TB fingerprint pass needs (the naive per-window recompute is
  *    O(n·k); an interpreted higher-order-function formulation adds a
  *    ~100× constant on top — see FloatDot's scaladoc).
  */
object Winnow {
  final val M = 1000000007L
  final val B = 257L

  /** Static kernel invoked from both interpreted eval and generated code. */
  def fingerprint(s: UTF8String, k: Int, w: Int, maxPieces: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val nh = n - k + 1
    if (nh < w) return new GenericArrayData(Array.empty[Long])
    var bk = 1L // B^(k-1) mod M
    var j = 0
    while (j < k - 1) { bk = bk * B % M; j += 1 }
    val hs = new Array[Long](nh)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < nh) {
      h = ((h - (bytes(i - 1) & 0xff) * bk % M + M) % M * B +
        (bytes(i + k - 1) & 0xff)) % M
      hs(i) = h
      i += 1
    }
    // sliding min over w hashes (monotonic deque), distinct minima
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0
    val minima = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < nh) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) minima.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Long](math.min(maxPieces, minima.size))
    val it = minima.iterator()
    var p = 0
    while (p < out.length && it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  /** Column form: winnowing fingerprint of a string column. */
  def fingerprintCol(c: Column, k: Int = 8, w: Int = 16,
      maxPieces: Int = 8): Column =
    GraftSqlBridge.column(
      WinnowFingerprint(GraftSqlBridge.expression(c), k, w, maxPieces))
}

/** Catalyst expression wrapper: stays inside whole-stage codegen by
  * emitting a direct static call to the compiled kernel (the standard
  * pattern for kernels too large to inline as generated Java). */
case class WinnowFingerprint(child: Expression, k: Int, w: Int,
    maxPieces: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1 && maxPieces >= 1,
    s"winnow_fingerprint needs positive k/w/maxPieces, got $k/$w/$maxPieces")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)
  }

  override def nullSafeEval(s: Any): Any =
    Winnow.fingerprint(s.asInstanceOf[UTF8String], k, w, maxPieces)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.fingerprint($c, $k, $w, $maxPieces);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
