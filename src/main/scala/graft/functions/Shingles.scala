package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word-bigram shingles of a document in ONE byte-level pass — the
  * codegen'd kernel form of
  * `transform(sequence(0, size(l)-2), i -> concat(l[i], ' ', l[i+1]))`
  * over `l = split(text, ' ')` (optionally `array_distinct`-ed).
  *
  * Semantics are IDENTICAL to the declarative spelling (pinned by
  * ShinglesSpec against it element-for-element):
  *  - `split(text, ' ')` keeps empty tokens, including trailing ones
  *    (regex split with limit -1), so consecutive spaces contribute
  *    empty-token bigrams exactly as before;
  *  - each bigram `tok_i ⊔ ' ' ⊔ tok_{i+1}` is, by construction, the
  *    original text's byte slice from `start(tok_i)` to `end(tok_{i+1})`
  *    — the delimiter is a single 0x20 byte, which can never appear
  *    inside a multi-byte UTF-8 sequence, so the kernel just records
  *    space positions and emits slices: zero string concatenation;
  *  - `distinct = true` keeps first occurrences in order, matching
  *    `array_distinct`;
  *  - fewer than 2 tokens (a text with no space) → empty array, matching
  *    the `CASE WHEN size(l) >= 2` guard.
  *
  * Why a kernel: the higher-order-function spelling runs INTERPRETED
  * (lambda eval per element with boxed indices and a per-element concat
  * allocation) and measured ~2.2 s for sf0.1's 5k-doc corpus — ~10 µs
  * per bigram on a 1.5 MB input, pure expression-eval overhead. The
  * kernel is O(bytes) per row and stays inside whole-stage codegen, the
  * same argument as [[Winnow]]/FloatDot. At 100 TB this projection runs
  * once per corpus scan in every dedup chain, so the constant matters.
  */
object Shingles {

  /** Static kernel invoked from both interpreted eval and generated code. */
  def bigrams(s: UTF8String, distinct: Boolean): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // token boundaries: spaces at positions p0 < p1 < ... ; token i spans
    // (prev_space+1, next_space-1). A bigram is the slice between two
    // consecutive token starts' span: start(tok_i) .. end(tok_{i+1}).
    var nSpaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nSpaces += 1; i += 1 }
    if (nSpaces == 0) return new GenericArrayData(Array.empty[Any])
    // starts(j) = byte offset of token j; ends(j) = offset AFTER token j
    val nTok = nSpaces + 1
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    starts(0) = 0
    var t = 0
    i = 0
    while (i < n) {
      if (bytes(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = n
    val nBi = nTok - 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](nBi * 2)
      var j = 0
      while (j < nBi) {
        seen.add(UTF8String.fromBytes(bytes, starts(j),
          ends(j + 1) - starts(j)))
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var p = 0
      while (it.hasNext) { out(p) = it.next(); p += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](nBi)
      var j = 0
      while (j < nBi) {
        out(j) = UTF8String.fromBytes(bytes, starts(j),
          ends(j + 1) - starts(j))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Column form: all word-bigram shingles of a text column, in order. */
  def bigramsCol(c: Column): Column =
    GraftSqlBridge.column(
      ShingleBigrams(GraftSqlBridge.expression(c), distinct = false))

  /** Column form: DISTINCT word-bigram shingles (first occurrence order). */
  def distinctBigramsCol(c: Column): Column =
    GraftSqlBridge.column(
      ShingleBigrams(GraftSqlBridge.expression(c), distinct = true))
}

/** Catalyst expression wrapper: stays inside whole-stage codegen by
  * emitting a direct static call to the compiled kernel (the standard
  * pattern for kernels too large to inline as generated Java). */
case class ShingleBigrams(child: Expression, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingle_bigrams"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)
  }

  override def nullSafeEval(s: Any): Any =
    Shingles.bigrams(s.asInstanceOf[UTF8String], distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.bigrams($c, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
