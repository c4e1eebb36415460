package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fixed-scale int8 scalar quantization of a float vector — the codegen'd
  * kernel form of
  * `transform(embedding, x -> greatest(-127, least(127,
  *    floor(CAST(x AS DOUBLE) * 64.0 + 0.5))))`
  * (per-element floor-to-nearest at scale 64, clamped to ±127 — the
  * sim06/sim07/sim08/sim09 code space). Bit-identical to the declarative
  * spelling: JVM float→double widening IS Spark's cast, `math.floor` on
  * the double IS Spark's floor, and the clamp happens on the exact
  * integer. Returns BIGINT codes (the trainers' space) or their FLOAT
  * rendering (sim06's FloatDot scoring path) — each code is a small
  * integer, exact in both types.
  *
  * Why a kernel: every vector of the corpus passes through this
  * projection at the head of every similarity chain, and the HOF
  * spelling evaluates an interpreted lambda per ELEMENT (dims × corpus
  * evals) — the same overhead class Shingles/CodeDists removed.
  */
object Quantize {

  /** Static kernel: quantize to BIGINT codes. */
  def toLongs(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val q = math.floor(v.getFloat(i).toDouble * 64.0 + 0.5)
      out(i) = math.max(-127L, math.min(127L, q.toLong))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static kernel: the same codes, rendered as floats. */
  def toFloats(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val q = math.floor(v.getFloat(i).toDouble * 64.0 + 0.5)
      out(i) = math.max(-127L, math.min(127L, q.toLong)).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  def toLongsCol(c: Column): Column =
    GraftSqlBridge.column(
      QuantizeI8(GraftSqlBridge.expression(c), asFloat = false))

  def toFloatsCol(c: Column): Column =
    GraftSqlBridge.column(
      QuantizeI8(GraftSqlBridge.expression(c), asFloat = true))
}

/** Catalyst wrapper for the [[Quantize]] kernels. */
case class QuantizeI8(child: Expression, asFloat: Boolean)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(if (asFloat) FloatType else LongType, containsNull = false)

  override def prettyName: String = "quantize_i8"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT>, got ${t.simpleString}")
    }
  }

  override def nullSafeEval(v: Any): Any =
    if (asFloat) Quantize.toFloats(v.asInstanceOf[ArrayData])
    else Quantize.toLongs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (asFloat) "toFloats" else "toLongs"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Quantize.$m($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
