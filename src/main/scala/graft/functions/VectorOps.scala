package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns,
  * accumulated in double.
  *
  * This is the hot kernel of every vector operator (similarity search,
  * embedding dedup): it runs once per CANDIDATE PAIR, i.e. O(n·k) to
  * O(n²) times per query. Spark has no built-in dot product; the
  * higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates an intermediate array and interprets two lambdas per row —
  * ~100× slower than this expression, which participates in whole-stage
  * codegen as a primitive float loop (SURVEY.md §2.12: custom Expression
  * reserved for exactly the north-star vector path).
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  // ExpectsInputTypes is unusable outside Spark (AbstractDataType is
  // private[sql]) — validate manually so array<double>/array<int> inputs
  // fail analysis instead of silently reinterpreting bytes.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val want = ArrayType(FloatType)
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ${want.simpleString} arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i).toDouble * y(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |int $n = Math.min($x.length, $y.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $x[$i] * (double) $y[$i];
         |}
         |${ev.value} = $s;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level vector helpers built on [[FloatDot]]. */
object VectorOps {

  /** Dot product of two `array<float>` columns (double result). */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** L2 norm of an `array<float>` column. */
  def norm(a: Column): Column = sqrt(dot(a, a))
}
