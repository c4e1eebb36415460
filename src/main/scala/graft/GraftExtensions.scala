package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.FloatDot

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions so `spark.sql("... float_dot(a, b) ...")`
  * works (and so any SQL-generating layer — e.g. the check-command
  * builder — can embed them). Activate with:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildFloatDot(children)))
  }
}

object GraftExtensions {
  private[graft] def buildFloatDot(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : FloatDot = {
    require(children.length == 2,
      s"float_dot requires exactly 2 arguments, got ${children.length}")
    FloatDot(children(0), children(1))
  }

  /** Same registration for a session that already exists (builder
    * extensions are ignored by getOrCreate when a session is live). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftSqlBridge.registerTempFunction(spark,
      "float_dot", buildFloatDot)
}
