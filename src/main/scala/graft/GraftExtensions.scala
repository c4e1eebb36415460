package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{FloatDot, NGramShingles, WinnowFingerprint}

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
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName,
        "winnow_fingerprint"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildWinnow(children)))
    ext.injectFunction((
      new FunctionIdentifier("shingle_ngrams"),
      new ExpressionInfo(classOf[NGramShingles].getName, "shingle_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftExtensions.buildShingles(children)))
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

  private[graft] def buildWinnow(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : WinnowFingerprint = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def intArg(i: Int, default: Int): Int = children.lift(i) match {
      case None => default
      case Some(Literal(v: Int, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"winnow_fingerprint argument ${i + 1} must be an int literal, got $other")
    }
    require(children.nonEmpty && children.length <= 4,
      s"winnow_fingerprint(text[, k, w, maxPieces]) takes 1-4 arguments, " +
        s"got ${children.length}")
    WinnowFingerprint(children.head, intArg(1, 8), intArg(2, 16),
      intArg(3, 8))
  }

  /** `shingle_ngrams(text[, n, skipEmpty, distinct])` — defaults to the
    * word-bigram keep-empty non-distinct form. */
  private[graft] def buildShingles(
      children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : NGramShingles = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def intArg(i: Int, default: Int): Int = children.lift(i) match {
      case None => default
      case Some(Literal(v: Int, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"shingle_ngrams argument ${i + 1} must be an int literal, got $other")
    }
    def boolArg(i: Int, default: Boolean): Boolean = children.lift(i) match {
      case None => default
      case Some(Literal(v: Boolean, _)) => v
      case Some(other) => throw new IllegalArgumentException(
        s"shingle_ngrams argument ${i + 1} must be a boolean literal, got $other")
    }
    require(children.nonEmpty && children.length <= 4,
      s"shingle_ngrams(text[, n, skipEmpty, distinct]) takes 1-4 " +
        s"arguments, got ${children.length}")
    NGramShingles(children.head, intArg(1, 2), boolArg(2, default = false),
      boolArg(3, default = false))
  }

  /** Same registration for a session that already exists (builder
    * extensions are ignored by getOrCreate when a session is live). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftSqlBridge.registerTempFunction(spark,
      "float_dot", buildFloatDot)
    org.apache.spark.sql.GraftSqlBridge.registerTempFunction(spark,
      "winnow_fingerprint", buildWinnow)
    org.apache.spark.sql.GraftSqlBridge.registerTempFunction(spark,
      "shingle_ngrams", buildShingles)
  }
}
