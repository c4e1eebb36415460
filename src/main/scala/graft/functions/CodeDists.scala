package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Integer-exact squared-L2 distance structs against a LITERAL centroid
  * table — the codegen'd kernel form of
  * `transform(array(<centroid structs>), c -> struct(
  *    aggregate(zip_with(qv, c.c, (x,y) -> (x-y)*(x-y)), 0L, (a,x) -> a+x)
  *    AS dist2, c.cluster AS cluster))`.
  *
  * Returns the SAME `ARRAY<STRUCT<dist2: BIGINT, cluster: INT>>` in the
  * same centroid order, so every downstream consumer — `array_min` for
  * the Lloyd assignment (struct comparison is lexicographic: (dist2,
  * cluster), the oracle's exact tiebreak), `array_sort`+`slice` for the
  * multi-probe ranking, `explode` for the PQ distance frame — is
  * untouched.
  *
  * Why a kernel: the HOF spelling evaluates k·dims interpreted lambda
  * calls per row, per Lloyd pass (k=8..16, dims=8..64, 3 passes per
  * trainer, several trainers per query chain) — the same ~µs-per-element
  * expression-eval overhead the Shingles kernel removed from the dedup
  * chains, here sitting inside every sim07/sim08/sim09/dd09 assignment.
  * The kernel is a tight long-arithmetic loop inside whole-stage codegen
  * (centroids ride along as a plan reference object, k·dims longs).
  */
object CodeDists {

  private val elemType = StructType(Seq(
    StructField("dist2", LongType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))

  private[functions] val arrayType =
    ArrayType(elemType, containsNull = false)

  /** Static kernel: distances of `qv` against every centroid, in order. */
  def l2(qv: ArrayData, clusters: Array[Int],
      cents: Array[Array[Long]]): ArrayData = {
    val q = qv.toLongArray()
    val out = new Array[Any](cents.length)
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var s = 0L
      var j = 0
      while (j < q.length) { val d = q(j) - c(j); s += d * d; j += 1 }
      out(i) = new GenericInternalRow(Array[Any](s, clusters(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Static kernel, per-subspace form: codebook `sub` picked per row. */
  def l2Sub(qv: ArrayData, sub: Int, clusters: Array[Array[Int]],
      cents: Array[Array[Array[Long]]]): ArrayData =
    l2(qv, clusters(sub), cents(sub))

  /** Column form: distance structs of an ARRAY<BIGINT> code column
    * against one literal codebook (cluster id, centroid) list. */
  def l2Col(qv: Column, centroids: Seq[(Int, Array[Long])]): Column =
    GraftSqlBridge.column(L2CodeDists(GraftSqlBridge.expression(qv),
      centroids.map(_._1).toIndexedSeq,
      centroids.map(_._2.toIndexedSeq).toIndexedSeq))

  /** Column form: per-subspace codebooks, selected by the `sub` column
    * (0-based) — the PQ trainer's shape. */
  def l2SubCol(qv: Column, sub: Column,
      codebooks: Seq[Seq[(Int, Array[Long])]]): Column =
    GraftSqlBridge.column(PqCodeDists(GraftSqlBridge.expression(qv),
      GraftSqlBridge.expression(sub),
      codebooks.map(_.map(_._1).toIndexedSeq).toIndexedSeq,
      codebooks.map(_.map(_._2.toIndexedSeq).toIndexedSeq).toIndexedSeq))

  /** Static kernel: squared-L2 between two code vectors — the pairwise
    * form (both sides are columns, e.g. a probe row against a cell
    * row), same tight long loop as [[l2]]. */
  def l2Pair(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    var s = 0L
    var i = 0
    while (i < x.length) { val d = x(i) - y(i); s += d * d; i += 1 }
    s
  }

  /** Column form of [[l2Pair]] — the ranking metric of the store-backed
    * IVF search (exact integer arithmetic: engines and runs can never
    * disagree on an ordering). */
  def l2PairCol(a: Column, b: Column): Column =
    GraftSqlBridge.column(L2CodePair(GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))
}

/** Catalyst wrapper for [[CodeDists.l2]]. Centroids are Seq-typed fields
  * so plan equality stays structural. */
case class L2CodeDists(child: Expression, clusters: IndexedSeq[Int],
    cents: IndexedSeq[IndexedSeq[Long]]) extends UnaryExpression {
  require(clusters.length == cents.length,
    "one cluster id per centroid row")

  @transient private lazy val clArr = clusters.toArray
  @transient private lazy val ctArr = cents.map(_.toArray).toArray

  override def dataType: DataType = CodeDists.arrayType
  override def prettyName: String = "l2_code_dists"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
    }
  }

  override def nullSafeEval(qv: Any): Any =
    CodeDists.l2(qv.asInstanceOf[ArrayData], clArr, ctArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cl = ctx.addReferenceObj("clusters", clArr, "int[]")
    val ct = ctx.addReferenceObj("cents", ctArr, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CodeDists.l2($c, $cl, $ct);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Catalyst wrapper for [[CodeDists.l2Pair]]: exact integer squared-L2
  * between two ARRAY<BIGINT> code columns. */
case class L2CodePair(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "l2_code_pair"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    CodeDists.l2Pair(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CodeDists.l2Pair($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Catalyst wrapper for [[CodeDists.l2Sub]]: left = the code slice,
  * right = the 0-based subspace id picking the codebook. */
case class PqCodeDists(left: Expression, right: Expression,
    clusters: IndexedSeq[IndexedSeq[Int]],
    cents: IndexedSeq[IndexedSeq[IndexedSeq[Long]]])
    extends BinaryExpression {
  require(clusters.length == cents.length,
    "one cluster-id list per subspace codebook")

  @transient private lazy val clArr = clusters.map(_.toArray).toArray
  @transient private lazy val ctArr =
    cents.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = CodeDists.arrayType
  override def prettyName: String = "pq_code_dists"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, INT), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  }

  override def nullSafeEval(qv: Any, sub: Any): Any =
    CodeDists.l2Sub(qv.asInstanceOf[ArrayData], sub.asInstanceOf[Int],
      clArr, ctArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cl = ctx.addReferenceObj("clusters", clArr, "int[][]")
    val ct = ctx.addReferenceObj("cents", ctArr, "long[][][]")
    nullSafeCodeGen(ctx, ev, (c, s) =>
      s"${ev.value} = graft.functions.CodeDists.l2Sub($c, $s, $cl, $ct);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
