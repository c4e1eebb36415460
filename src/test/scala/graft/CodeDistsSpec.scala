package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CodeDists

/** The CodeDists kernel must be element-for-element identical to the
  * declarative spelling it replaced in the Lloyd/PQ assignment passes:
  * `transform(array(<centroid structs>), c -> struct(
  *    aggregate(zip_with(qv, c.c, (x,y)->(x-y)*(x-y)), 0L, (a,x)->a+x),
  *    c.cluster))` — including centroid ORDER (downstream array_min /
  * array_sort depend on the lexicographic (dist2, cluster) layout). */
class CodeDistsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val rnd = new scala.util.Random(13)

  private def declarative(qv: org.apache.spark.sql.Column,
      centroids: Seq[(Int, Array[Long])]): org.apache.spark.sql.Column =
    transform(
      array(centroids.map { case (cl, c) =>
        struct(typedLit(c.toSeq).as("c"), lit(cl).as("cluster"))
      }: _*),
      c => struct(
        aggregate(zip_with(qv, c.getField("c"),
          (x, y) => (x - y) * (x - y)), lit(0L), (a, x) => a + x)
          .as("dist2"),
        c.getField("cluster").as("cluster")))

  test("kernel equals the declarative HOF spelling, including order") {
    import spark.implicits._
    val dims = 16
    val cents: Seq[(Int, Array[Long])] = Seq(3, 0, 7, 5).map(cl =>
      cl -> Array.fill(dims)(rnd.nextInt(255).toLong - 128))
    val vecs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(dims)(rnd.nextInt(255).toLong - 128)))
    val df = vecs.toDF("vec_id", "qv")
    val rows = df.select(
        CodeDists.l2Col(col("qv"), cents).as("k"),
        declarative(col("qv"), cents).as("d"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0)
        === r.getSeq[org.apache.spark.sql.Row](1))
    }
    // and downstream argmin semantics: array_min picks (dist2, cluster)
    val mins = df.select(
        array_min(CodeDists.l2Col(col("qv"), cents))
          .getField("cluster").as("k"),
        array_min(declarative(col("qv"), cents))
          .getField("cluster").as("d"))
      .collect()
    mins.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("per-subspace kernel picks the right codebook per row") {
    import spark.implicits._
    val m = 4
    val subDim = 4
    val books: Seq[Seq[(Int, Array[Long])]] = (0 until m).map(sb =>
      (0 until 3).map(cl =>
        cl -> Array.fill(subDim)(rnd.nextInt(100).toLong - 50)))
    val rows = (0 until 40).map { i =>
      (i.toLong, i % m, Seq.fill(subDim)(rnd.nextInt(100).toLong - 50))
    }
    val df = rows.toDF("vec_id", "sub", "sv")
    val got = df.select(col("vec_id"), col("sub"),
        CodeDists.l2SubCol(col("sv"), col("sub"), books).as("k"))
      .collect()
    got.foreach { r =>
      val sub = r.getInt(1)
      val sv = rows(r.getLong(0).toInt)._3
      val want = books(sub).map { case (cl, c) =>
        (sv.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cl)
      }
      val ks = r.getSeq[org.apache.spark.sql.Row](2)
        .map(x => (x.getLong(0), x.getInt(1)))
      assert(ks === want)
    }
  }

  test("quantize kernel equals the declarative floor/clamp spelling") {
    import spark.implicits._
    val edge = Seq(
      Seq(0.0f, -0.5f, 0.5f, 1.9844f, -1.9844f, 2.5f, -2.5f,
        0.0078125f, -0.0078125f, 100f, -100f, 1.0f / 128f),
      Seq.tabulate(64)(i => (i - 32) * 0.0625f))
    val rnd = new scala.util.Random(5)
    val vecs = edge ++ (0 until 30).map(_ =>
      Seq.fill(16)(rnd.nextFloat() * 4 - 2))
    val df = vecs.toDF("embedding")
    val declL = expr("transform(embedding, x -> CAST(greatest(-127, " +
      "least(127, floor(CAST(x AS DOUBLE) * 64.0 + 0.5))) AS BIGINT))")
    val declF = expr("transform(embedding, x -> CAST(greatest(-127, " +
      "least(127, floor(CAST(x AS DOUBLE) * 64.0 + 0.5))) AS FLOAT))")
    df.select(graft.functions.Quantize.toLongsCol(col("embedding")).as("k"),
        declL.as("d")).collect()
      .foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    df.select(graft.functions.Quantize.toFloatsCol(col("embedding")).as("k"),
        declF.as("d")).collect()
      .foreach(r => assert(r.getSeq[Float](0) === r.getSeq[Float](1)))
  }

  test("tie-break: equal dist2 resolves by cluster id via struct order") {
    import spark.implicits._
    // two identical centroids with different ids -> equal dist2; the
    // lexicographic struct min must pick the smaller cluster id
    val c = Array.fill(4)(1L)
    val cents = Seq(5 -> c, 2 -> c.clone())
    val got = Seq((1L, Seq(2L, 2L, 2L, 2L))).toDF("vec_id", "qv")
      .select(array_min(CodeDists.l2Col(col("qv"), cents))
        .getField("cluster"))
      .collect().head.getInt(0)
    assert(got === 2)
  }
}
