package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.DirInventory
import graft.checks.LakeChecks
import graft.tables.Tables

/** The full CheckCommand vocabulary against clean + corrupt inputs. */
class LakeChecksSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sfDir}

  private def inv = new DirInventory(spark, Map("testdb" -> sfDir))

  test("CHECKDB composes alloc + catalog + every table (ref DIC:1350)") {
    val tables = inv.objects("testdb")
    val (cmd, action) = LakeChecks.checkDb(spark, "testdb", tables,
      physicalOnly = false, dataPurity = true, maxDop = 2)
    assert(cmd ===
      "CHECKDB [testdb] WITH NO_INFOMSGS, ALL_ERRORMSGS, DATA_PURITY, MAXDOP = 2")
    assert(action() === 0L)
  }

  test("CHECKFILEGROUP validates one partition slice (ref DIC:1372-1511)") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-fg").toString + "/events"
    Tables.events(spark, sfDir)
      .withColumn("dt", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("dt").parquet(out)
    val part = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("dt=")).head.getName
    val t = graft.catalog.InventoryRow("testdb", "main", "events", "U", 1L, out)
    val (cmd, action) =
      LakeChecks.checkFileGroup(spark, t, part, dataPurity = true, maxDop = 0)
    assert(cmd.startsWith("CHECKFILEGROUP [testdb].[events].["))
    assert(action() === 0L)
    // a missing partition is a violation, not an exception
    val (_, missing) =
      LakeChecks.checkFileGroup(spark, t, "dt=1899-01-01", true, 0)
    assert(missing() === 1L)
  }

  test("check_rowcounts counts a PARTITIONED table tree fully") {
    // footer counting must recurse: a partitioned table keeps its files
    // one directory level down per partition key — a non-recursive listing
    // would silently under-report exactly this layout.
    val dir = java.nio.file.Files.createTempDirectory("graft-rc").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.filter(_ != "documents").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    }
    Tables.documents(spark, sfDir).write.partitionBy("lang")
      .parquet(s"$dir/documents.parquet")
    val got = graft.checks.Checks.checkRowcounts.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.all.map(t =>
      t -> spark.read.parquet(s"$sfDir/$t.parquet").count()).toMap
    assert(got === want)
  }

  test("FK and PK checks actually fire on violating data") {
    // the fixtures are clean, so the oracle gate only ever sees zeros —
    // prove the detectors detect: drop half the orders (orphaning their
    // lineitems) and duplicate the surviving half (breaking PK
    // uniqueness) in a mutated copy of the sf dir.
    val dir = java.nio.file.Files.createTempDirectory("graft-viol").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.filter(_ != "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val half = orders.filter(col("o_orderkey") % 2 === 0)
    half.union(half).write.parquet(s"$dir/orders.parquet")
    val fk = graft.checks.Checks.checkFkContainment.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectedOrphans = graft.tables.Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") % 2 =!= 0).count()
    assert(fk("lineitem.l_orderkey->orders") === expectedOrphans)
    assert(fk("orders.o_custkey->customer") === 0L) // customers intact
    val pk = graft.checks.Checks.checkPkUnique.run(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pk("orders") === half.count()) // every surviving key ×2
    assert(pk("customer") === 0L)
  }

  test("DATA_PURITY domain checks fire on out-of-domain rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dom").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.all.filter(_ != "lineitem").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.parquet(s"$dir/$t.parquet")
    }
    // poison 3 rows: negative quantity, enum outside {A,N,R}, year 1889
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("l_orderkey", "l_linenumber")
    val poisoned = li.withColumn("rn", row_number().over(w))
      .withColumn("l_quantity",
        when(col("rn") === 1, -5.0).otherwise(col("l_quantity")))
      .withColumn("l_returnflag",
        when(col("rn") === 2, "X").otherwise(col("l_returnflag")))
      .withColumn("l_shipdate",
        when(col("rn") === 3, lit("1889-01-01 00:00:00").cast("timestamp"))
          .otherwise(col("l_shipdate")))
      .drop("rn")
    poisoned.write.parquet(s"$dir/lineitem.parquet")
    val got = graft.checks.Checks.checkDomains.run(spark, dir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("lineitem") === ((1L, 0L, 1L, 1L))) // range, ratio, enum, ts
    assert(got("orders") === ((0L, 0L, 0L, 0L)))   // untouched table clean
  }

  test("CHECKALLOC flags a zero-byte parquet file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-alloc").toString
    val tdir = new java.io.File(s"$dir/broken.parquet")
    tdir.mkdirs()
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"${tdir.getPath}/part-0.parquet"))
    val t = graft.catalog.InventoryRow("testdb", "main", "broken", "U", 0L,
      tdir.getPath)
    val (_, action) = LakeChecks.checkAlloc(spark, "testdb", Seq(t), 0)
    assert(action() >= 1L)
  }
}
