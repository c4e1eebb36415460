package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The inventory provider (SURVEY.md §7.1 step 3) — the lake analog of the
  * reference's catalog scan `sys.objects ⋈ sys.dm_db_partition_stats ⋈ …
  * SUM(used_page_count)` (ref IntegrityChecks_VLDB.sql:426-447; the comment
  * at IC:427 marks this as the user hook, so it's a trait).
  *
  * A "database" is a directory of parquet tables; `used_page_count`'s lake
  * analog is total file bytes (footer metadata only — no data scan).
  */
final case class InventoryRow(
    database_name: String,
    schema_name: String,
    object_name: String,
    object_type: String,
    used_page_count: Long, // total bytes on storage
    path: String)

trait Inventory {
  /** List databases visible to the engine (ref sys.databases, IC:288-297). */
  def databases(): Seq[String]
  /** List objects + sizes for one database (ref IC:429-441). */
  def objects(db: String): Seq[InventoryRow]
}

/** Directory-backed inventory: each registered (name -> dir) is a database;
  * each `<table>.parquet` file/dir inside is an object in schema "main". */
final class DirInventory(spark: SparkSession, dbs: Map[String, String])
    extends Inventory {

  override def databases(): Seq[String] = dbs.keys.toSeq.sorted

  override def objects(db: String): Seq[InventoryRow] = {
    val dir = dbs(db)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val size =
          if (st.isDirectory) fs.getContentSummary(st.getPath).getLength
          else st.getLen
        InventoryRow(db, "main",
          st.getPath.getName.stripSuffix(".parquet"), "U",
          size, st.getPath.toString)
      }
      .sortBy(_.object_name)
  }
}
