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

/** One pinned storage unit of a table's per-run file manifest. */
final case class PinnedFile(path: String, length: Long)

/** The per-run FILE MANIFEST for one table — the lake analog of the
  * reference's snapshot device (ref IntegrityChecks_VLDB.sql:519-571,
  * SURVEY §4 snapshot row): the object/file universe is LISTED ONCE per
  * run at inventory time, and every check phase reports against that
  * pinned set. Without it, CHECKALLOC (phase 1) and CHECKTABLE (phase 2)
  * each re-list the live directory and can disagree about the same table
  * within one run whenever a concurrent writer lands a file in between. */
final case class TableManifest(isDir: Boolean, files: Seq[PinnedFile]) {
  def paths: Seq[String] = files.map(_.path)
}

object TableManifest {
  /** One listing, metadata-only (no data scan): the dir's *.parquet files
    * with their lengths, or the single file itself. A vanished table pins
    * an EMPTY manifest — checks report it missing, exactly as the
    * reference reports a dropped snapshot member. */
  def capture(spark: org.apache.spark.sql.SparkSession,
      row: InventoryRow): TableManifest = {
    val p = new Path(row.path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) TableManifest(isDir = false, Seq.empty)
    else {
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        TableManifest(isDir = true,
          fs.listStatus(p).toSeq.filter(_.isFile)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .sortBy(_.getPath.getName)
            .map(f => PinnedFile(f.getPath.toString, f.getLen)))
      else TableManifest(isDir = false,
        Seq(PinnedFile(st.getPath.toString, st.getLen)))
    }
  }
}

trait Inventory {
  /** List databases visible to the engine (ref sys.databases, IC:288-297). */
  def databases(): Seq[String]
  /** List objects + sizes for one database (ref IC:429-441). */
  def objects(db: String): Seq[InventoryRow]
  /** Pin one table's file manifest for this run (ref IC:519-571). The
    * scheduler calls this exactly once per object per run, right after
    * the inventory scan; overridable so providers with their own listing
    * transaction (e.g. a table-format snapshot) can supply it. */
  def manifest(spark: org.apache.spark.sql.SparkSession,
      row: InventoryRow): TableManifest = TableManifest.capture(spark, row)
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
