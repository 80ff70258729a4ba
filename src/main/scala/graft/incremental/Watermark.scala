package graft.incremental

import graft.io.IO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark control table + incremental discovery (SURVEY §2.1
  * S10/S11, §2.2 K6, §2.10 ST2/ST3).
  *
  * The reference tracks batch-incremental progress in a single CSV
  * `(table_name, watermark_value, update_column)` that every ingest
  * task reads, filters, and rewrites
  * (dwh/ingest_click_house_incremental_load_users.py:28-46). The table
  * is O(#tables) rows, so read-modify-overwrite through the driver is
  * the right scale design — the DATA path never touches it beyond one
  * pushed-down predicate.
  *
  * Semantics kept faithful: the watermark only advances on a non-empty
  * batch (ST2), and files/folders at-or-below the watermark are never
  * re-read, i.e. late data is dropped at-most-once (ST3).
  */
object Watermark {

  case class Entry(tableName: String, watermarkValue: String, updateColumn: String)

  /** Read the control CSV into memory (it is tiny by construction). */
  def readTable(spark: SparkSession, path: String): Seq[Entry] =
    IO.readCsv(spark, path)
      .collect()
      .toSeq
      .map(r =>
        Entry(
          r.getAs[Any]("table_name").toString,
          r.getAs[Any]("watermark_value").toString,
          r.getAs[Any]("update_column").toString))

  /** S10 — scalar lookup for one table. */
  def lookup(spark: SparkSession, path: String, table: String): Option[Entry] =
    readTable(spark, path).find(_.tableName == table)

  /** K6 — advance one row and overwrite the control file. No-op when
    * `newValue` is None (empty batch; ST2). */
  def update(spark: SparkSession, path: String, table: String, newValue: Option[String]): Unit =
    newValue.foreach { v =>
      val updated = readTable(spark, path).map {
        case e if e.tableName == table => e.copy(watermarkValue = v)
        case e                         => e
      }
      writeTable(spark, path, updated)
    }

  def writeTable(spark: SparkSession, path: String, entries: Seq[Entry]): Unit = {
    import spark.implicits._
    IO.writeCsv(
      entries.toDF("table_name", "watermark_value", "update_column"),
      path, singleFile = true)
  }

  /** S2/P2 — incremental scan: rows strictly past the watermark. With a
    * parquet/JDBC source Catalyst pushes this predicate into the scan,
    * which is exactly the reference's `WHERE {col} > '{wm}'` pushdown. */
  def incrementalScan(df: DataFrame, updateColumn: String, watermark: String): DataFrame =
    df.filter(col(updateColumn) > lit(watermark).cast(df.schema(updateColumn).dataType))

  /** A2 — next watermark value = max(updateColumn) of the batch; None
    * when the batch is empty. */
  def nextWatermark(batch: DataFrame, updateColumn: String): Option[String] = {
    val r = batch.agg(max(col(updateColumn)).cast("string")).head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  /** S11 — file-time incremental discovery
    * (dwh/preprocessing_streaming_incremental_load.py:50-77): dated
    * folders named yyyyMMdd compared as strings against the watermark
    * date, then per-file `yyyyMMddHHmmss` name prefixes against the
    * full watermark; surviving files sorted ascending. Listing is
    * driver-side metadata (same as any file-source discovery); the
    * data read stays distributed.
    */
  def discoverFiles(
      spark: SparkSession,
      base: String,
      watermark: String // yyyyMMddHHmmss
  ): Seq[String] = {
    val wmDate = watermark.take(8)
    IO.listChildren(spark, base)
      .filter(_ >= wmDate)
      .flatMap { day =>
        IO.listChildren(spark, s"$base/$day")
          .filter { f =>
            val stamp = f.takeWhile(_.isDigit)
            stamp.length == 14 && stamp > watermark
          }
          .map(f => s"$base/$day/$f")
      }
      .sorted
  }
}
