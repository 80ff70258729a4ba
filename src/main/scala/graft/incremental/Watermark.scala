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
  *
  * Durability contract (the reference's raw overwrite has none:
  * a crash mid-rewrite loses every table's watermark): [[writeTable]]
  * stages the new CSV beside the live one and swaps it in with
  * directory renames — `live → old`, `staged → live`, drop `old` —
  * and [[readTable]] completes an interrupted swap from whichever
  * side survived. A crash at ANY point leaves either the previous or
  * the new watermark readable, never a torn/absent table; the
  * previous value merely re-reads one batch (at-least-once, the safe
  * direction). SINGLE WRITER assumed — concurrent [[update]]s
  * read-modify-write and can lose each other's rows, same as the
  * reference's design; one control table belongs to one scheduler.
  * Readers participate in recovery ([[readTable]] completes an
  * interrupted swap), so a reader racing a LIVE writer could roll
  * back its in-flight swap — serialize reads with writes under that
  * same scheduler; recovery is for crash remains, not concurrency.
  */
object Watermark {

  case class Entry(tableName: String, watermarkValue: String, updateColumn: String)

  private def stagedPath(path: String) = path.stripSuffix("/") + ".__staged__"
  private def oldPath(path: String)    = path.stripSuffix("/") + ".__old__"

  /** Complete an interrupted [[writeTable]] swap; returns the live
    * path's FileSystem for reuse. Idempotent, driver-side, O(1). */
  private def recoverSwap(spark: SparkSession, path: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(oldPath(path))
    if (!f.exists(live) && f.exists(old)) {
      // died between `live → old` and `staged → live`: roll back.
      // Hadoop rename reports most failures by RETURNING FALSE, not
      // throwing — an unchecked false here would leave no live table
      // and the caller none the wiser.
      require(f.rename(old, live), s"watermark recovery rename failed: $old -> $live")
    } else if (f.exists(old)) {
      // died before dropping `old`: the new table is live, finish
      f.delete(old, true)
    }
    // a leftover staged dir is from a crash before the swap began (or
    // mid-write): never referenced, safe to drop
    val staged = new org.apache.hadoop.fs.Path(stagedPath(path))
    if (f.exists(staged)) f.delete(staged, true)
  }

  /** Read the control CSV into memory (it is tiny by construction),
    * completing any interrupted swap first. */
  def readTable(spark: SparkSession, path: String): Seq[Entry] = {
    recoverSwap(spark, path)
    IO.readCsv(spark, path)
      .collect()
      .toSeq
      .map(r =>
        Entry(
          r.getAs[Any]("table_name").toString,
          r.getAs[Any]("watermark_value").toString,
          r.getAs[Any]("update_column").toString))
  }

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

  /** Crash-safe overwrite: stage the new CSV, then swap it live with
    * two directory renames (see the durability contract above). A
    * plain `SaveMode.Overwrite` deletes the live table before the new
    * files commit — a crash in that window loses every watermark. */
  def writeTable(spark: SparkSession, path: String, entries: Seq[Entry]): Unit = {
    import spark.implicits._
    recoverSwap(spark, path)
    val staged = stagedPath(path)
    IO.writeCsv(
      entries.toDF("table_name", "watermark_value", "update_column"),
      staged, singleFile = true)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(oldPath(path))
    // Hadoop rename reports most failures by RETURNING FALSE, not
    // throwing. Unchecked, a failed `staged -> live` after `live ->
    // old` succeeded would let the delete below destroy the LAST copy
    // of every table's watermark — the exact loss this swap protocol
    // exists to prevent. So: require each rename, and delete `old`
    // only after confirming the live path actually exists.
    if (f.exists(live))
      require(f.rename(live, old), s"watermark swap rename failed: $live -> $old")
    require(f.rename(new org.apache.hadoop.fs.Path(staged), live),
      s"watermark swap rename failed: $staged -> $live")
    require(f.exists(live), s"watermark swap left no live table at $live")
    f.delete(old, true)
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
