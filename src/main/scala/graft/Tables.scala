package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md) plus the reference-entity
  * mapping (FIXTURES.md §mapping): `events` plays browsinghistory /
  * ProblemLog, `customer` plays users, `part` the exercise dim.
  *
  * The events parquet carries TIMESTAMP(NANOS) which Spark's vectorized
  * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read the column
  * as raw nanos (`spark.sql.legacy.parquet.nanosAsLong`) and convert to
  * a microsecond TimestampType with integer arithmetic — `ts div 1000`
  * stays exact on Long where a double division would lose precision
  * above 2^53 ns. DuckDB truncates ns→us the same way, so derived
  * values hash-match the oracle.
  */
object Tables {

  private def path(dir: String, t: String) = s"$dir/$t.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** events with `ts` as a proper microsecond timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(path(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** events mapped onto the reference's browsinghistory shape
    * (reference column order fixed at
    * dwh/preprocessing_streaming_incremental_load.py:143-145):
    * entry_id, pageview_count, timestamp-second, title, url, user_id,
    * visible_content — all derived deterministically so the DuckDB
    * oracle can rebuild the identical frame.
    */
  def browsing(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id").as("entry_id"),
      col("ts"),
      col("ts").cast("long").as("ts_sec"),
      col("user_id"),
      col("event_type"),
      concat(lit("http://site/"), col("event_type")).as("url"),
      col("event_type").as("title"),
      floor(col("value")).cast("long").as("pageview_count"),
      col("props").as("visible_content"),
      regexp_extract(col("props"), "([0-9]+)", 1).as("search_keyword")
    )

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
