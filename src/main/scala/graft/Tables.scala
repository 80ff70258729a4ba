package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated test tables
  * (`/root/testdata/sf*`; see TESTDATA.md) plus the reference-entity
  * mapping (FIXTURES.md §mapping): `events` plays browsinghistory /
  * ProblemLog, `customer` plays users, `part` the exercise dim.
  *
  * The events parquet has shipped with TWO physical `ts` encodings
  * across testdata generations: TIMESTAMP(NANOS) — which Spark's
  * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]) — and
  * plain TIMESTAMP(MICROS). We enable
  * `spark.sql.legacy.parquet.nanosAsLong` (a no-op on MICROS files) and
  * branch on the resolved type: a Long `ts` is raw nanos and converts
  * via integer `ts div 1000` (exact where a double division would lose
  * precision above 2^53 ns; DuckDB truncates ns→us the same way), a
  * TimestampType `ts` is already microseconds and passes through. Both
  * paths land on the identical µs TimestampType the oracles hash.
  */
object Tables {

  private def path(dir: String, t: String) = s"$dir/$t.parquet"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** events with `ts` as a proper microsecond timestamp, whichever
    * physical encoding the file carries (see the class scaladoc). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // pandas writes tz-naive µs timestamps, which Spark reads as
        // NTZ; the session timezone is pinned to UTC everywhere, so the
        // NTZ→LTZ cast reinterprets the same wall-clock as the same
        // epoch instant DuckDB's naive read produces — downstream
        // unix_micros/casts then match the oracle bit-for-bit
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      // the testdata generator has already switched ts encodings once
      // (round 10: NANOS-as-long → µs NTZ); an unrecognized third
      // encoding must fail HERE, at the loader, not as obscure value
      // mismatches in every events-derived query downstream
      case other => sys.error(s"unexpected events.ts type: $other " +
        "(known encodings: long nanos, timestamp_ntz micros, timestamp)")
    }
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
