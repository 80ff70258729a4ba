package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE / upsert — the warehouse write pattern behind every
  * incremental dimension load (the reference's ClickHouse user table,
  * dwh/ingest_click_house_incremental_load_users.py, re-reads and
  * re-writes the whole table; a lakehouse engine merges instead).
  *
  * Semantics: rows from `updates` win over `base` on the key; within a
  * source, the caller-supplied `order` columns (descending, first
  * column most significant) pick the survivor, so an updates batch may
  * itself carry several versions of a key.
  *
  * Plan: tag + union + one per-key window — a SINGLE hash exchange on
  * the key, the same shuffle a full-outer-join merge would pay, but
  * with no per-column coalesce and map-side-combinable input. At
  * warehouse scale the win is bucketing both sides on the key, which
  * turns the exchange into a zero-shuffle local sort (see
  * j3_bucketed_join for the plan property).
  */
object Merge {

  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
             order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "need at least one merge key")
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(updates.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc +: order.map(_.desc): _*)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Keep-latest merge: the survivor per key is the (order desc)-max
    * row across base ∪ updates, with NO source precedence. Unlike
    * [[upsert]] (last-WRITER-wins), this is associative — any
    * grouping of the input into batches yields the same final table —
    * which is the property a streaming upsert sink needs for its end
    * state to be replay- and batch-boundary-independent. The order
    * columns must form a total order per key for determinism. */
  def keepLatest(base: DataFrame, updates: DataFrame, keys: Seq[String],
                 order: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "need at least one merge key")
    require(order.nonEmpty, "keep-latest needs a version order")
    val all = base.unionByName(updates)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
