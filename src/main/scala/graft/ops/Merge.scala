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

  /** Incremental aggregate-view maintenance: fold a new batch into a
    * persisted per-key aggregate STATE (count + long sums) without
    * rescanning history — the only viable way to keep corpus-level
    * per-key statistics at 100 TB. The batch is pre-aggregated
    * map-side, unioned with the state, and re-aggregated; because
    * count/sum are associative and commutative, ANY batch split folds
    * to exactly the full recompute (spec + oracle prove equality).
    * Only touched keys change value, so pairing this with the bucketed
    * upsert sink (st12) makes the state rewrite O(touched buckets).
    * Long sums, deliberately: double sums drift per fold order and the
    * incremental view would slowly diverge from the recompute.
    */
  def mergeAggState(state: DataFrame, batch: DataFrame, keys: Seq[String],
                    sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one state key")
    state.unionByName(aggState(batch, keys, sumCols))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
  }

  /** Bootstrap (or per-batch partial) form of [[mergeAggState]]'s
    * state: per-key count + long sums over one batch. */
  def aggState(batch: DataFrame, keys: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one state key")
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sumCols.map(c => sum(col(c)).as(c)): _*)
  }

  /** Snapshot diff (CDC between two table versions): classify every
    * key as `insert` (new only), `delete` (old only) or `update` (both
    * sides, any compared column differing under null-safe
    * IS DISTINCT FROM semantics); unchanged keys are omitted — at
    * warehouse scale the diff is the small output, the snapshots are
    * the big inputs. One full-outer join = one key shuffle per side
    * (bucket both snapshots on the key to drop even that); the
    * classification is a projection.
    *
    * Output: key columns + `change`, plus each compared column's old/
    * new pair (`<col>_old`, `<col>_new`) — what a downstream incremental
    * consumer needs to apply or audit the delta. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one diff key")
    require(compareCols.nonEmpty, "need at least one compared column")
    // explicit presence markers, not key-null tests: a NULL key column
    // cannot distinguish "row absent" from "row present with NULL key"
    // string aliases + qualified key refs, not df(col) handles: both
    // snapshots routinely derive from ONE source frame (current table
    // vs mutated view), and unqualified key references then trip the
    // ambiguous-self-join analyzer
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"${c}_old").toMap)
      .withColumn("__in_old", lit(true)).alias("__o")
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumnsRenamed(compareCols.map(c => c -> s"${c}_new").toMap)
      .withColumn("__in_new", lit(true)).alias("__n")
    // null-safe key equality: NULL-keyed rows pair up instead of
    // surviving as a phantom delete+insert
    val cond = keys.map(k => col(s"__o.$k") <=> col(s"__n.$k")).reduce(_ && _)
    val differs = compareCols
      .map(c => !(col(s"${c}_old") <=> col(s"${c}_new")))
      .reduce(_ || _)
    o.join(n, cond, "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "insert")
          .when(col("__in_new").isNull, "delete")
          .when(differs, "update"))
      .filter(col("change").isNotNull)
      .select(
        keys.map(k => coalesce(col(s"__o.$k"), col(s"__n.$k")).as(k)) ++
          Seq(col("change")) ++
          compareCols.flatMap(c => Seq(col(s"${c}_old"), col(s"${c}_new"))): _*)
  }
}
