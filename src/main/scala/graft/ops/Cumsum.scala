package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global cumulative sum — the scalable replacement for an
  * unpartitioned `SUM() OVER (ORDER BY …)` window, which Spark executes
  * as ONE task holding the whole dataset (the same trap the reference's
  * global sessionization has; `w2_sessionize_global` keeps that form
  * for parity, this is the 100 TB path).
  *
  * Classic two-pass prefix sum:
  *   1. range-repartition on the order key, so partition i holds a
  *      contiguous key range below partition i+1 — each partition
  *      computes its LOCAL running sum in parallel (window keyed by
  *      `spark_partition_id()`);
  *   2. the per-partition totals (one row per partition — O(partitions),
  *      not O(rows)) come to the driver, their exclusive prefix sums go
  *      back as a broadcast map, and each row adds its partition offset.
  *
  * The result is independent of where the (sampled, nondeterministic)
  * range boundaries land: offsets absorb the split. The order key must
  * be a total order — pass a unique tiebreaker.
  */
object Cumsum {

  def globalCumsum(df: DataFrame, order: Seq[Column], value: Column,
                   out: String): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val parted = df
      .repartitionByRange(par, order: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // persisted: the totals pass and the output both read this subtree
    val local = parted.withColumn(out, sum(value).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // sum, not max-of-running-sum: max breaks on negative values.
    // LONG totals keep the offsets exact (doubles would drift by
    // partition count × ulp and diverge from the single-window oracle).
    val totals = local.groupBy(col("__pid"))
      .agg(sum(value).as("__total"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init.map { case (_, off) => off }
    val offsetsByPid = totals.map(_._1).zip(offsets).toMap
    val offsetExpr = offsetsByPid.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === pid, lit(off)).otherwise(e)
    }
    local.withColumn(out, col(out) + offsetExpr).drop("__pid")
  }
}
