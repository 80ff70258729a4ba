package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global cumulative sum — the scalable replacement for an
  * unpartitioned `SUM() OVER (ORDER BY …)` window, which Spark executes
  * as ONE task holding the whole dataset (the same trap the reference's
  * global sessionization has; `w2_sessionize_global` keeps that form
  * for parity, this is the 100 TB path).
  *
  * Classic two-pass prefix sum over ONE exchange:
  *   1. range-repartition + sort on the order key (partition i's keys
  *     all precede partition i+1's), then cache — this is the only
  *     shuffle;
  *   2. a narrow pass brings one (partition, total) row per partition
  *     to the driver — O(partitions), not O(rows);
  *   3. a second narrow pass computes each partition's local running
  *     sum seeded with its broadcast exclusive-prefix offset.
  * A window keyed by `spark_partition_id()` would be wrong here: the
  * pid column doesn't satisfy the range partitioning, so the planner
  * would insert a SECOND full-data hash exchange (measured in review).
  *
  * The result is independent of where the (sampled, nondeterministic)
  * range boundaries land: offsets absorb the split. The order key must
  * be a total order — pass a unique tiebreaker. The value is summed as
  * LONG (exact in any partial order; null counts as 0, matching SQL
  * SUM's null-skipping).
  */
object Cumsum {

  def globalCumsum(df: DataFrame, order: Seq[Column], value: Column,
                   out: String): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    // __pid binds each row's range-partition index into the cached
    // blocks (see Sessionize.sessionIdsDistributed): the second pass
    // keys the broadcast offsets on the PER-ROW pid, because a narrow
    // coalesce()/union() above the result reuses one task for many
    // cached partitions and TaskContext.getPartitionId() would then
    // mis-index the offsets. (A window keyed on __pid would still be
    // wrong — the pid column doesn't satisfy the range partitioning,
    // so the planner would add a second full-data hash exchange.)
    val parted = df
      .withColumn("__v", value.cast("long"))
      .repartitionByRange(par, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vIdx = parted.schema.fieldIndex("__v")
    val pidIdx = parted.schema.fieldIndex("__pid")
    val totals = parted.toDF().rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var acc = 0L
        it.foreach(r => if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx))
        Iterator.single(pid -> acc)
      }
      .collect().sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .init.map { case (_, off) => off }
    val offsetByPid = spark.sparkContext.broadcast(
      totals.map(_._1).zip(offsets).toMap)
    val outSchema = parted.schema.add(out, LongType)
    val result = parted.mapPartitions { it =>
      var curPid = -1
      var acc = 0L
      it.map { r =>
        val pid = r.getInt(pidIdx)
        if (pid != curPid) { curPid = pid; acc = offsetByPid.value.getOrElse(pid, 0L) }
        if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }(Encoders.row(outSchema))
    // the range-partitioned sorted frame releases on the caller's
    // first materialization (graft.Caching contract)
    graft.Caching.releaseAfterFirstUse(result.drop("__v", "__pid"), parted)
  }
}
