package graft.session

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-time bucketing, gap sessionization and dwell-time operators —
  * the heart of the reference platform
  * (dwh/preprocessing_streaming_incremental_load.py:119-392).
  *
  * Two session flavors ship side by side:
  *  - `global`: faithful to the reference, which sessionizes over a
  *    single timestamp-ordered scan with NO user partitioning
  *    (py:317-337). An unpartitioned window = one-task sort; fine for a
  *    micro-batch (the reference's batches are ~25 rows), lethal at
  *    100 TB. Kept for parity, documented as micro-batch-only.
  *  - `perUser`: the designed-for-scale variant — partitionBy(user)
  *    keeps the sort distributed and shuffle-balanced; this is the one
  *    the big pipelines use.
  */
object Sessionize {

  /** W1 — hour-of-day bucketing (py:119-186). Adds
    * window_time_details (hour), window_time_details_meaning ("{h}ham/pm"),
    * window_time_overall (6-hour floor ∈ {0,6,12,18}) and its meaning.
    */
  def windowTime(df: DataFrame, ts: String = "ts"): DataFrame = {
    // long-typed buckets: keeps the dtype identical to the DuckDB
    // oracle's BIGINT hour() so the driver's schema/hash compare holds
    val h = hour(col(ts)).cast("long")
    df.withColumn("window_time_details", h)
      .withColumn(
        "window_time_details_meaning",
        concat(h.cast("string"), lit("h"), when(h < 12, "am").otherwise("pm"))
      )
      .withColumn("window_time_overall", (floor(h / 6) * 6).cast("long"))
      .withColumn(
        "window_time_overall_meaning",
        concat(
          lit("("), col("window_time_overall").cast("string"), lit("h - "),
          (col("window_time_overall") + 6).cast("string"), lit("h) "),
          when(h < 12, "am").otherwise("pm")
        )
      )
  }

  /** W2 — 30-minute-gap sessionization as a running sum of gap breaks.
    * A row opens a new session when its gap from the previous event
    * exceeds `gapSeconds`. The first row also counts as a break, so ids
    * start at 2 — faithful to the reference counter that starts at 1
    * and increments on the first row (py:317-337).
    *
    * @param partition user/key columns; empty = faithful global scan.
    * @param order     total order within partition (add a unique
    *                  tiebreaker: identical-µs timestamps must not flap).
    */
  def sessionIds(
      df: DataFrame,
      tsSec: Column,
      partition: Seq[Column],
      order: Seq[Column],
      gapSeconds: Long = 1800L,
      out: String = "session_id"
  ): DataFrame = {
    val w0 =
      if (partition.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(partition: _*).orderBy(order: _*)
    val gap = tsSec - lag(tsSec, 1).over(w0)
    val isBreak = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn(
      out,
      sum(isBreak).over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)) + 1L
    )
  }

  /** W2 at scale — GLOBAL gap sessionization without a single-partition
    * window. The unpartitioned `Window.orderBy` variant above is
    * faithful to the reference but serializes the whole dataset through
    * one task; this is the 100TB-safe equivalent, a two-pass parallel
    * prefix scan:
    *
    *  1. range-partition + sort by (ts, uniq) — the only shuffle;
    *  2. per-partition pass collecting (first ts, last ts, internal
    *     break count) — O(#partitions) rows to the driver;
    *  3. prefix-sum those stats into a per-partition session-id offset
    *     and carried-in previous timestamp (empty partitions skipped);
    *  4. per-partition scan assigns final ids with the broadcast offsets.
    *
    * Output ids are identical to `sessionIds(..., partition = empty)`
    * regardless of partition count (asserted by spec + shared oracle).
    * RDD mapPartitions is deliberate here: a sequential carry across
    * ordered rows is genuine per-partition imperative logic.
    */
  def sessionIdsDistributed(
      df: DataFrame,
      tsSec: String,
      uniq: String,
      gapSeconds: Long = 1800L,
      numPartitions: Option[Int] = None,
      out: String = "session_id"
  ): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val p = numPartitions.getOrElse(spark.sparkContext.defaultParallelism)
    // __pid binds each row's range-partition index INTO the cached
    // blocks (evaluated when the cache materializes, when task pid ==
    // partition index by construction). The per-row pid — not
    // TaskContext.getPartitionId() — indexes the broadcast offsets
    // below: a narrow coalesce()/union() above the result (e.g. a
    // single-file sink's coalesce(1)) reuses ONE task for many cached
    // partitions, so the task id stops matching the partition the rows
    // came from and would silently corrupt every session id (round-7
    // advice). Recompute after eviction re-evaluates spark_partition_id
    // inside the same post-exchange stage, so the binding is stable.
    val sorted = df
      .repartitionByRange(p, col(tsSec), col(uniq))
      .sortWithinPartitions(col(tsSec), col(uniq))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tsIdx = sorted.schema.fieldIndex(tsSec)
    val pidIdx = sorted.schema.fieldIndex("__pid")

    val stats = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var first, last: Option[Long] = None
        var breaks = 0L
        var prev: Option[Long] = None
        it.foreach { r =>
          val t = r.getLong(tsIdx)
          if (first.isEmpty) first = Some(t)
          else if (t - prev.get > gapSeconds) breaks += 1
          prev = Some(t); last = Some(t)
        }
        Iterator.single((pid, first, last, breaks))
      }
      .collect()
      .sortBy(_._1)

    val offsets = new Array[Long](stats.length)
    val carriedPrev = new Array[Option[Long]](stats.length)
    var cum = 0L
    var lastSeen: Option[Long] = None
    stats.foreach { case (pid, first, last, breaks) =>
      carriedPrev(pid) = lastSeen
      offsets(pid) = cum
      val boundary = first match {
        case Some(f) if lastSeen.isEmpty || f - lastSeen.get > gapSeconds => 1L
        case Some(_)                                                     => 0L
        case None                                                        => 0L
      }
      cum += boundary + breaks
      if (last.isDefined) lastSeen = last
    }
    val bc = spark.sparkContext.broadcast((offsets, carriedPrev))

    // typed mapPartitions (not .rdd + createDataFrame): keeps Catalyst
    // lineage to the persisted frame, so the Caching hook below can
    // recognize the consumer's first read and release the blocks.
    // State re-seeds whenever the per-row pid changes: one iterator
    // normally spans exactly one cached partition, but this also stays
    // correct if a future plan concatenates partitions into one pass.
    val outSchema = sorted.schema.add(out, LongType, nullable = false)
    val result = sorted.mapPartitions { it =>
      var curPid = -1
      var running = 0L
      var prev: Option[Long] = None
      it.map { r =>
        val pid = r.getInt(pidIdx)
        if (pid != curPid) { curPid = pid; running = bc.value._1(pid); prev = bc.value._2(pid) }
        val t = r.getLong(tsIdx)
        if (prev.isEmpty || t - prev.get > gapSeconds) running += 1
        prev = Some(t)
        Row.fromSeq(r.toSeq :+ (running + 1L))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    graft.Caching.releaseAfterFirstUse(result.drop("__pid"), sorted)
  }

  /** W3 — dwell time: seconds to the next event in the ordered scan;
    * the last row gets `defaultSeconds` (py:370-378). */
  def timeOnPage(
      df: DataFrame,
      tsSec: Column,
      partition: Seq[Column],
      order: Seq[Column],
      defaultSeconds: Double = 1800.0,
      out: String = "raw_time_on_page"
  ): DataFrame = {
    val w =
      if (partition.isEmpty) Window.orderBy(order: _*)
      else Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn(
      out,
      coalesce((lead(tsSec, 1).over(w) - tsSec).cast("double"), lit(defaultSeconds))
    )
  }

  /** W4 — cap dwell time at one hour (py:389-392). */
  def cappedTimeOnPage(
      df: DataFrame,
      raw: String = "raw_time_on_page",
      capSeconds: Double = 3600.0,
      out: String = "capped_time_on_page"
  ): DataFrame =
    df.withColumn(out, least(col(raw), lit(capSeconds)))

  /** A1 — session merge (py:339-367): collapse each session group to
    * one row: Σ pageview_count, the entry_id/field values of the
    * earliest event (reference keeps "first non-null", whose file order
    * is ts order), min timestamp. `firstCols` are reduced with
    * min_by(col, (ts, uniq)) — deterministic under duplicate µs stamps.
    */
  def mergeSessions(
      df: DataFrame,
      keys: Seq[Column],
      ts: Column,
      uniq: Column,
      sumCol: String,
      firstCols: Seq[String]
  ): DataFrame = {
    val ord = struct(ts, uniq)
    val aggs =
      sum(col(sumCol)).as(s"${sumCol}_sum") +:
        min(ts).as("session_start") +:
        firstCols.map(c => min_by(col(c), ord).as(c))
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }
}
