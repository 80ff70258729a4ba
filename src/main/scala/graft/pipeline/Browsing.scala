package graft.pipeline

import graft.Tables
import graft.ops.{Dedup, Rows}
import graft.session.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E2 — the flagship browsing-history pipeline
  * (dwh/preprocessing_streaming_incremental_load.py:412-433):
  * dedup → window-time bucketing → sessionize → session merge →
  * time-on-page → cap → metadata stamp.
  *
  * `perUser = true` is the designed-for-scale flavor: every window and
  * aggregate is keyed by user_id, so the whole pipeline is one shuffle
  * by user_id reused across sessionize/merge/lead stages (Catalyst
  * collapses the co-partitioned windows), and no single-task global
  * sort exists. `perUser = false` reproduces the reference's global
  * scan for micro-batch parity.
  */
object Browsing {

  val RunTime = "2025-06-25 12:00:00"

  def pipeline(spark: SparkSession, dir: String, perUser: Boolean): DataFrame = {
    // ONE hash exchange for the whole chain: user_id is a subset of the
    // dedup window's 3-column key, so hash-partitioning by user_id
    // satisfies the dedup window, the session window, the session-merge
    // aggregate AND the dwell window (ClusteredDistribution subset
    // rule) — without it the planner shuffles once for the 3-column
    // dedup key and again for user_id
    val bh0 = Tables.browsing(spark, dir)
    val bh = if (perUser) bh0.repartition(col("user_id")) else bh0
    val part = if (perUser) Seq(col("user_id")) else Seq.empty
    val ord = Seq(col("ts"), col("entry_id"))

    val deduped = Dedup.keepFirst(bh, Seq("user_id", "event_type", "visible_content"), ord)
    val bucketed = Sessionize.windowTime(deduped, "ts")
    val sessioned = Sessionize.sessionIds(bucketed, col("ts_sec"), part, ord)

    val merged = Sessionize.mergeSessions(
      sessioned,
      keys = Seq(col("user_id"), col("session_id")),
      ts = col("ts"),
      uniq = col("entry_id"),
      sumCol = "pageview_count",
      firstCols = Seq(
        "entry_id", "event_type", "url", "title", "visible_content",
        "window_time_details", "window_time_overall", "ts_sec"
      )
    )

    val withDwell = Sessionize.timeOnPage(
      merged,
      col("ts_sec"),
      partition = if (perUser) Seq(col("user_id")) else Seq.empty,
      order = Seq(col("session_start"), col("entry_id"))
    )
    val capped = Sessionize.cappedTimeOnPage(withDwell)
    Rows
      .stampMetadata(capped, "clickhouse-streaming-data", 1L, lit(RunTime))
      .withColumn("session_start", col("session_start").cast("timestamp_ntz"))
      .orderBy(col("user_id"), col("session_id"))
  }
}
