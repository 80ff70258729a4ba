package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD2) interval building from an observed
  * state stream — the warehouse-side twin of the incremental user load
  * (dwh_lab/dwh/ingest_click_house_incremental_load_users.py): given
  * (key, ts, state) observations, emit one row per state RUN with its
  * validity interval [valid_from, valid_to), open-ended (null) for the
  * current version.
  *
  * Two windows over the same (key, order) spec — change detection via
  * lag, interval close via lead on the change rows — so the plan is ONE
  * hash exchange on the key and sorts that Catalyst shares between the
  * windows. Scales like any per-key window: distributed across keys,
  * no global sort.
  *
  * NULL states are a real state value: change detection is null-safe
  * (`IS DISTINCT FROM` semantics, with an explicit first-row marker so
  * a partition OPENING on a NULL state still opens an interval). A run
  * of NULLs therefore gets one interval, and the same state resuming
  * after a NULL run starts a new interval — deliberately, not as a
  * lag-null artifact (round-4 advice).
  */
object Scd {

  def intervals(df: DataFrame, key: String, tsUs: Column, state: Column,
                tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tb"))
    val changes = df
      .select(col(key), tsUs.as("__ts"), state.as("state"), tiebreak.as("__tb"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col("state"), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col("state")))
    changes
      .withColumn("valid_to_us", lead(col("__ts"), 1).over(
        Window.partitionBy(col(key)).orderBy(col("__ts"), col("__tb"))))
      .select(col(key), col("state"), col("__ts").as("valid_from_us"), col("valid_to_us"))
  }
}
