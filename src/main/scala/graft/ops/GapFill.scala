package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: give every key one row per calendar day
  * between its first and last observation — zero-filled counts for the
  * gap days, and categorical state carried forward from the last
  * observed day (LOCF). The standard reshape before training on
  * activity series (a model can't learn "no activity" from absent
  * rows).
  *
  * Shape: per-key min/max day aggregate → `sequence` + `explode` into
  * the calendar spine (rows ∝ Σ key spans — generated distributed,
  * never a driver loop) → one equi-join back to the observed daily
  * aggregate → a forward-fill window per key. Everything partitions by
  * the key; no global operation anywhere.
  */
object GapFill {

  /** @param dayCol  a date-typed column
    * @param agg     (name, aggregate) pairs computed per (key, day);
    *                missing days get the aggregate's zero via coalesce
    * @param ffill   categorical columns to carry forward (last non-null
    *                value at or before each day under day order) */
  def dailySpine(df: DataFrame, key: String, dayCol: Column,
                 agg: Seq[(String, Column)], ffill: Seq[(String, Column)]): DataFrame = {
    val observed = df
      .groupBy(col(key), dayCol.as("day"))
      .agg((agg.map { case (n, c) => c.as(n) } ++
        ffill.map { case (n, c) => c.as(n) }).head,
        (agg.map { case (n, c) => c.as(n) } ++
          ffill.map { case (n, c) => c.as(n) }).tail: _*)
    val spine = df
      .groupBy(col(key))
      .agg(min(dayCol).as("__d0"), max(dayCol).as("__d1"))
      .select(col(key),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day"))).as("day"))
    val joined = spine.join(observed, Seq(key, "day"), "left")
    val w = Window.partitionBy(col(key)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = ffill.foldLeft(joined) { case (d, (n, _)) =>
      d.withColumn(n, last(col(n), ignoreNulls = true).over(w))
    }
    agg.foldLeft(filled) { case (d, (n, _)) =>
      d.withColumn(n, coalesce(col(n), lit(0L)))
    }
  }
}
