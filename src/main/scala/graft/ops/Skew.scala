package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter grouping keys.
  *
  * A plain `groupBy(key)` on a key where one value holds most rows
  * (here: 80% of events are "view") funnels that value through one
  * reduce task. Salting splits each key into `salts` sub-groups for
  * the partial aggregate, then merges the partials — two shuffles,
  * both balanced. Complements AQE's skew-join handling (which covers
  * joins, not aggregations; partial aggregation already helps, salting
  * guarantees bounded reduce-side groups even for high-cardinality
  * accumulators like collect-style aggs).
  */
object Skew {

  /** Salted count+sum aggregate. `uniq` is any row-unique column used
    * to derive a deterministic salt. */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      uniq: Column,
      sums: Seq[String],
      salts: Int = 16
  ): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(uniq), lit(salts)))
    val partialAggs = count(lit(1)).as("__n") +:
      sums.map(c => sum(col(c)).as(s"__sum_$c"))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sum(col("__n")).as("n") +:
      sums.map(c => sum(col(s"__sum_$c")).as(s"${c}_sum"))
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }
}
