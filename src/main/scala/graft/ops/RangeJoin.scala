package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — match each left row's timestamp
  * into the intervals `[start, end)` that contain it, without the
  * cross-product a naive `ON ts >= start AND ts < end` plan executes
  * (Spark turns pure range predicates into BroadcastNestedLoopJoin or
  * a cartesian — O(|left|·|intervals|)).
  *
  * Bucketed design: pick a bucket width ≥ nothing in particular — each
  * interval EXPLODES to every width-aligned bucket it overlaps, each
  * left row maps to exactly ONE bucket, and the join is an equi-join
  * on the bucket id followed by the exact range filter. Cost is
  * O(|left| + |intervals| · avgLen/width) through one hash shuffle;
  * width tunes the explode factor vs bucket occupancy (width ≈ typical
  * interval length ⇒ ~2 buckets per interval). Works for overlapping
  * intervals (a row matching k intervals emits k rows, no duplicates
  * from bucketing since the row sits in one bucket).
  */
object RangeJoin {

  def joinByRange(left: DataFrame, ts: String, intervals: DataFrame,
                  startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // drop malformed intervals (end <= start) before the explode: they
    // can never match the final range filter, but sequence(start, stop)
    // with stop < start generates DESCENDING — one interval with end
    // far below start would explode into an arbitrarily large bucket
    // list (round-3 advice)
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__b",
        explode(sequence(
          expr(s"$startCol div $bucketWidth"),
          expr(s"($endCol - 1) div $bucketWidth"))))
    val ev = left.withColumn("__b", expr(s"$ts div $bucketWidth"))
    // corpus-sized sides: never let the planner broadcast on a size
    // underestimate of the exploded interval table
    ev.join(iv.hint("shuffle_hash"), Seq("__b"))
      .filter(col(ts) >= col(startCol) && col(ts) < col(endCol))
      .drop("__b")
  }
}
