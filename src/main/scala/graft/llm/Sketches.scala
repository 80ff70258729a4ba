package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketching — K-Minimum-Values (Bar-Yossef et
  * al. 2002, the estimator behind Spark's own approx_count_distinct
  * lineage). Built on the repo's portable-hash convention (md5, the
  * same function every oracle replays) instead of HLL, precisely so
  * the sketch is CROSS-ENGINE EXACT: Spark's HLL++ and DuckDB's HLL
  * use different hash families and would never hash-match, while a
  * KMV over md5 reproduces bit-for-bit in any engine. Estimator:
  * with the k-th smallest of D distinct uniform hashes at fraction f
  * of the hash space, D ≈ (k−1)/f; all arithmetic here stays in
  * BIGINT (hash prefix as a 52-bit integer, integer division) so the
  * estimate itself replays exactly.
  *
  * Scale shape: the k smallest distinct hashes form an ALGEBRAIC
  * aggregate — each partition's local k-min merges by union+re-min,
  * which is what the two-stage window below implements without any
  * unbounded per-group state: stage 1 takes k-min within (group,
  * salt) — ≤ salts·k survivors per group — and stage 2 takes k-min of
  * the survivors. No collect_list, no single-reducer sort over a
  * group's full distinct set: the stage-1 window partitions by
  * (group, salt), so a 100 TB group's distinct hashes spread over
  * `salts` reducers before any total ordering happens. */
object Sketches {

  /** Per-group KMV distinct-count sketch over `valueCol`. Returns one
    * row per group with ≥ k distinct values: (groupCol, kth_hash,
    * est_distinct). Groups with fewer than k distinct values have an
    * exact answer by definition and no sketch row — callers wanting
    * those fall back to a plain countDistinct.
    *
    * @param salts stage-1 fan-out; any value ≥ 1 gives identical
    *              results (the salt only bounds per-window size) */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
                  k: Int = 64, salts: Int = 16): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    // distinct (group, hash): one shuffle keyed by content hash
    val hashed = df
      .select(col(groupCol), md5(col(valueCol).cast("string")).as("h"))
      .distinct()
    // md5 is uniform, so the salt can be cut from the hash tail —
    // stage 1's partition key never needs a second hash pass
    val salted = hashed.withColumn("salt",
      pmod(conv(substring(col("h"), 29, 4), 16, 10).cast("long"), lit(salts.toLong)))
    val local = Window.partitionBy(col(groupCol), col("salt")).orderBy("h")
    val global = Window.partitionBy(col(groupCol)).orderBy("h")
    val kth = salted
      .withColumn("rn1", row_number().over(local)).filter(col("rn1") <= k)
      .withColumn("rn", row_number().over(global)).filter(col("rn") === k)
    // f = first 13 hex digits as a 52-bit integer over 2^52;
    // est = (k-1)/f computed entirely in BIGINT: (k-1)·2^52 div hv
    kth.select(col(groupCol), col("h").as("kth_hash"),
      expr(s"${(k - 1).toLong * (1L << 52)} div ($hvSqlExpr)").as("est_distinct"))
  }

  /** The 52-bit hash-prefix expression as SQL text (shared with the
    * `expr` above so the div stays integer-typed end to end). */
  private val hvSqlExpr = "cast(conv(substring(h, 1, 13), 16, 10) as bigint)"
}
