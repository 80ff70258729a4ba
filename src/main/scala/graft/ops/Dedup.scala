package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed deduplication, keep-FIRST-occurrence semantics
  * (dwh/preprocessing_streaming_incremental_load.py:103-116) and the
  * QC duplicate counter (dwh/quality_report.py:74-94).
  *
  * pandas `seen`-set dedup keeps the first row in file order; Spark's
  * `dropDuplicates` keeps an arbitrary row per key, so for oracle-exact
  * parity we rank with row_number over an explicit order and keep rank 1.
  * Struct/array-valued key columns are canonicalized through `to_json`
  * first, mirroring the reference's `json.dumps(sort_keys=True)` key.
  *
  * Scale note: one shuffle on the key columns (same as dropDuplicates);
  * the window is per-key so no global sort appears anywhere.
  */
object Dedup {

  /** Canonicalize a key column: complex types via to_json, else as-is.
    * Resolution matches the analyzer's: an EXACT name match wins
    * first, then a case-insensitive match only when the session runs
    * case-insensitive analysis (`spark.sql.caseSensitive=false`, the
    * default) — so this never picks a different column than `col(c)`
    * resolves to. Names the top-level schema can't resolve (nested
    * paths like `meta.domain`) pass through to `col` for the analyzer
    * to handle — a strict `df.schema(c)` lookup would throw on keys
    * that `Window.partitionBy(col(c))` accepts. */
  def canonical(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val field = df.schema.find(_.name == c).orElse {
      if (df.sparkSession.sessionState.conf.caseSensitiveAnalysis) None
      else df.schema.find(_.name.equalsIgnoreCase(c))
    }
    field.map(_.dataType) match {
      case Some(_: StructType | _: ArrayType | _: MapType) => to_json(col(c))
      case _                                               => col(c)
    }
  }

  /** D1 — keep the first row per key under `order` ([[capPerKey]] at
    * n = 1). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    capPerKey(df, keys, order, n = 1)

  /** Per-key cap: keep the first `n` rows per key under `order` (the
    * per-domain cap a crawl-curation pipeline applies so no domain
    * dominates the corpus). `order` must be a TOTAL order (include a
    * unique tie-break column) for an exact, engine-replayable result.
    *
    * Scale shape: this is deliberately the PLAIN window + rank filter.
    * A hot key (a domain with 10^8 pages) does NOT funnel into one
    * task on Spark ≥ 3.5: `InferWindowGroupLimit` inserts a Partial
    * WindowGroupLimit BELOW the exchange, so each map partition ships
    * only its local top-n per key and the per-key task sees ≤
    * n·partitions rows (spec pins the Partial node). A hand-salted
    * two-stage variant was measured REDUNDANT against it — same
    * map-side sort, one extra shuffle+window (100M rows, 50M-row hot
    * key, local[32]: plain 3.9 s warm vs salted 6.8 s; PROBES.md).
    */
  def capPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                n: Int): DataFrame = {
    require(n >= 1, "cap must be positive")
    // canonical(): struct/array/map keys window-partition via their
    // to_json form, same as D1 (bare complex columns are not legal
    // partition keys)
    val w = Window.partitionBy(keys.map(canonical(df, _)): _*).orderBy(order: _*)
    df.withColumn("__r", row_number().over(w)).filter(col("__r") <= n)
      .drop("__r")
  }

  /** D2 — number of surplus rows per duplicated key (pandas
    * `duplicated(subset).sum()` counts all-but-first per key). */
  def duplicateCount(df: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(canonical(df, _))
    df.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1L), lit(0L)).as("dup_rows"))
  }
}
