package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — each left row picks the right row with
  * the greatest timestamp ≤ its own within the key group: "the
  * dimension version active when the event happened" (SCD-style
  * enrichment a training/analytics pipeline needs for config/model
  * versioning).
  *
  * Spark has no ASOF JOIN operator, and the naive range-join
  * (`ts BETWEEN valid_from AND valid_to`) degenerates to a per-key
  * cross product. Composition-first design (rung (a) of the custom-op
  * ladder): tag and UNION both sides, then a single
  * `last(attr, ignoreNulls) OVER (PARTITION BY key ORDER BY ts, side)`
  * carries the most recent right-side attributes onto every left row —
  * ONE shuffle on the key, cost O(|left| + |right|), no range
  * explosion. Right-side rows sort BEFORE left rows at equal
  * timestamps, so a left row at exactly `valid_from` matches that
  * version (`>=` semantics, identical to DuckDB's ASOF JOIN).
  *
  * The carried value is a single STRUCT of all attrs (non-null for
  * every right row), so a matched version whose attr value is
  * genuinely NULL yields NULL — not the previous version's value, as
  * a per-attr `last(attr, ignoreNulls)` would (real ASOF JOIN
  * semantics; round-3 advice).
  *
  * Contract: `leftTs`/`rightTs` must be the same (orderable) type, and
  * the right side unique per (key, ts) — the usual shape of a version
  * table. Left rows before any right version keep null attrs (ASOF
  * LEFT JOIN semantics). Attr names must not collide with left
  * columns (checked).
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, attrs: Seq[String]): DataFrame = {
    val payload = left.columns.toSeq.filterNot(_ == key)
    val clash = attrs.intersect(left.columns.toSeq)
    require(clash.isEmpty,
      s"as-of attrs collide with left columns: ${clash.mkString(", ")} — rename before joining")
    val attrsType = org.apache.spark.sql.types.StructType(
      attrs.map(a => right.schema(a).copy(name = a)))
    val l = left.select(
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__side")) ++
        payload.map(col) :+
        lit(null).cast(attrsType).as("__attrs"): _*)
    val r = right.select(
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__side")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(attrs.map(col): _*).as("__attrs"): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select(Seq(col(key), col("__side")) ++ payload.map(col) :+
        last(col("__attrs"), ignoreNulls = true).over(w).as("__attrs"): _*)
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ payload.map(col) ++
        attrs.map(a => col("__attrs")(a).as(a)): _*)
  }
}
