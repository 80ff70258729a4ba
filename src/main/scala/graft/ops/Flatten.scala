package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Recursive nested-struct flattener — the reference flattens dict
  * cells to dotted columns on every QC path (`flatten_if_json`,
  * dwh/quality_report.py:33-48, applied at
  * preprocessing_streaming_incremental_load.py:516,562 and via
  * `pd.json_normalize` on every report sink).
  *
  * Spark-first design: where pandas walks each CELL and parses JSON
  * strings row by row, a typed engine walks the SCHEMA once on the
  * driver and emits a single flat projection — zero per-row work beyond
  * the (codegen'd) struct-field reads, no shuffle, and column pruning
  * still reaches the scan because every output column is a direct
  * `GetStructField` chain on the source. Arrays/maps stay as leaf
  * columns (same as json_normalize's default for lists).
  *
  * The reference's JSON-STRING cells are handled upstream by the typed
  * sources: `spark.read.json` / `from_json` turn them into StructType,
  * which is what this operator consumes (see [[parseAndFlatten]]).
  */
object Flatten {

  /** Leaf columns of `schema`, each aliased to its dotted path. */
  private def leafColumns(schema: StructType, prefix: Seq[String], sep: String): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val path = prefix :+ f.name
      f.dataType match {
        case st: StructType => leafColumns(st, path, sep)
        case _ =>
          // backtick-quote each step so field names containing dots or
          // spaces resolve as a GetStructField chain, not a dotted parse
          val ref = path.map(p => s"`${p.replace("`", "``")}`").mkString(".")
          Seq(col(ref).as(path.mkString(sep)))
      }
    }

  /** Recursively flatten every StructType column to dotted-name leaf
    * columns; non-struct columns pass through in schema order. */
  def flatten(df: DataFrame, sep: String = "."): DataFrame =
    df.select(leafColumns(df.schema, Nil, sep): _*)

  /** JSON-string column → struct (typed by `schema`) → flattened.
    * The from_json+flatten pair is the exact twin of the reference's
    * per-cell `json.loads` + `json_normalize`, but schema-checked and
    * codegen'd instead of interpreted per row. */
  def parseAndFlatten(df: DataFrame, jsonCol: String, schema: DataType,
                      sep: String = "."): DataFrame =
    flatten(df.withColumn(jsonCol, from_json(col(jsonCol), schema)), sep)
}
