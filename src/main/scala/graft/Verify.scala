package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // dump timestamps as TIMESTAMP_MICROS so the DuckDB-side compare
      // sees the exact same µs values (INT96 would round-trip via ns)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", s"${sys.props("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_PUBLISH_MODE=versioned runs the WHOLE registry under
    // the object-store publish protocol (graft.io.Staging.publish):
    // every staged artifact builds as version dirs + manifest and every
    // reader resolves it — the end-to-end proof that one conf flips the
    // engine without moving a value (the oracle compare is unchanged).
    graft.io.Staging.applyPublishModeFromEnv(spark)
    // state-store A/B knob, same contract as Bench: heap reverts the
    // engine's RocksDB default to Spark's heap-backed provider
    sys.env.get("SPARK_GRAFT_STATE_STORE")
      .foreach(m => spark.conf.set(graft.streaming.Streams.StateStoreModeKey, m))
    new java.io.File(outDir).mkdirs()
    // dev-loop filter (same contract as SPARK_GRAFT_BENCH_ONLY): regex
    // over query names; unset = full sweep (what the driver runs)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.r)
    def wanted(name: String) = only.forall(_.findFirstIn(name).isDefined)
    SparkEntry.queries.filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators that persist at internal fan-out points cannot
      // unpersist before returning; clear between queries so blocks
      // don't accumulate across the 100+ query sweep
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => wanted(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
