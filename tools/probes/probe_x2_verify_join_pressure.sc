// Pressure companion to probe_x2_verify_join.sc: the round-10 spill
// shape (1M docs -- 500k unique + 500k near-clones) under the mode
// named by GRAFT_VERIFY_MODE, at whatever heap the launcher set. The
// round-10 probe proved merge completes where shuffle_hash aborts;
// this one asks whether HINT-FREE planning is as safe: the static
// plan must not broadcast a corpus-sized side off the (badly low)
// range-based estimate, and the runtime fallback must spill, finish,
// and produce the checksum merge produces.
// Run (example, the round-10 pressure point):
// GRAFT_VERIFY_MODE=none /opt/spark/bin/spark-shell --master 'local[8]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 3g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x2_verify_join_pressure.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

spark.sparkContext.setLogLevel("WARN")

object Spills extends SparkListener {
  @volatile var disk = 0L
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
    disk += sc.stageInfo.taskMetrics.diskBytesSpilled
}
spark.sparkContext.addSparkListener(Spills)

val mode = sys.env.getOrElse("GRAFT_VERIFY_MODE", "none")
System.setProperty("graft.dedup.verifyJoin", mode)
val heap = Runtime.getRuntime.maxMemory() / (1 << 20)

val text = concat_ws(" ", (0 until 20).map(j =>
  concat(lit("w"), col("id") * 20L + j)): _*)
val base = spark.range(500000L).select(col("id").as("doc_id"), text.as("text"))
val near = spark.range(500000L).select((col("id") + 1000000L).as("doc_id"),
  concat(text, lit(" extra")).as("text"))
val corpus = base.unionByName(near)

val t0 = System.nanoTime
val r = graft.llm.DedupLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
  .agg(count(lit(1)),
    sum(xxhash64(col("id_a") * 31 + col("id_b")).cast("decimal(38,0)"))).head
val w = (System.nanoTime - t0) / 1e9
Thread.sleep(1500)
println(f"X2PRESSURE mode=$mode heap_mb=$heap wall=$w%.1f n=${r.getLong(0)} " +
  s"sum=${r.getDecimal(1)} spill_disk_mb=${Spills.disk / (1 << 20)}")
