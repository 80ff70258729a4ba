// Probe: the persist-heavy dedup family under FORCED memory pressure.
// Claim under test (DedupLsh/Similarity scaladoc, queued by the round-8
// and round-9 verdicts): the MEMORY_AND_DISK persists "spill, not OOM"
// when storage memory is a fraction of the cached working set, and the
// answer is bit-identical to the comfortable-memory run -- only slower.
// This script is memory-agnostic; tools/probes/run_spill_probe.sh runs
// it at descending --driver-memory (local mode: driver heap IS executor
// heap) and diffs the PROBE_SPILL result lines across runs.
// Standalone run (one memory point):
// /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 3g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_spill_pressure.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

spark.sparkContext.setLogLevel("WARN")

// spill evidence: sum task-metric spill bytes across all stages
object Spills extends SparkListener {
  @volatile var mem = 0L
  @volatile var disk = 0L
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    mem += sc.stageInfo.taskMetrics.memoryBytesSpilled
    disk += sc.stageInfo.taskMetrics.diskBytesSpilled
  }
  def reset(): Unit = { mem = 0L; disk = 0L }
}
spark.sparkContext.addSparkListener(Spills)

val heap = Runtime.getRuntime.maxMemory() / (1 << 20)

def timed(label: String)(f: => Long): Unit = {
  Spills.reset()
  val t0 = System.nanoTime
  val n = f
  val w = (System.nanoTime - t0) / 1e9
  // stage events arrive async; settle before reading the sums
  Thread.sleep(1500)
  println(f"PROBE_SPILL heap_mb=$heap $label result=$n wall_s=$w%.1f " +
    f"spill_mem_mb=${Spills.mem / (1 << 20)} spill_disk_mb=${Spills.disk / (1 << 20)}")
}

// ---- x2 shape: MinHash near-dup at 1M docs -------------------------
// the round-7/9 healthy 1M corpus: 500k distinct + 500k near-clones;
// the persisted banded staging (shingle arrays ~10x the text bytes) is
// the MEMORY_AND_DISK working set whose spill path is under test
val text = concat_ws(" ", (0 until 20).map(j =>
  concat(lit("w"), (col("id") * 7 + j) % 50000, lit("t" + j))): _*)
val base = spark.range(500000L).select(col("id").as("doc_id"), text.as("text"))
val near = spark.range(500000L).select((col("id") + 1000000L).as("doc_id"),
  concat(text, lit(" extra")).as("text"))
val corpus = base.unionByName(near)

timed("x2_neardup_1m") {
  graft.llm.DedupLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5).count
}
spark.catalog.clearCache()

// ---- x17 shape: SemDeDup at 1M vectors -----------------------------
// 64-dim float vectors; clone pairs (i, i+500k) share a vector so the
// kept/dropped answer is deterministic under any cell split
val vecExpr = array((0 until 64).map(j =>
  (hash(pmod(col("id"), lit(500000L)) * 64 + j) % 1000).cast("float") / 1000f): _*)
val emb = spark.range(1000000L).select(col("id").as("vec_id"), vecExpr.as("embedding"))

// semanticDedup returns the SURVIVING rows; xor of kept ids pins the
// exact member set, not just its size
timed("x17_semdedup_1m") {
  graft.llm.Similarity.semanticDedup(emb, numCells = 16, iters = 2, threshold = 0.99)
    .agg((count(lit(1)).cast("decimal(38,0)") +
      abs(sum(xxhash64(col("vec_id")).cast("decimal(38,0)"))) % 1000000L).cast("decimal(38,0)"))
    .head().getDecimal(0).longValue()
}
spark.catalog.clearCache()
