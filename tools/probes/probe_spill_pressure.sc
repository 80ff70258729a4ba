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

def timed(label: String)(f: => Any): Unit = {
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
// 500k UNIQUE docs (id baked into every token, so no two base docs
// share a shingle -- the spill pressure must land on the persisted
// banded staging, NOT on a candidate blowup, which is the separately
// probed occupancy-cap pathology) + 500k drop-nothing near-clones
// (one appended token: jaccard 18/19, caught in every band). The
// persisted MEMORY_AND_DISK staging (1M docs of shingle arrays,
// ~10x the text bytes) is the working set whose spill path is under
// test as the heap shrinks.
val text = concat_ws(" ", (0 until 20).map(j =>
  concat(lit("w"), col("id") * 20L + j)): _*)
val base = spark.range(500000L).select(col("id").as("doc_id"), text.as("text"))
val near = spark.range(500000L).select((col("id") + 1000000L).as("doc_id"),
  concat(text, lit(" extra")).as("text"))
val corpus = base.unionByName(near)

timed("x2_neardup_1m") {
  graft.llm.DedupLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5).count
}
spark.catalog.clearCache()

// ---- x17 shape: SemDeDup at 250k vectors, 256 cells ----------------
// SemDeDup's verify cost is Sum|cell|^2 -- cells must be bounded relative
// to the corpus (numCells ~= N/1000 is the scale guidance; 16 cells
// over a uniform million would be a quadratic cell self-join, the
// anti-pattern, not the spill path). Duplicate pairs (i, i+125k)
// share a vector, so the kept set is deterministic under any split.
val vecExpr = array((0 until 64).map(j =>
  (hash(pmod(col("id"), lit(125000L)) * 64 + j) % 1000).cast("float") / 1000f): _*)
val emb = spark.range(250000L).select(col("id").as("vec_id"), vecExpr.as("embedding"))

// semanticDedup returns the SURVIVING rows; the FULL decimal sum of
// per-row hashes pins the exact member set (a truncated/modular form
// would let different survivor sets of the same size collide)
timed("x17_semdedup_250k") {
  val r = graft.llm.Similarity.semanticDedup(emb, numCells = Some(256), iters = 2, threshold = 0.99)
    .agg(count(lit(1)),
      sum(xxhash64(col("vec_id")).cast("decimal(38,0)"))).head()
  s"${r.getLong(0)}_${r.getDecimal(1)}"
}
spark.catalog.clearCache()
