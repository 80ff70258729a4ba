// Probe: the round-9 band-bucket occupancy cap (maxBucketDf) under the
// web-crawl pathology -- 1M docs of which 100k are byte-identical exact
// clones. Uncapped, the clone set shares identical minhash signatures
// in EVERY band, so one bucket per band holds all 100k ids and the band
// self-join emits ~100k^2/2 x 4 bands = 2x10^10 candidate rows before
// any dedup (NOT RUN -- that is the failure mode the cap exists for).
// Claims under test:
//   (a) capped, the same corpus completes in seconds and emits ZERO
//       clone-clone pairs while keeping the genuine near-dup pairs;
//   (b) on a HEALTHY corpus (no clone mass) the cap's occupancy
//       aggregate is cheap -- the knob costs ~nothing when it has
//       nothing to do.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 16g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_cap_clones_1m.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")

def timeIt(label: String)(f: => Long): Unit = {
  val t0 = System.nanoTime
  val n = f
  println(f"PROBE_CAP $label rows=$n wall_s=${(System.nanoTime - t0) / 1e9}%.1f")
}

// healthy corpus: 450k distinct docs + 450k drop-last-word near-clones
// (the round-7 1M shape -- every bucket small)
val text = concat_ws(" ", (0 until 20).map(j => concat(lit("w"), (col("id") * 7 + j) % 50000, lit("t" + j))): _*)
val base = spark.range(450000L).select(col("id").as("doc_id"), text.as("text"))
val near = spark.range(450000L).select((col("id") + 1000000L).as("doc_id"),
  concat(text, lit(" extra")).as("text"))
val healthy = base.unionByName(near)

// warm the JIT/codegen paths (md5 minhash + sorted-merge jaccard are
// hot loops; a cold first run measures the interpreter, not the plan)
timeIt("warmup_90k") {
  graft.llm.DedupLsh.nearDupPairs(healthy.filter(col("doc_id") % 10 === 0),
    "doc_id", "text", threshold = 0.5).count
}

timeIt("healthy_900k_uncapped") {
  graft.llm.DedupLsh.nearDupPairs(healthy, "doc_id", "text", threshold = 0.5).count
}
timeIt("healthy_900k_cap1000") {
  graft.llm.DedupLsh.nearDupPairs(healthy, "doc_id", "text", threshold = 0.5,
    maxBucketDf = Some(1000L)).count
}

// pathological corpus: the healthy 900k + 100k byte-identical clones
// (ids 3M..3.1M) = 1M docs. Uncapped this is 2x10^10 candidates -- the
// cap drops the 4 clone band-buckets before the self-join.
val boiler = lit("this exact boilerplate page body repeats verbatim across the whole crawl every single time")
val clones = spark.range(100000L).select((col("id") + 3000000L).as("doc_id"), boiler.as("text"))
val pathological = healthy.unionByName(clones)

val t0 = System.nanoTime
val pairs = graft.llm.DedupLsh.nearDupPairs(pathological, "doc_id", "text",
  threshold = 0.5, maxBucketDf = Some(1000L))
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
val total = pairs.count
println(f"PROBE_CAP pathological_1m_cap1000 rows=$total wall_s=${(System.nanoTime - t0) / 1e9}%.1f")
val clonePairs = pairs.filter(col("id_a") >= 3000000L && col("id_b") >= 3000000L).count
val realPairs = pairs.filter(col("id_a") < 3000000L && col("id_b") < 3000000L).count
println(s"PROBE_CAP clone_clone_pairs=$clonePairs (expect 0) real_pairs=$realPairs")
pairs.unpersist()
