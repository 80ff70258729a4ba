// Probe: reliable-checkpoint mode of the cluster loop at 1M docs.
// Round-8 added a durable df.checkpoint() mode to nearDupClusters
// (executor-loss-safe for multi-hour cluster runs). Claim under test:
// the durability premium over localCheckpoint is bounded (checkpoint
// files are written once per iteration, sized by the label table =
// two longs per doc, NOT by the corpus), and both modes converge to
// the same component count at 1M members.
// Fixture: same shape as probe_x8_clusters_1m.sc -- 1M synthetic
// pair-edges forming 50k chained components of 20 docs each.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 8g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x8_reliable_1m.sc -e ':quit'
import org.apache.spark.sql.functions._

def timed(label: String)(f: => Long): Long = {
  val t0 = System.nanoTime
  val r = f
  println(f"PROBE $label%-28s ${(System.nanoTime - t0) / 1e9}%8.1f s  components=$r")
  r
}

// 50k components x 20 members, chained (worst case for propagation
// depth without pointer jumping): edges (i, i+1) within each chain
val edges = (spark.range(0L, 1000000L).toDF("id")
  .filter(col("id") % 20L =!= 19L)
  .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"),
    lit(1.0).as("jaccard")))

val local = timed("clusters-localCheckpoint") {
  (graft.llm.DedupLsh.nearDupClusters(edges, reliableCheckpoints = Some(false))
    .select(countDistinct(col("cluster"))).head().getLong(0))
}

val ckDir = "/tmp/probe_x8_reliable_ckpt"
spark.sparkContext.setCheckpointDir(ckDir)
val reliable = timed("clusters-reliableCheckpoint") {
  (graft.llm.DedupLsh.nearDupClusters(edges, reliableCheckpoints = Some(true))
    .select(countDistinct(col("cluster"))).head().getLong(0))
}
// a second local-mode run: the first pays JVM/codegen warmup, so the
// honest premium comparison is warm-local vs warm-reliable
val localWarm = timed("clusters-local-warm") {
  (graft.llm.DedupLsh.nearDupClusters(edges, reliableCheckpoints = Some(false))
    .select(countDistinct(col("cluster"))).head().getLong(0))
}
println("PROBE components match=" + (local == reliable && reliable == localWarm) +
  " (expect 50000)")
