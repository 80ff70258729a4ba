// Probe: x7b persisted IVF index at 1M x 16-dim vectors -- separate the
// one-time index BUILD wall from the per-query wall. Claim under test
// (Similarity.buildIvfIndex scaladoc): the round-7 sim probe spent most
// of its 104.6 s retraining the codebook inside every query; with the
// index on parquet, a query is a centroid read + partition-pruned
// member scan of nProbe cells. Same corpus construction as
// probe_sim_1m.sc. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_x7b_ivf_index_1m.sc
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 500000L
val dim = 16
val P = typedLit(Seq(3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59))
val Q = typedLit(Seq(61, 67, 71, 73, 79, 83, 89, 97, 103, 107, 109, 113, 127, 131, 137, 139))
val R = typedLit(Seq(149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199, 211, 223, 227, 229))
val vec = transform(sequence(lit(0), lit(dim - 1)),
  j => (((col("id") * element_at(P, (j + 1).cast("int"))
        + (col("id") / 101).cast("long") * element_at(Q, (j + 1).cast("int"))
        + (col("id") / 10201).cast("long") * element_at(R, (j + 1).cast("int"))) % 101) + 1)
    .cast("double") / 10.0)
val base = spark.range(1, N + 1).select(col("id").as("vec_id"), vec.as("embedding"))
val clones = spark.range(1, N + 1).select((col("id") + N).as("vec_id"),
  transform(vec, (x, j) => when(j === 0, x + lit(0.001)).otherwise(x)).as("embedding"))
val corpus = base.unionByName(clones)
val idx = sys.props("java.io.tmpdir") + "/graft_probe_ivf_index_1m"
graft.streaming.Streams.deleteDir(spark, idx)

// one-time build: train 1024-cell codebook (2 iters) + write index
var t0 = System.nanoTime
graft.llm.Similarity.buildIvfIndex(corpus, idx, numCells = 1024, iters = 2)
println(f"PROBE_X7B build_wall_s=${(System.nanoTime - t0) / 1e9}%.1f")

// query-only wall, 3 repeats (8 queries, probe 4 of 1024 cells)
val queries = base.filter(col("vec_id") < 8)
for (rep <- 1 to 3) {
  spark.catalog.clearCache()
  t0 = System.nanoTime
  val n = graft.llm.Similarity.ivfTopKPrebuilt(spark, idx, queries, k = 10, nProbe = 4).count
  println(f"PROBE_X7B query_rep=$rep rows=$n query_wall_s=${(System.nanoTime - t0) / 1e9}%.1f")
}

// incremental ingest: append a 100k batch (10% of corpus) without retraining
val batch = spark.range(1, 100001L).select((col("id") + 4 * N).as("vec_id"),
  transform(vec, x => x + lit(0.0005)).as("embedding"))
t0 = System.nanoTime
graft.llm.Similarity.appendToIvfIndex(batch, idx)
println(f"PROBE_X7B append_100k_wall_s=${(System.nanoTime - t0) / 1e9}%.1f")
System.exit(0)
