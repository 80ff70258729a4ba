// Probe: the STAGED corpus sign-bucket artifact (x27b /
// corpusSignBuckets) vs the direct per-batch corpus recompute (x27 /
// crossEmbeddingNearDupPairs) at 1M 64-dim vectors -- the x14b
// artifact-split measurement applied to the embedding family. The
// direct sweep re-quantizes and re-projects (2 tables x 4 planes,
// each a 64-term dot product) every corpus vector on every batch; the
// artifact stores (vec_id, nv, buckets) once per snapshot and the
// per-batch corpus cost drops to a columnar scan + map-side explode.
//   direct   = crossEmbeddingNearDupPairs(batch, corpus)   -- per-batch today
//   build    = corpusSignBuckets(corpus).write             -- once per snapshot
//   staged   = crossEmbeddingNearDupPairsStaged(batch, a)  -- per-batch after
// Asserts the two sweeps produce the IDENTICAL pair set (count +
// order-insensitive checksum) -- staging must be value-invisible at
// probe scale, not just at the sf0.01 oracle.
// Run: GRAFT_X27B_N=1000000 /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x27b_staged_buckets.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")

val N = sys.env.getOrElse("GRAFT_X27B_N", "1000000").toLong
// production sizes 2^planes buckets to the corpus so per-bucket
// occupancy (and with it the verify cost) stays bounded -- the
// registry's 4 planes are a 500-vector test knob; at 1M vectors use
// 12 planes (4096 buckets/table, ~244 vectors/bucket)
val P = sys.env.getOrElse("GRAFT_X27B_PLANES", "12").toInt
val B = N / 100L
val root = s"/tmp/probe_x27b_$N"
graft.streaming.Streams.deleteDir(spark, root)

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime
  val r = f
  println(f"X27B n=$N $label%-24s ${(System.nanoTime - t0) / 1e9}%8.1f s")
  r
}

// deterministic pseudo-random 64-dim vectors via xxhash64 so every id
// gets a DISTINCT direction (cosine near 0 between ids, sign buckets
// spread, no degenerate clone mass -- a linear (id*a + j*b) % p
// formula here would alias every p-th id into an identical vector and
// blow the pair set up by the clone-class size)
val vec64 = transform(sequence(lit(1), lit(64)),
  j => (pmod(xxhash64(col("id") * 64L + j), lit(101L)) - 50L).cast("double"))
timed("setup_write_corpus") {
  spark.range(N).select(col("id").as("vec_id"), vec64.as("embedding"))
    .write.mode("overwrite").parquet(s"$root/corpus")
}
val corpus = spark.read.parquet(s"$root/corpus")

// batch: perturbed near-clones of the first B vectors (the registry
// fixture's replayable +0.01 noise, cosine ~ 0.9999), re-keyed clear
// of the corpus id space
timed("setup_write_batch") {
  corpus.filter(col("vec_id") < B)
    .select(col("vec_id"),
      transform(col("embedding"), (x, j) =>
        x + lit(0.01) * (((col("vec_id") + j) % 3) - 1)).as("embedding"))
    .select((col("vec_id") + N * 10L).as("vec_id"), col("embedding"))
    .write.mode("overwrite").parquet(s"$root/batch")
}
val batch = spark.read.parquet(s"$root/batch")

def checksum(pairs: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = pairs.agg(count(lit(1)),
    sum(hash(col("id_new"), col("id_base"),
      round(col("cosine") * 1e9).cast("long")).cast("long"))).head
  (r.getLong(0), r.getLong(1))
}

// A -- the per-batch cost today: corpus re-quantized + re-projected
val (nDirect, ckDirect) = timed("direct_sweep") {
  checksum(graft.llm.Similarity.crossEmbeddingNearDupPairs(batch, corpus,
    threshold = 0.99, numPlanes = P))
}

// B -- once per corpus snapshot: materialize (vec_id, nv, buckets)
timed("build_bucket_artifact") {
  graft.llm.Similarity.corpusSignBuckets(corpus, numPlanes = P)
    .write.mode("overwrite").parquet(s"$root/buckets")
}

// C -- the per-batch cost after: artifact scan + map-side explode
val sigs = spark.read.parquet(s"$root/buckets")
val (nStaged, ckStaged) = timed("staged_sweep") {
  checksum(graft.llm.Similarity.crossEmbeddingNearDupPairsStaged(batch, sigs,
    threshold = 0.99, numPlanes = P))
}

println(s"X27B n=$N planes=$P pairs_direct=$nDirect pairs_staged=$nStaged " +
  s"identical=${nDirect == nStaged && ckDirect == ckStaged} " +
  s"ok=${nDirect > 0 && nDirect == nStaged && ckDirect == ckStaged}")
