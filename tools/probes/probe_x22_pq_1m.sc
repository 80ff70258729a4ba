// Probe: PQ / IVFADC at 1M x 64-dim vectors -- the x22/x23 scale
// claims under test (Pq scaladoc):
//   (1) codebook training is ONE scan of the subvector frame per
//       iteration for all m subspaces (not m scans);
//   (2) encode is a broadcast argmin hash agg, corpus touched once;
//   (3) brute ADC (x22) pays #queries x #corpus x m intermediate rows,
//       while IVFADC (x23) bounds scoring to the probed cells -- the
//       measured gap IS the reason the composition exists;
//   (4) peak shuffle never carries raw 64-long vectors past the
//       subvector split.
// Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_x22_pq_1m.sc
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 1000000L
val dim = 64
// 64-dim modular fixture: three mixing primes per position so cells
// don't collapse; values in (0, 1] like the real embeddings table
val vec = transform(sequence(lit(0), lit(dim - 1)),
  j => (((col("id") * (j * 7L + 3L)
        + (col("id") / 101L) * (j * 13L + 5L)
        + (col("id") / 10201L) * (j * 17L + 11L)) % 97L) + 1L)
    .cast("double") / 97.0)
val corpus = spark.range(0, N).select(col("id").as("vec_id"), vec.as("embedding"))
val queries = corpus.filter(col("vec_id") < 8)

def timed(label: String)(f: => Long): Unit = {
  spark.catalog.clearCache()
  val t0 = System.nanoTime
  val n = f
  println(f"PROBE_PQ $label%-28s rows=$n%-9d wall_s=${(System.nanoTime - t0) / 1e9}%.1f")
}

// stage walls via the public pieces (256 PQ cells per subspace)
val v = corpus.select(col("vec_id"), graft.llm.Similarity.quantize(col("embedding")).as("nv"))
var cents: org.apache.spark.sql.DataFrame = null
timed("train_codebooks_256x8")     { cents = graft.llm.Pq.trainCodebooks(v, m = 8, numCells = 256, iters = 2); cents.count }
timed("encode_1m")                 { graft.llm.Pq.encode(v, cents, m = 8).count }

// x22 brute ADC: 8 queries score ALL 1M codes (8M pairs x m rows)
timed("x22_brute_adc_8q")          { graft.llm.Pq.adcTopK(corpus, queries, k = 10, numCells = 256).count }

// x23 IVFADC: 256 coarse cells prune scoring to ~nProbe/256 of the
// corpus (the 64-dim cosine assign at 1024 cells is the dominant cost
// at this dim; 256 keeps the probe honest about the ADC gap itself)
timed("x23_ivfadc_8q_256cells")    { graft.llm.Pq.ivfAdcTopK(corpus, queries, k = 10,
  numCells = 256, coarseCells = 256, nProbe = 4).count }
System.exit(0)
