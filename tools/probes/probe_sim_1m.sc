// Probe: similarity family at 1M x 16-dim vectors (10x the r6 probe) --
// x17 SemDeDup (trained k-means cells + within-cell pairwise) and x7
// IVF top-k against a trained codebook. Corpus: 500k distinct vectors
// (deterministic integer-lattice coords so quantization is exact) +
// 500k near-clones (+0.001 on one axis) => real dedup work and real
// cell skew. Run like probe_x16.
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 500000L
val dim = 16
// base vector i: three base-101 digits of i mixed with per-component
// multipliers -- collisions would need i = i' mod 101^3 > N, so all
// 500k base vectors are DISTINCT (a plain (i*(j+3)) % 101 collapses
// the corpus into 101 equivalence classes and the within-cell pair
// stage goes quadratic on identical vectors -- first draft did that)
// per-component PRIME multipliers over three base-101 digits of i:
// distinct primes make the 16 collision constraints independent (no
// two ids share a full vector) and the component map nonlinear in j,
// so vectors genuinely span all 16 dims -- an affine-in-j mix
// collapses the corpus into a 2-D angular cone (first draft did, and
// SemDeDup correctly deduped 99% of it). The +1 shift keeps
// components in [0.1, 10.2]: a zero-norm vector is undefined in
// cosine space (ANSI division error -- see Similarity.cosineQ doc).
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

// x17 SemDeDup: cells sized ~sqrt-corpus (1024 cells ~ 1000/cell)
var t0 = System.nanoTime
val kept = graft.llm.Similarity.semanticDedup(corpus, numCells = Some(1024), iters = 2,
  threshold = 0.999999).count
println(f"PROBE_SIM_1M semantic_dedup kept=$kept of ${2 * N} wall_s=${(System.nanoTime - t0) / 1e9}%.1f")

// x7 IVF top-k: trained codebook, 8 queries, probe 4 of 1024 cells
t0 = System.nanoTime
val queries = base.filter(col("vec_id") < 8)
val cents = graft.llm.Similarity.kmeansCodebook(corpus, numCells = 1024, iters = 2)
val topk = graft.llm.Similarity.ivfTopK(corpus, queries, k = 10,
  numCells = 1024, nProbe = 4, centroids = Some(cents)).count
println(f"PROBE_SIM_1M ivf_topk rows=$topk wall_s=${(System.nanoTime - t0) / 1e9}%.1f")
System.exit(0)
