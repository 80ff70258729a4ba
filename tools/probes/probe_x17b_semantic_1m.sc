// Probe: STAGED SemDeDup serving (x17b / stageSemanticCells +
// semanticDedupStaged) vs the direct train-per-call path (x17 /
// semanticDedup) at 1M 64-dim vectors -- the x7b build-once
// measurement applied to the dedup (not ANN) consumer of the k-means
// cells. The direct path pays quantize + `iters` broadcast-argmax
// training passes + a final assignment pass over the corpus on EVERY
// call; the artifact stores (vec_id, cell_id, nv) once per snapshot
// and a serving sweep pays only the cell self-join + cosine verify.
// The serve-many story is SemDeDup's own knob: the paper tunes the
// drop threshold per downstream mix, and with the artifact each extra
// threshold costs one self-join, not one training run.
//   direct  = semanticDedup(corpus, cells, iters, t)      -- per sweep today
//   build   = stageSemanticCells(corpus, path, cells)     -- once per snapshot
//   staged  = semanticDedupStaged(spark, path, t)         -- per sweep after
// Asserts the 0.99 sweeps produce the IDENTICAL kept set (count +
// order-insensitive checksum) -- staging must be value-invisible at
// probe scale, not just at the sf0.01 oracle -- then times two more
// thresholds through the artifact (the serve-many case).
// Run: GRAFT_X17B_N=1000000 /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x17b_semantic_1m.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")

val N = sys.env.getOrElse("GRAFT_X17B_N", "1000000").toLong
// production sizes cells so Sigma|cell|^2 stays tractable (~sqrt(n)
// cells at corpus scale -- the semanticDedup scaladoc); the
// registry's 16 cells are a 500-vector test knob. 1024 cells at 1M
// ~= 977 vectors/cell, the same sizing as the x7b IVF probe.
val CELLS = sys.env.getOrElse("GRAFT_X17B_CELLS", "1024").toInt
val root = s"/tmp/probe_x17b_$N"
graft.streaming.Streams.deleteDir(spark, root)

def timed[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime
  val r = f
  val s = (System.nanoTime - t0) / 1e9
  println(f"X17B n=$N $label%-26s $s%8.1f s")
  (r, s)
}

// deterministic pseudo-random 64-dim directions via xxhash64 (distinct
// direction per id, cosine near 0 across ids -- the x27b probe's
// anti-aliasing rationale), EXCEPT that the second id of every
// 100-block clones the first with the registry fixture's replayable
// +0.01 perturbation (cosine ~0.9999): 10k planted duplicate pairs
// whose members land in the same k-means cell (near-identical vectors
// share an argmax), so the 0.99 drop rule genuinely fires at scale.
val dirKey = when(pmod(col("id"), lit(100L)) === 1L, col("id") - 1L).otherwise(col("id"))
val base = transform(sequence(lit(1), lit(64)),
  j => (pmod(xxhash64(dirKey * 64L + j), lit(101L)) - 50L).cast("double"))
val vec64 = when(pmod(col("id"), lit(100L)) === 1L,
    transform(base, (x, j) => x + lit(0.01) * (((col("id") + j) % 3) - 1)))
  .otherwise(base)
timed("setup_write_corpus") {
  spark.range(N).select(col("id").as("vec_id"), vec64.as("embedding"))
    .write.mode("overwrite").parquet(s"$root/corpus")
}
val corpus = spark.read.parquet(s"$root/corpus")

def checksum(kept: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = kept.agg(count(lit(1)),
    sum(hash(col("vec_id"), col("cell_id")).cast("long"))).head
  (r.getLong(0), r.getLong(1))
}

// A -- the per-sweep cost today: train + assign + dedup in one call
val ((nDirect, ckDirect), tDirect) = timed("direct_sweep_t0.99") {
  checksum(graft.llm.Similarity.semanticDedup(corpus, numCells = Some(CELLS),
    iters = 2, threshold = 0.99))
}

// B -- once per corpus snapshot: train + assign, cells to parquet
val (_, tBuild) = timed("build_cell_artifact") {
  graft.llm.Similarity.stageSemanticCells(corpus, s"$root/cells",
    numCells = Some(CELLS), iters = 2)
}

// C -- the per-sweep cost after: self-join + verify only
val ((nStaged, ckStaged), tStaged) = timed("staged_sweep_t0.99") {
  checksum(graft.llm.Similarity.semanticDedupStaged(spark, s"$root/cells",
    threshold = 0.99))
}

// D -- serve-many: two more thresholds through the SAME artifact (the
// paper's tuning loop; each would be a full retrain on the direct path)
val ((nT95, _), tT95) = timed("staged_sweep_t0.95") {
  checksum(graft.llm.Similarity.semanticDedupStaged(spark, s"$root/cells",
    threshold = 0.95))
}
val ((nT90, _), tT90) = timed("staged_sweep_t0.90") {
  checksum(graft.llm.Similarity.semanticDedupStaged(spark, s"$root/cells",
    threshold = 0.90))
}

println(f"X17B n=$N cells=$CELLS kept_direct=$nDirect kept_staged=$nStaged " +
  f"kept_t95=$nT95 kept_t90=$nT90 " +
  f"identical=${nDirect == nStaged && ckDirect == ckStaged} " +
  f"speedup_per_sweep=${tDirect / tStaged}%.1f " +
  f"ok=${nDirect > 0 && nDirect < N && nDirect == nStaged && ckDirect == ckStaged}")
