// Probe: x19/x20 exact substring-span dedup at 1M docs (~1000x the
// sf0.01 bench corpus). Texture: 500k base docs of 60 tokens from a
// 50k-value vocabulary (mod texture => genuine cross-doc window
// repeats), plus 500k clones sharing tokens 1..40 with their base and
// diverging after (=> every pair contributes a PARTIAL span, the case
// whole-doc dedup cannot express). Measures the three stages the scale
// story claims are safe: narrow window hashing, one content-hash
// groupBy (inverted index), per-doc island merge. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/probes/probe_x19_spans_1m.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 500000L
def tokens(upTo: Int, shift: Boolean) = (0 until upTo).map { j =>
  // base and clone agree on tokens 0..39 (same doc-seed id*13), then
  // the clone's tail diverges via the +1 offset
  val seed = if (j < 40 || !shift) col("id") * 13 else col("id") * 13 + 1
  concat(lit("w"), (seed + j * 997) % 50000, lit("x" + j))
}
val base = spark.range(N).select(col("id").as("doc_id"),
  concat_ws(" ", tokens(60, shift = false): _*).as("text"))
val clones = spark.range(N).select((col("id") + N).as("doc_id"),
  concat_ws(" ", tokens(60, shift = true): _*).as("text"))
val docs = base.unionByName(clones)

val t0 = System.nanoTime
val spans = graft.llm.SpanDedup.duplicatedSpans(docs, "doc_id", "text", k = 8)
val nSpans = spans.count
val t1 = System.nanoTime
val cov = graft.llm.SpanDedup.spanCoverage(docs, "doc_id", "text", k = 8)
val covAgg = cov.agg(
  sum("dup_tokens").as("dup_tokens"), sum("n_tokens").as("n_tokens"),
  sum(when(col("n_spans") > 0, 1L).otherwise(0L)).as("docs_with_dups")).head
val t2 = System.nanoTime
// apply step: keep-one-copy removal + text reconstruction
val cleaned = graft.llm.SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", k = 8)
val remAgg = cleaned.agg(sum("n_kept").as("kept"),
  sum(when(col("n_kept") === 0L, 1L).otherwise(0L)).as("fully_cut")).head
val t3 = System.nanoTime
println(f"PROBE_X19_1M spans=$nSpans spans_wall_s=${(t1 - t0) / 1e9}%.1f " +
  f"dup_tokens=${covAgg.getLong(0)} n_tokens=${covAgg.getLong(1)} " +
  f"docs_with_dups=${covAgg.getLong(2)} coverage_wall_s=${(t2 - t1) / 1e9}%.1f " +
  f"kept_tokens=${remAgg.getLong(0)} fully_cut_docs=${remAgg.getLong(1)} " +
  f"removal_wall_s=${(t3 - t2) / 1e9}%.1f")
System.exit(0)
