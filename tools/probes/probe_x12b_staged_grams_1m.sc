// Probe: the STAGED contamination gram index (x12b / stageCorpusGrams)
// vs the direct per-screen corpus recompute (x12 / overlapPairs) at 1M
// docs. The corpus is the big FIXED side of benchmark screening and
// benchmarks are what change; the direct path re-tokenizes +
// re-shingles + df-counts the corpus PER SCREENED BENCHMARK, the staged
// path scans the (g, df, doc_id) postings with the df cap pushed to the
// parquet scan. Three numbers:
//   direct = overlapPairs(corpus, eval)          -- per-screen cost today
//   build  = stageCorpusGrams(corpus)            -- once per snapshot
//   staged = overlapPairsStaged(idx, eval)       -- per-screen cost after
// plus an order-insensitive checksum proving value-identity at 1M
// (not just at the sf0.01 oracle), and the artifact's on-disk size.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x12b_staged_grams_1m.sc -e ':quit'
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")

val N = sys.env.getOrElse("GRAFT_X12B_N", "1000000").toLong
val root = s"/tmp/probe_x12b_$N"
graft.streaming.Streams.deleteDir(spark, root)

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime
  val r = f
  println(f"X12B n=$N $label%-24s ${(System.nanoTime - t0) / 1e9}%8.1f s")
  r
}

// 20-token docs; every 1000th doc leaks a 5-token span of eval doc
// id/1000 (so real contamination hits exist), the rest are unique
// integer family id: Column `/` on longs yields DOUBLE and the leak
// tokens would render "leak0.0" corpus-side vs "leak0" eval-side
val fam = (col("id") / 1000L).cast("long")
val leak = concat_ws(" ", (0 until 5).map(j =>
  concat(lit("leak"), fam * 5L + j)): _*)
val uniq = concat_ws(" ", (5 until 20).map(j =>
  concat(lit("w"), col("id") * 20L + j)): _*)
val text = when(col("id") % 1000L === 0L, concat_ws(" ", leak, uniq))
  .otherwise(concat_ws(" ", concat_ws(" ", (0 until 5).map(j =>
    concat(lit("u"), col("id") * 20L + j)): _*), uniq))
timed("setup_write_corpus") {
  spark.range(N).select(col("id").as("doc_id"), text.as("text"))
    .write.mode("overwrite").parquet(s"$root/corpus")
}
val docs = spark.read.parquet(s"$root/corpus")
// the benchmark: 100 eval docs, each the leak span of its family plus
// its own filler -- eval doc e is contaminated by exactly ONE corpus
// doc (id = e*1000); the other 900 leaked corpus docs match no eval
// doc, so the expected pair count is 100
val evalDocs = spark.range(100).select(
  col("id").as("eval_id"),
  concat_ws(" ",
    concat_ws(" ", (0 until 5).map(j => concat(lit("leak"), col("id") * 5L + j)): _*),
    concat_ws(" ", (0 until 10).map(j => concat(lit("e"), col("id") * 10L + j)): _*)).as("text"))
  .localCheckpoint()

def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
  // bit_xor: order-insensitive and overflow-free (a SUM of xxhash64
  // longs trips ANSI overflow past a few hundred rows)
  val r = df.agg(count(lit(1)),
    expr("bit_xor(xxhash64(doc_id, eval_id, shared_grams))")).head()
  (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
}

var direct: (Long, Long) = null
timed("direct_per_screen") {
  direct = checksum(graft.llm.Contamination.overlapPairs(
    docs, evalDocs, "doc_id", "text", "eval_id", n = 3, minShared = 2, maxDf = 50L))
}
timed("build_gram_index") {
  // 4096 buckets: bucket pruning only bites when the benchmark's gram
  // set touches a small fraction of buckets -- the knob a deployment
  // sizes to its benchmark sizes
  graft.llm.Contamination.stageCorpusGrams(docs, s"$root/grams", "doc_id", "text",
    n = 3, nBuckets = 4096)
}
var staged: (Long, Long) = null
timed("staged_per_screen") {
  staged = checksum(graft.llm.Contamination.overlapPairsStaged(
    spark, s"$root/grams", evalDocs, "eval_id", "text",
    n = 3, minShared = 2, maxDf = 50L))
}
require(direct == staged, s"staging must be value-invisible: $direct vs $staged")
require(direct._1 > 0, s"fixture must produce real contamination hits, got $direct")
println(s"X12B pairs=$direct (direct == staged)")
// a SMALL benchmark (5 docs, ~65 grams): the bucket-pruned regime --
// the staged scan touches <=65 of 4096 partitions
val evalSmall = evalDocs.filter(col("eval_id") < 5).localCheckpoint()
timed("direct_small_benchmark") {
  checksum(graft.llm.Contamination.overlapPairs(
    docs, evalSmall, "doc_id", "text", "eval_id", n = 3, minShared = 2, maxDf = 50L))
}
timed("staged_small_benchmark") {
  checksum(graft.llm.Contamination.overlapPairsStaged(
    spark, s"$root/grams", evalSmall, "eval_id", "text",
    n = 3, minShared = 2, maxDf = 50L))
}
val fs = new org.apache.hadoop.fs.Path(root)
  .getFileSystem(spark.sparkContext.hadoopConfiguration)
val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(s"$root/grams")).getLength
println(f"X12B artifact_size=${bytes / 1048576.0}%.0f MB for $N docs")
System.exit(0)
