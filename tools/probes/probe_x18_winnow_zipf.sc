// Probe: x18 winnow-fingerprint near-dup at 1M docs with a Zipf
// fingerprint distribution. Claim under test (winnowNearDupPairs
// scaladoc): the maxDf cap bounds bucket occupancy, so the head of a
// Zipf df distribution (shared boilerplate hitting ~half the corpus)
// never reaches the pair self-join. The census below measures how much
// of the fp table the cap actually removes and the max surviving
// occupancy. Docs: 10 unique tokens + a 16-token boilerplate phrase
// keyed by lowbit(doc_id+1) -- phrase df halves per key (500k, 250k,
// ..., the Zipf head); 5,000 true near-dup clones are injected on top.
// Run like probe_x16 (same spark-shell flags).
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 1000000L
val uniq = concat_ws(" ", (0 until 10).map(j => concat(lit("u"), col("id"), lit("q" + j))): _*)
val boiler = concat_ws(" ",
  (0 until 16).map(j => concat(lit("b"), expr("(id+1) & -(id+1)"), lit("z" + j))): _*)
val base = spark.range(N).select(col("id").as("doc_id"), concat(uniq, lit(" "), boiler).as("text"))
val clones = spark.range(5000).select((col("id") + N).as("doc_id"),
  concat(uniq, lit(" "), boiler, lit(" tailchange")).as("text"))
val docs = base.unionByName(clones)

// fingerprint census: replicate the operator's fp stage to measure the
// df distribution and what the maxDf=20 cap removes
graft.functions.WinnowFingerprint.register(spark)
val t0 = System.nanoTime
val fps = docs.select(col("doc_id"),
  explode(call_function("winnowq", col("text"), lit(12), lit(8))).as("fp"))
val dfs = fps.groupBy("fp").agg(count(lit(1)).as("df"))
val census = dfs.agg(
  count(lit(1)).as("distinct_fps"),
  sum("df").as("fp_rows"),
  max("df").as("max_df"),
  sum(when(col("df") <= 20, col("df"))).as("rows_surviving_cap"),
  max(when(col("df") <= 20, col("df"))).as("max_surviving_df")).head
val t1 = System.nanoTime

val pairs = graft.llm.DedupLsh.winnowNearDupPairs(docs, "doc_id", "text",
  k = 12, w = 8, minShared = 3, maxDf = 20L)
val nPairs = pairs.count
val t2 = System.nanoTime
println(f"PROBE_X18 docs=${N + 5000} distinct_fps=${census.getLong(0)} fp_rows=${census.getLong(1)} max_df=${census.getLong(2)} rows_surviving_cap=${census.getLong(3)} max_surviving_df=${census.getLong(4)} pairs=$nPairs census_s=${(t1 - t0) / 1e9}%.1f op_s=${(t2 - t1) / 1e9}%.1f")
System.exit(0)
