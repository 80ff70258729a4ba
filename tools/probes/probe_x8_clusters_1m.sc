// Probe: x8/x10 near-dup clustering at 1M docs over the round-7
// thin-bands pair generator. The cluster path (min-label propagation +
// pointer jumping over a localCheckpointed pair list) is the heaviest
// remaining query family at sf0.1; this measures the full chain --
// pairs -> clusters -> dedup apply -- at 200x the bench corpus.
// Corpus: 500k distinct docs, 10x exact-duplicate texture per 50k ids
// (token values repeat mod 50000) + 500k near-clones => large true
// clusters with chained membership. Run like probe_x16.
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 500000L
val text = concat_ws(" ", (0 until 20).map(j => concat(lit("w"), (col("id") * 7 + j) % 50000, lit("t" + j))): _*)
val base = spark.range(N).select(col("id").as("doc_id"), text.as("text"))
val clones = spark.range(N).select((col("id") + N).as("doc_id"),
  concat(text, lit(" extra")).as("text"))
val docs = base.unionByName(clones)

val t0 = System.nanoTime
val pairs = graft.llm.DedupLsh.nearDupPairs(docs, "doc_id", "text")
val clusters = graft.llm.DedupLsh.nearDupClusters(pairs)
println("cluster_cols=" + clusters.columns.mkString(","))
val nClusters = clusters.select(countDistinct(clusters.columns.last)).head.getLong(0)
val nMembers = clusters.count
val t1 = System.nanoTime
println(f"PROBE_X8_1M members=$nMembers clusters=$nClusters wall_s=${(t1 - t0) / 1e9}%.1f")
System.exit(0)
