// Scratch probe: band-bucket occupancy distribution of the x2 corpus
// (documents U drop-last-word clones) at sf0.01 and sf0.1, to pick a
// maxBucketDf for the registered x2b_minhash_capped query that
// actually BINDS (drops at least one bucket) at the correctness scale.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 8g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x2b_occupancy.sc -e ':quit'
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")

for (sf <- Seq("0.01", "0.1")) {
  val d = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet").select(col("doc_id"), col("text"))
  val toks = split(col("text"), " ")
  val corpus = d.unionByName(d.select((col("doc_id") + 10000L).as("doc_id"),
    concat_ws(" ", slice(toks, lit(1), size(toks) - 1)).as("text")))
  val sh = corpus.filter(size(split(col("text"), "\\s+")) >= 3)
    .withColumn("tk", split(col("text"), "\\s+"))
    .withColumn("sh", graft.llm.DedupLsh.shinglesFromTokens(col("tk"), 3))
    .select(col("doc_id"), col("sh"))
  val bands = sh.withColumn("band", explode(graft.llm.DedupLsh.bandKeys(col("sh"), 4, 3)))
    .select(col("doc_id"), col("band"))
  val occ = bands.groupBy("band").agg(count(lit(1)).as("df"))
    .groupBy("df").agg(count(lit(1)).as("n_buckets")).orderBy(desc("df"))
  println(s"=== sf$sf band occupancy (df -> n_buckets) ===")
  occ.show(30, false)
}
