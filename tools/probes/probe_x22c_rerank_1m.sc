// Probe: x22c ADC shortlist + exact re-rank at 1M x 64-dim vectors.
// Claims under test: (a) the re-rank's added cost over plain ADC is the
// shortlist-sized exact-cosine join, small next to the code scan;
// (b) recall@10 strictly improves over plain ADC at the same index;
// (c) both are far cheaper than brute force, which is the thing the
// index exists to avoid.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x22c_rerank_1m.sc -e ':quit'
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")

def timed(label: String)(f: => Unit): Double = {
  val t0 = System.nanoTime
  f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-28s $s%8.1f s")
  s
}

val n = 1000000L
val corpus = spark.range(n)
  .select(col("id").as("vec_id"),
    transform(sequence(lit(1), lit(64)),
      j => (((col("id") % 997) * 131 + j * 29) % 211).cast("double") / lit(1000.0))
      .as("embedding"))
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
println("PROBE corpus rows=" + corpus.count())
val queries = corpus.filter(col("vec_id") % 62501L === 0L) // 16 queries
val idx = sys.props("java.io.tmpdir") + "/graft_probe_x22c_idx"
graft.streaming.Streams.deleteDir(spark, idx)

timed("build-adc-index-1m") { graft.llm.Pq.buildAdcIndex(corpus, idx) }

var adc: org.apache.spark.sql.DataFrame = null
var rer: org.apache.spark.sql.DataFrame = null
var bf: org.apache.spark.sql.DataFrame = null
val tAdc = timed("adc-top10") {
  adc = graft.llm.Pq.adcTopKPrebuilt(spark, idx, queries, k = 10)
  adc.write.format("noop").mode("overwrite").save()
}
val tRer = timed("rerank-top10-short50") {
  rer = graft.llm.Pq.adcTopKReranked(spark, idx, corpus, queries, k = 10, shortlist = 50)
  rer.write.format("noop").mode("overwrite").save()
}
val tBf = timed("bruteforce-top10") {
  bf = graft.llm.Similarity.bruteForceTopK(corpus, queries, k = 10)
  bf.write.format("noop").mode("overwrite").save()
}
val exact = bf.select("query_id", "neighbor_id")
def recall(df: org.apache.spark.sql.DataFrame): Double = {
  val hits = exact.join(df.select("query_id", "neighbor_id"),
    Seq("query_id", "neighbor_id"), "left_semi").count()
  hits.toDouble / exact.count()
}
println(f"PROBE recall@10 adc=${recall(adc)}%.3f rerank=${recall(rer)}%.3f" +
  f" cost adc=$tAdc%.1f rerank=$tRer%.1f brute=$tBf%.1f s")
corpus.unpersist()
