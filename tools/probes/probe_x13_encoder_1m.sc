// Probe: the round-8 feature-hashing encoder (x13) at 1M documents.
// Each ~20-token doc hashes ~39 uni+bigrams through md5 into 64
// signed buckets, then L2-normalizes in 1e-6 fixed point. Claims
// under test: (a) throughput at local[32] on the real code path;
// (b) batch size NEVER changes results at scale (the batching is
// plumbing, the projection is per-doc pure) -- checked by comparing
// full checksums of the 1M vectors encoded at batchSize 64 vs 256;
// (c) the driver-side replay of featureHashVector matches the
// distributed result on a spot sample.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 8g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x13_encoder_1m.sc -e ':quit'
import org.apache.spark.sql.functions._
import graft.llm.Inference

val docs = (spark.range(0L, 1000000L).toDF("doc_id")
  .withColumn("text", concat_ws(" ",
    concat(lit("d"), col("doc_id")) +:
      (0 until 19).map(j => concat(lit("w"), (col("doc_id") * 13L + j) % 7000L)): _*)))

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime
  val r = f
  println(f"PROBE $label%-26s ${(System.nanoTime - t0) / 1e9}%8.1f s")
  r
}

def checksum(batchSize: Int): Long = timed(s"encode-1M-batch$batchSize") {
  (Inference.encodeBatched(docs, "doc_id", "text", dim = 64, batchSize = batchSize)
    .select(sum(expr("aggregate(embedding, 0L, (a, x) -> a + x * hash(doc_id))")))
    .head().getLong(0))
}
val c64 = checksum(64)
val c256 = checksum(256)
println("PROBE batch-invariant=" + (c64 == c256) + " checksum=" + c64)

// spot replay: driver-side featureHashVector on 5 sampled docs must
// equal the distributed vectors bit-for-bit
val sample = (Inference.encodeBatched(docs, "doc_id", "text", dim = 64)
  .filter(col("doc_id") % 200000L === 7L)
  .select("doc_id", "embedding").collect())
val texts = docs.filter(col("doc_id") % 200000L === 7L)
  .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
val md = java.security.MessageDigest.getInstance("MD5")
val ok = sample.forall { r =>
  val got = r.getSeq[Long](1)
  val exp = Inference.featureHashVector(md, texts(r.getLong(0)), 64).toSeq
  got == exp
}
println("PROBE spot-replay rows=" + sample.length + " match=" + ok)
