// Probe: the STAGED corpus band artifact (x14b / corpusBandSignatures)
// vs the direct per-batch corpus recompute (x14 / crossNearDupPairs) at
// 1M and 10M docs. The 10M e5 composition probe measured the band
// sweep's per-batch corpus re-shingle + re-minhash as the only
// corpus-linear per-batch term in the flagship chain (s2 = 81.7 s at
// 10M); corpusBandSignatures is the materialize-once artifact that
// claims to remove it. This probe puts a number on the claim, same
// corpus texture as the e5 probe so the scales are comparable:
//   direct   = crossNearDupPairs(batch, corpus)       -- per-batch cost today
//   build    = corpusBandSignatures(corpus).write     -- once per snapshot
//   staged   = crossNearDupPairsStaged(batch, arti)   -- per-batch cost after
// and asserts the two sweeps produce the IDENTICAL pair set (count +
// order-insensitive checksum) -- staging must be value-invisible at
// probe scale, not just at the sf0.01 oracle.
// Run: GRAFT_X14B_N=10000000 /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x14b_staged_bands.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")

val N = sys.env.getOrElse("GRAFT_X14B_N", "1000000").toLong
val B = N / 100L
val root = s"/tmp/probe_x14b_$N"
graft.streaming.Streams.deleteDir(spark, root)

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime
  val r = f
  println(f"X14B n=$N $label%-24s ${(System.nanoTime - t0) / 1e9}%8.1f s")
  r
}

// unique-shingle 20-token docs (the e5/spill-probe corpus texture)
val text20 = concat_ws(" ", (0 until 20).map(j =>
  concat(lit("w"), col("id") * 20L + j)): _*)
timed("setup_write_corpus") {
  spark.range(N).select(col("id").as("doc_id"), text20.as("text"))
    .write.mode("overwrite").parquet(s"$root/corpus")
}
val docs = spark.read.parquet(s"$root/corpus")

// batch: one-token near-clones of the first B docs (jaccard 18/19),
// re-keyed clear of the corpus id space
timed("setup_write_batch") {
  docs.filter(col("doc_id") < B)
    .select((col("doc_id") + N * 10L).as("doc_id"),
      concat(col("text"), lit(" v2")).as("text"))
    .write.mode("overwrite").parquet(s"$root/batch")
}
val batch = spark.read.parquet(s"$root/batch")

def checksum(pairs: org.apache.spark.sql.DataFrame): (Long, Long) = {
  val r = pairs.agg(count(lit(1)),
    sum(hash(col("id_new"), col("id_base"),
      round(col("jaccard") * 1e9).cast("long")).cast("long"))).head
  (r.getLong(0), r.getLong(1))
}

// A -- the per-batch cost today: corpus re-shingled + re-minhashed
val (nDirect, ckDirect) = timed("direct_sweep") {
  checksum(graft.llm.DedupLsh.crossNearDupPairs(batch, docs, "doc_id", "text"))
}

// B -- once per corpus snapshot: materialize (id, sh, bands)
timed("build_band_artifact") {
  graft.llm.DedupLsh.corpusBandSignatures(docs, "doc_id", "text")
    .write.mode("overwrite").parquet(s"$root/bands")
}

// C -- the per-batch cost after: artifact scan + map-side explode
val sigs = spark.read.parquet(s"$root/bands")
val (nStaged, ckStaged) = timed("staged_sweep") {
  checksum(graft.llm.DedupLsh.crossNearDupPairsStaged(batch, sigs, "doc_id", "text"))
}

println(s"X14B n=$N pairs_direct=$nDirect pairs_staged=$nStaged " +
  s"identical=${nDirect == nStaged && ckDirect == ckStaged} " +
  s"ok=${nDirect > 0 && nDirect == nStaged && ckDirect == ckStaged}")
