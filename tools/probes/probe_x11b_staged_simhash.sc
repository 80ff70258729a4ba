// Probe: the STAGED SimHash fingerprint artifact (x11b /
// corpusSimhashFingerprints) vs the direct per-sweep recompute (x11 /
// simhashNearDupPairs) at 1M docs. The direct path re-derives the
// 32-bit fingerprint per call: tokenize + per-token md5 + 32 vote sums
// + the vote aggregation's shuffle -- all corpus-linear. The artifact is
// 2 longs/row; the staged sweep re-derives the Manku block keys
// map-side (pure bit-slices of the stored sim), so ONE artifact serves
// ANY hamming radius. This probe times:
//   direct(r)  = simhashNearDupPairs(corpus, maxHamming=r)   -- per-sweep today
//   build      = corpusSimhashFingerprints(corpus).write     -- once per snapshot
//   staged(r)  = simhashNearDupPairsStaged(artifact, r)      -- per-sweep after
// across radii r = 1 and 3 (the radius-sweep use case: dedup tuning
// scans radii the way SemDeDup scans thresholds), and asserts the two
// paths produce the IDENTICAL pair set per radius (count +
// order-insensitive checksum) -- staging must be value-invisible at
// probe scale, not just at the sf0.01 oracle.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x11b_staged_simhash.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")

val N = sys.env.getOrElse("GRAFT_X11B_N", "1000000").toLong
val root = s"/tmp/probe_x11b_$N"
graft.streaming.Streams.deleteDir(spark, root)

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime
  val r = f
  println(f"X11B n=$N $label%-24s ${(System.nanoTime - t0) / 1e9}%8.1f s")
  r
}

// near-dup texture: doc pairs (i, i+N) share 9 of 10 tokens -> close
// fingerprints; distinct i's diverge. Tokens carry the doc index so
// the vote sums differ across pairs (no fingerprint collapse).
val text10 = concat_ws(" ", (0 until 10).map(j =>
  concat(lit("w"), col("id") * 10L + j)): _*)
timed("setup_write_corpus") {
  spark.range(N / 2).select(col("id").as("doc_id"), text10.as("text"))
    .unionByName(spark.range(N / 2).select((col("id") + N).as("doc_id"),
      concat(text10, lit(" extra")).as("text")))
    .write.mode("overwrite").parquet(s"$root/corpus")
}
val docs = spark.read.parquet(s"$root/corpus")

def checksum(pairs: org.apache.spark.sql.DataFrame): (Long, Long) = {
  // 32-bit murmur summed as long (the x14b convention): random 64-bit
  // hashes would overflow the ANSI sum within a handful of rows
  val r = pairs.agg(
    count(lit(1)).as("n"),
    coalesce(sum(hash(col("id_a"), col("id_b"), col("hamming")).cast("long")), lit(0L)).as("ck"))
    .collect()(0)
  (r.getLong(0), r.getLong(1))
}

// once per snapshot: fingerprint + write (the artifact is 2 longs/row)
timed("build_artifact") {
  graft.llm.DedupLsh.corpusSimhashFingerprints(docs, "doc_id", "text", bits = 32)
    .write.mode("overwrite").parquet(s"$root/fps")
}
val fps = spark.read.parquet(s"$root/fps")

for (r <- Seq(1, 3)) {
  spark.catalog.clearCache()
  val d = timed(s"direct_sweep_r$r") {
    checksum(graft.llm.DedupLsh.simhashNearDupPairs(docs, "doc_id", "text",
      bits = 32, maxHamming = r, maxBucketDf = Some(64L)))
  }
  spark.catalog.clearCache()
  val s = timed(s"staged_sweep_r$r") {
    checksum(graft.llm.DedupLsh.simhashNearDupPairsStaged(fps,
      maxHamming = r, maxBucketDf = Some(64L)))
  }
  println(s"X11B n=$N r=$r direct=(n=${d._1},ck=${d._2}) staged=(n=${s._1},ck=${s._2}) match=${d == s}")
  assert(d == s, s"staged sweep drifted from direct at radius $r")
}
System.exit(0)
