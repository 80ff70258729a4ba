// Probe: the round-14 MODEL-staging splits (y28b BPE merges, y21b DSIR
// vocab+totals) at 1M docs -- put numbers on what the train-once /
// serve-many split removes per call, the same cost-split protocol as
// probe_x11b_staged_simhash.sc. Corpus texture: 10-token docs over a
// 10k-word vocabulary (BPE needs real pair statistics, DSIR needs
// shared terms across the target/raw split), deterministic via integer
// arithmetic. Each family times:
//   direct  = train + serve in one call (the y28/y21 registry shape)
//   build   = stage the model once (atomicSwap publish included)
//   staged  = serve against the staged model (the y28b/y21b shape)
// and asserts direct == staged output (count + order-insensitive
// checksum) -- staging must be value-invisible at probe scale too.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_staged_models_1m.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")

val N = sys.env.getOrElse("GRAFT_SM_N", "1000000").toLong
val root = s"/tmp/probe_staged_models_$N"
graft.streaming.Streams.deleteDir(spark, root)

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime
  val r = f
  println(f"SMODEL n=$N $label%-26s ${(System.nanoTime - t0) / 1e9}%8.1f s")
  r
}

// 10-token docs over a 10k-word vocabulary; lang split 50/50 by parity
val text10 = concat_ws(" ", (0 until 10).map(j =>
  concat(lit("w"), pmod(col("id") * 2654435761L + j * 40503L, lit(10000L)))): _*)
timed("setup_write_corpus") {
  spark.range(N).select(col("id").as("doc_id"), text10.as("text"),
    when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    .write.mode("overwrite").parquet(s"$root/corpus")
}
val docs = spark.read.parquet(s"$root/corpus")

def ck(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): (Long, Long) = {
  val r = df.agg(count(lit(1)).as("n"),
    coalesce(sum(hash(cols.map(col): _*).cast("long")), lit(0L)).as("ck")).collect()(0)
  (r.getLong(0), r.getLong(1))
}

// ---- BPE (y28 vs y28b) ----
val dBpe = timed("bpe_direct_train+encode") {
  val merges = graft.llm.Corpus.bpeMerges(docs, "doc_id", "text", numMerges = 6)
    .orderBy("rank").collect().map(_.getString(1)).toSeq
  ck(graft.llm.Corpus.bpeEncode(docs, "doc_id", "text", merges),
    Seq("doc_id", "n_words", "n_bpe_tokens", "bpe_text"))
}
timed("bpe_stage_model") {
  graft.llm.Corpus.stageBpeModel(docs, "doc_id", "text", s"$root/bpe", numMerges = 6)
}
val sBpe = timed("bpe_staged_encode") {
  val merges = graft.llm.Corpus.loadBpeModel(spark, s"$root/bpe")
  ck(graft.llm.Corpus.bpeEncode(docs, "doc_id", "text", merges),
    Seq("doc_id", "n_words", "n_bpe_tokens", "bpe_text"))
}
println(s"SMODEL n=$N bpe direct=$dBpe staged=$sBpe match=${dBpe == sBpe}")
assert(dBpe == sBpe, "staged BPE encode drifted from direct")

// ---- DSIR (y21 vs y21b) ----
val dDsir = timed("dsir_direct_train+score") {
  ck(graft.llm.Corpus.importanceWeights(docs, "doc_id", "text", col("lang") === "en"),
    Seq("doc_id", "n_tokens", "weight_micro"))
}
timed("dsir_stage_model") {
  graft.llm.Corpus.stageDsirModel(docs, "doc_id", "text", col("lang") === "en", s"$root/dsir")
}
val sDsir = timed("dsir_staged_score") {
  ck(graft.llm.Corpus.importanceWeightsStaged(docs, "doc_id", "text",
    spark.read.parquet(s"$root/dsir/vocab"), spark.read.parquet(s"$root/dsir/totals")),
    Seq("doc_id", "n_tokens", "weight_micro"))
}
println(s"SMODEL n=$N dsir direct=$dDsir staged=$sDsir match=${dDsir == sDsir}")
assert(dDsir == sDsir, "staged DSIR scoring drifted from direct")
System.exit(0)
