// Probe: e6 CCNet curation chain + y24 BPE training at 1M docs.
// Claims under test: (a) e6's corpus-sized data crosses one shuffle per
// stage and the tertile bucketing never runs a per-language window -
// so the whole chain stays minutes-scale at 1M docs with near-thirds
// bucket occupancy; (b) bpeMerges touches the corpus once (word-freq
// agg) and each merge round is vocabulary-bound, so rounds cost a
// fraction of the corpus pass. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_e6_bpe_1m.sc
import org.apache.spark.sql.functions._
import graft.llm.{Corpus, TextAnalysis}

spark.sparkContext.setLogLevel("WARN")
val N = 1000000L
// 3 languages via real function words (langid has signal); the WHOLE
// text derives from `base`, and 10% of docs point base at their
// neighbor -> exactly 100k true full-text duplicates. One slot keys on
// the full base so distinct bases never alias (a first cut derived all
// slots mod 60000 and 1M docs collapsed to 60k distinct texts);
// vocabulary ~1.06M tokens (900k unique + 60k x 3 shared + function).
val docs = spark.range(N).select(
  col("id").as("doc_id"),
  when(col("id") % 10 === 0, col("id") - 1).otherwise(col("id")).as("base"))
  .select(col("doc_id"), concat_ws(" ",
    element_at(array(lit("the and is not"), lit("der und ist nicht"),
      lit("le et est pas")), (pmod(col("base"), lit(3)) + 1).cast("int")),
    concat(lit("u"), col("base")),
    concat(lit("w"), (col("base") * 7 + 3) % 60000),
    concat(lit("w"), (col("base") * 13 + 5) % 60000),
    concat(lit("w"), (col("base") * 29 + 11) % 60000)
  ).as("text"))

// --- e6 chain (the registered query's exact shape, inlined) ---
val t0 = System.nanoTime
val kept = docs
  .groupBy(md5(col("text")).as("digest"))
  .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("m"),
    count(lit(1)).as("n_copies"))
  .select(col("m.doc_id").as("doc_id"), col("m.text").as("text"), col("n_copies"))
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
val lm = Corpus.unigramLogProb(kept, "doc_id", "text")
val scored = kept
  .withColumn("lang_pred", TextAnalysis.langId(col("text")))
  .join(lm, Seq("doc_id"))
  .withColumn("ppl_micro",
    when(col("n_tokens") > 0L, expr("(-logprob_micro) div n_tokens")))
val buckets = Corpus.perplexityBuckets(scored, "lang_pred", "ppl_micro")
  .groupBy("lang_pred", "bucket").agg(count(lit(1)).as("n_docs"))
  .collect()
val t1 = System.nanoTime
val nKept = buckets.map(_.getLong(2)).sum
val occ = buckets.map(r => s"${r.getString(0)}/${r.getString(1)}=${r.getLong(2)}")
  .sorted.mkString(" ")
println(f"PROBE_E6 n=$N kept=$nKept e2e_s=${(t1 - t0) / 1e9}%.1f buckets: $occ")
kept.unpersist()

// --- BPE: corpus pass vs merge rounds ---
val t2 = System.nanoTime
val words = docs
  .select(explode(TextAnalysis.regexTokens(col("text"))).as("word"))
  .groupBy("word").agg(count(lit(1)).as("freq"))
val vocabN = words.count()
val t3 = System.nanoTime
val merges = Corpus.bpeMerges(docs, "doc_id", "text", numMerges = 6).collect()
val t4 = System.nanoTime
println(f"PROBE_BPE vocab=$vocabN corpus_pass_s=${(t3 - t2) / 1e9}%.1f " +
  f"train6_s=${(t4 - t3) / 1e9}%.1f first=${merges.head.getString(1)} " +
  f"cnt=${merges.head.getLong(2)}")
System.exit(0)
