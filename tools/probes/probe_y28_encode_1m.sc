// Probe: y28 BPE ENCODE at 1M docs - the claim under test is the
// distinct-word cache: a word's encoding is a pure function of the
// word, so the m merge replaces should run over the vocabulary only
// (~1.06M words here), with the corpus paying one word-keyed join +
// doc-local re-assembly. The A/B twin applies the same fold to every
// token OCCURRENCE (corpus-sized replace work, no distinct/join) -
// the shape a naive port would write. Both must produce bit-identical
// encodings (xxhash64 checksum over doc-level bpe_text).
// Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_y28_encode_1m.sc
import org.apache.spark.sql.functions._
import graft.llm.{Corpus, TextAnalysis}

spark.sparkContext.setLogLevel("WARN")
val N = 1000000L
// the probe_e6_bpe_1m fixture: 3 language families, 10% full-text
// duplicates, ~1.06M-word vocabulary
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
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
docs.count()

val t0 = System.nanoTime
val merges = Corpus.bpeMerges(docs, "doc_id", "text", numMerges = 6)
  .orderBy("rank").collect().map(_.getString(1)).toSeq
val t1 = System.nanoTime

// registered shape: encode over DISTINCT words, join back
val enc = Corpus.bpeEncode(docs, "doc_id", "text", merges)
val agg = enc.agg(sum(col("n_bpe_tokens")), sum(pmod(xxhash64(col("bpe_text")), lit(1000000007L))),
  count(lit(1))).collect()(0)
val t2 = System.nanoTime

// naive twin: the same fold applied to every token OCCURRENCE
val toks = docs.select(col("doc_id"),
  posexplode(TextAnalysis.regexTokens(col("text"))).as(Seq("pos", "word")))
val sym0 = rtrim(regexp_replace(col("word"), "(.)", "_$1 "))
val folded = merges.foldLeft(sym0) { (prev, pair) =>
  val merged = "_" + pair.replace("_", "").replace(" ", "")
  rtrim(replace(concat(prev, lit(" ")), lit(pair + " "), lit(merged + " ")))
}
val naive = toks.withColumn("sym", folded)
  .groupBy(col("doc_id"))
  .agg(concat_ws(" ", transform(
    array_sort(collect_list(struct(col("pos"), col("sym")))),
    s => s.getField("sym"))).as("bpe_text"),
    sum(size(split(col("sym"), " ")).cast("long")).as("n_bpe_tokens"))
val aggN = naive.agg(sum(col("n_bpe_tokens")), sum(pmod(xxhash64(col("bpe_text")), lit(1000000007L))),
  count(lit(1))).collect()(0)
val t3 = System.nanoTime

val ok = agg.getLong(0) == aggN.getLong(0) && agg.getLong(1) == aggN.getLong(1)
println(f"PROBE_Y28 n=$N train6_s=${(t1 - t0) / 1e9}%.1f " +
  f"encode_vocab_s=${(t2 - t1) / 1e9}%.1f encode_naive_s=${(t3 - t2) / 1e9}%.1f " +
  f"tokens=${agg.getLong(0)} checksum_match=$ok " +
  "(expect checksum_match=true; vocab-path <= naive-path)")
System.exit(if (ok) 0 else 1)
