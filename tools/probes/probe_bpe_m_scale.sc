// Probe: BPE TRAINING beyond the registered m=6 (round-11 verdict
// task: production vocabularies are 30-50k merges; bpeMerges is
// inherently m sequential rounds, so the honest question is the
// PER-ROUND cost curve -- does round 200 cost what round 20 does, or
// does plan growth / job-submit overhead creep in?). Corpus: the
// probe_e6_bpe_1m texture (1M docs, ~960k distinct words). We time
// bpeMerges end-to-end at m = 16 / 64 / 128 / 256 and report the
// MARGINAL per-merge cost between consecutive m values: a flat curve
// means each round stays one vocabulary-bound pass (the plan-depth cap
// from the every-16-rounds checkpoint holding); a rising curve means
// lineage/planning overhead survived the checkpoint cadence.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_bpe_m_scale.sc -e ':quit'
import org.apache.spark.sql.functions._
import graft.llm.Corpus

spark.sparkContext.setLogLevel("WARN")
val N = 1000000L
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
// file-backed like a real corpus (stats, columnar scan)
val path = "/tmp/probe_bpe_m_corpus"
graft.streaming.Streams.deleteDir(spark, path)
docs.write.mode("overwrite").parquet(path)
val corpus = spark.read.parquet(path)

val ms = Seq(16, 64, 128, 256)
val times = ms.map { m =>
  val t0 = System.nanoTime
  val merges = Corpus.bpeMerges(corpus, "doc_id", "text", numMerges = m)
  val n = merges.count()
  val sec = (System.nanoTime - t0) / 1e9
  println(f"BPEMSCALE n=$N m=$m%4d total_s=$sec%8.1f rounds=$n")
  (m, sec)
}
// marginal per-merge cost between consecutive m values -- the base
// corpus pass (word-freq agg) cancels out of the difference
times.sliding(2).foreach { case Seq((m0, t0), (m1, t1)) =>
  println(f"BPEMSCALE marginal m=$m0%4d..$m1%4d per_merge_s=${(t1 - t0) / (m1 - m0)}%6.3f")
}
