// Probe: the e4 curation-manifest composition at 1M documents.
// Fixture: 800k distinct texts + 200k exact duplicates (ids >= 800k
// repeat the text of id - 800k), ~20 tokens each mixing an English
// function word with content words -- so language-ID resolves,
// quality clears the threshold, and the dedup stage has real work.
// Claims under test: (a) the whole plan completes at 1M docs with one
// digest exchange + thin id joins (the shape the sf0.01 oracle
// pinned); (b) dedup keeps exactly the 800k min-id canonicals;
// (c) duplicate groups carry n_copies = 2.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 8g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_e4_manifest_1m.sc -e ':quit'
import org.apache.spark.sql.functions._
import graft.llm.{Multimodal, TextAnalysis}

val docs = (spark.range(0L, 1000000L).toDF("doc_id")
  .withColumn("base", col("doc_id") % 800000L)
  .withColumn("text", concat_ws(" ",
    concat(lit("d"), col("base")) +:
      (0 until 18).map(j => concat(lit("w"), (col("base") * 7L + j) % 5000L)) :+ lit("the"): _*))
  .drop("base"))

def timed[T](label: String)(f: => T): T = {
  val t0 = System.nanoTime
  val r = f
  println(f"PROBE $label%-24s ${(System.nanoTime - t0) / 1e9}%8.1f s")
  r
}

val scored = (docs
  .select(col("doc_id"), col("text"),
    TextAnalysis.langId(col("text")).as("lang_pred"),
    TextAnalysis.qualityScore(col("text")).as("score"),
    TextAnalysis.tokenCountWhitespace(col("text")).as("n_tokens"))
  .filter(col("lang_pred") =!= "und" && col("score") > 0.2 && col("n_tokens") >= 5L))
val survivors = (scored
  .groupBy(md5(col("text")).as("digest"))
  .agg(min_by(struct(col("doc_id"), col("lang_pred"), col("score"), col("n_tokens")),
    col("doc_id")).as("m"), count(lit(1)).as("n_copies"))
  .select(col("m.doc_id").as("doc_id"), col("m.lang_pred").as("lang_pred"),
    col("m.score").as("score"), col("m.n_tokens").as("n_tokens"), col("n_copies"))
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
val img = (Multimodal
  .decodeImageBatched(Multimodal.synthesizePngPayload(survivors, "doc_id"))
  .select(col("media_id").as("doc_id"),
    expr("px_sum * 1000 DIV (width * height)").as("img_mean_milli")))
val aud = (Multimodal
  .decodeAudioBatched(Multimodal.synthesizeWavPayload(survivors, "doc_id"))
  .select(col("media_id").as("doc_id"), col("duration_ms").as("audio_ms")))
val manifest = graft.Caching.releaseAfterFirstUse(
  survivors.join(img, Seq("doc_id")).join(aud, Seq("doc_id")), survivors)

val agg = timed("e4-manifest-1M") {
  manifest.agg(count(lit(1)), sum(col("n_copies")),
    count(when(col("n_copies") === 2L, 1)), max(col("doc_id"))).head()
}
println("PROBE canonicals=" + agg.getLong(0) + " totalDocs=" + agg.getLong(1) +
  " dupGroups=" + agg.getLong(2) + " maxId=" + agg.getLong(3))
println("PROBE expect canonicals=800000 totalDocs=1000000 dupGroups=200000 maxId<800000: " +
  (agg.getLong(0) == 800000L && agg.getLong(1) == 1000000L &&
    agg.getLong(2) == 200000L && agg.getLong(3) < 800000L))
