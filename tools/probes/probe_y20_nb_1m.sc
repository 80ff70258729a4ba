// Probe: y20 Naive Bayes classifier at 1M docs / ~150k vocab / 5 classes.
// Claim under test (Classifier scaladoc): training is pure aggregation
// and scoring one vocab join + hash agg - so the whole train+score
// chain runs in a handful of shuffles at corpus scale, and the seed
// fraction (~14% here) only changes the training aggregates, not the
// plan shape. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_y20_nb_1m.sc
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 1000000L
// 20 tokens/doc: 12 class-specific (strong signal), 8 shared noise
val docs = spark.range(N).select(
  col("id").as("doc_id"),
  concat(lit("k"), col("id") % 5).as("cls"),
  concat_ws(" ",
    (0 until 12).map(j => concat(lit("c"), col("id") % 5, lit("_"),
      (col("id") * 3 + j) % 20000)) ++
    (0 until 8).map(j => concat(lit("s"), (col("id") * 7 + j) % 50000)): _*
  ).as("text"))

val t0 = System.nanoTime
// seed modulus 7 is coprime to the 5-class modulus, so the ~14% seed
// covers every class (a %10 gate would only ever label class 0)
val pred = graft.llm.Classifier.naiveBayes(docs, "doc_id", "text",
  when(col("doc_id") % 7 === 0, col("cls")))
val joined = pred.join(docs.select("doc_id", "cls"), Seq("doc_id"))
val agg = joined.agg(
  count(lit(1)).as("n"),
  sum(when(col("pred") === col("cls"), 1L).otherwise(0L)).as("correct")
).collect()(0)
val t1 = System.nanoTime
val n = agg.getLong(0); val ok = agg.getLong(1)
println(f"PROBE_Y20 n=$n acc=${ok.toDouble / n}%.4f train_score_s=${(t1 - t0) / 1e9}%.1f")
System.exit(if (n == N && ok.toDouble / n > 0.99) 0 else 1)
