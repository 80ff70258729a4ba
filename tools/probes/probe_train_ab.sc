// Tight wall-clock isolation of Pq.trainCodebooks and the downstream
// encode, used for the round-22 job-fusion A/B: run N reps of each
// phase on the sf0.1 embeddings and print per-rep walls. Pure ASCII.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.extensions=graft.plans.GraftExtensions \
//   --driver-class-path target/scala-2.13/classes -i tools/probes/probe_train_ab.sc -e ':quit'
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")
val emb = graft.Tables.embeddings(spark, sfDir)

def timeIt(tag: String, reps: Int)(f: => Unit): Unit = {
  val walls = (1 to reps).map { _ =>
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }
  println(f"TRAINAB $tag reps=${walls.map(w => f"$w%.3f").mkString(",")} min=${walls.min}%.3f")
}

// phase 1: trainCodebooks alone (quantize + persist rebuilt per rep so
// every rep is a cold pipeline, the bench convention)
timeIt("trainCodebooks", 5) {
  val v = emb.select(col("vec_id"), graft.llm.Similarity.quantize(col("embedding")).as("nv"))
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  val cents = graft.llm.Pq.trainCodebooks(v, 8, 16, 2)
  cents.write.format("noop").mode("overwrite").save()
  v.unpersist(true)
  spark.catalog.clearCache()
}

// phase 2: the whole adcTopK (train + encode + query) - the x22 body
timeIt("adcTopK", 5) {
  graft.llm.Pq.adcTopK(emb, emb.filter(col("vec_id") < 5), 3)
    .write.format("noop").mode("overwrite").save()
  spark.catalog.clearCache()
}
println("TRAINAB done")
