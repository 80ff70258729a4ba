// Where does ONE manifest-stream lifecycle spend its wall? Times the
// st18 body phase by phase with a StreamingQueryListener recording
// per-batch durations, plus the whole-query wall. Pure ASCII.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.extensions=graft.plans.GraftExtensions \
//   --driver-class-path target/scala-2.13/classes -i tools/probes/probe_stream_lifecycle_wall.sc -e ':quit'
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.functions._

val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")

val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
val listener = new StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    events.add(f"started ${System.nanoTime() / 1e9}%.3f")
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    events.add(s"batch ${p.batchId}: total=${dur.get("triggerExecution")}ms " +
      s"addBatch=${dur.getOrDefault("addBatch", -1L)} " +
      s"latestOffset=${dur.getOrDefault("latestOffset", -1L)} " +
      s"walCommit=${dur.getOrDefault("walCommit", -1L)} " +
      s"commitOffsets=${dur.getOrDefault("commitOffsets", -1L)} " +
      s"queryPlanning=${dur.getOrDefault("queryPlanning", -1L)} rows=${p.numInputRows}")
  }
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    events.add(f"terminated ${System.nanoTime() / 1e9}%.3f")
}
spark.streams.addListener(listener)

def wall[T](tag: String)(f: => T): T = {
  val t0 = System.nanoTime()
  val r = f
  println(f"LIFEWALL $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
  r
}

// warm the session first (codegen, parquet committers)
spark.range(10).write.format("noop").mode("overwrite").save()

val fn = graft.SparkEntry.queries("st18_stream_manifest_ingest")
for (rep <- 1 to 3) {
  events.clear()
  val df = wall(s"rep$rep st18_build") { fn(spark, sfDir) }
  wall(s"rep$rep st18_consume") {
    df.write.format("noop").mode("overwrite").save()
  }
  Thread.sleep(500)
  events.forEach(e => println(s"  EV $e"))
  spark.catalog.clearCache()
}
println("LIFEWALL done")
