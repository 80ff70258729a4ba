// Stage-level wall profile of registered queries: run each query
// through the noop sink with a SparkListener recording per-stage
// executor-run time, then print the top stages by total task time.
// Answers "which stage is the wall" before any rewrite (guide 1.1).
// Env: GRAFT_PROF_QUERIES (comma-separated), GRAFT_PROF_SF (default sf0.1).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.extensions=graft.plans.GraftExtensions \
//   --driver-class-path target/scala-2.13/classes -i tools/probes/probe_stage_profile.sc -e ':quit'
import org.apache.spark.scheduler._
import scala.collection.mutable

val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")
val wanted = sys.env.getOrElse("GRAFT_PROF_QUERIES", "x11_simhash_neardup")
  .split(",").map(_.trim).filter(_.nonEmpty).toSeq

case class St(name: String, var taskMs: Long = 0L, var wallMs: Long = 0L,
              var tasks: Int = 0, var shuffleReadB: Long = 0L, var shuffleWriteB: Long = 0L)
val stages = mutable.LinkedHashMap.empty[Int, St]
val listener = new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val st = stages.getOrElseUpdate(si.stageId, St(si.name))
    st.wallMs += (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
    st.taskMs += si.taskMetrics.executorRunTime
    st.tasks += si.numTasks
    st.shuffleReadB += si.taskMetrics.shuffleReadMetrics.totalBytesRead
    st.shuffleWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
  }
}
spark.sparkContext.addSparkListener(listener)

val qs = graft.SparkEntry.queries
wanted.foreach { name =>
  stages.clear()
  val fn = qs.getOrElse(name, sys.error(s"unknown query $name"))
  // warm once so scan caches/codegen are comparable, then profile
  val t0 = System.nanoTime()
  fn(spark, sfDir).write.format("noop").mode("overwrite").save()
  val wall = (System.nanoTime() - t0) / 1e9
  Thread.sleep(1500) // let the async listener bus drain
  println(f"PROFILE $name wall=$wall%.2f s, stages=${stages.size}")
  stages.toSeq.sortBy(-_._2.taskMs).take(12).foreach { case (id, s) =>
    println(f"  stage $id%4d task=${s.taskMs}%7d ms wall=${s.wallMs}%6d ms tasks=${s.tasks}%4d " +
      f"sr=${s.shuffleReadB / 1024}%8d KiB sw=${s.shuffleWriteB / 1024}%8d KiB  ${s.name.take(110)}")
  }
  spark.catalog.clearCache()
}
println("PROFILE done")
