// Phase 1 of the publishVersioned kill -9 probe (driver:
// probe_versioned_kill9.sh). Publishes artifact v1, then starts a new
// versioned build whose build function writes the version-dir content
// and sleeps -- the outer script kill -9s this JVM in that window
// (before the _PUBLISHED marker), simulating a long training job dying
// mid-build under the object-store publish protocol.
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
import spark.implicits._
val root = "/tmp/probe_versioned_kill9/artifact"
graft.streaming.Streams.deleteDir(spark, "/tmp/probe_versioned_kill9")
graft.io.Staging.publishVersioned(spark, root) { d =>
  Seq(1).toDF("v").write.parquet(d)
}
println("VERSK9 built_v1=" + spark.read.parquet(
  graft.io.Staging.resolveRead(spark, root)).as[Int].collect().toSeq.mkString)
graft.io.Staging.publishVersioned(spark, root) { d =>
  Seq(2).toDF("v").write.parquet(d)
  println("VERSK9 staged_written_sleeping")
  Console.flush()
  Thread.sleep(300000)
}
