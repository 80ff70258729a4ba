// Phase 1 of the atomicSwap kill -9 probe (driver: probe_swap_kill9.sh).
// Builds artifact v1, then starts a REBUILD whose build function writes
// the staged content and sleeps -- the outer script kill -9s this JVM in
// that window, simulating a long training job dying mid-rebuild (the
// realistic crash: the staged write is the hours-long part).
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
import spark.implicits._
val dir = "/tmp/probe_swap_kill9/artifact"
graft.streaming.Streams.deleteDir(spark, "/tmp/probe_swap_kill9")
graft.io.Staging.atomicSwap(spark, dir) { tmp =>
  Seq(1).toDF("v").write.parquet(tmp)
}
println("SWAPK9 built_v1=" + spark.read.parquet(dir).as[Int].collect().toSeq.mkString)
graft.io.Staging.atomicSwap(spark, dir) { tmp =>
  Seq(2).toDF("v").write.parquet(tmp)
  println("SWAPK9 staged_written_sleeping")
  Console.flush()
  Thread.sleep(300000)
}
