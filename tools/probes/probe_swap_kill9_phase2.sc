// Phase 2 of the atomicSwap kill -9 probe: after the rebuild JVM was
// kill -9ed mid-build, the live artifact must still serve v1 byte-for-
// byte (SaveMode.Overwrite would have deleted it before the crash), and
// the next build must clean the orphaned .staged directory and publish
// normally.
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
import spark.implicits._
val dir = "/tmp/probe_swap_kill9/artifact"
println("SWAPK9 live_after_kill=" + spark.read.parquet(dir).as[Int].collect().toSeq.mkString)
val fs = new org.apache.hadoop.fs.Path(dir)
  .getFileSystem(spark.sparkContext.hadoopConfiguration)
println("SWAPK9 orphan_staged_exists=" +
  fs.exists(new org.apache.hadoop.fs.Path(dir + ".__swap_tmp")))
graft.io.Staging.atomicSwap(spark, dir) { tmp =>
  Seq(3).toDF("v").write.parquet(tmp)
}
println("SWAPK9 after_rebuild=" + spark.read.parquet(dir).as[Int].collect().toSeq.mkString)
println("SWAPK9 staged_cleaned=" +
  !fs.exists(new org.apache.hadoop.fs.Path(dir + ".__swap_tmp")))
System.exit(0)
