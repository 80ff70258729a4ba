// Phase 2 of the publishVersioned kill -9 probe: after the build JVM
// was kill -9ed mid-build (version dir written, _PUBLISHED never
// stamped), readers must still resolve the previous published version,
// the torn dir must be invisible (no marker) and never have its number
// reused, and GC must sweep it once a newer version is live.
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
import spark.implicits._
val st = graft.io.Staging
val root = "/tmp/probe_versioned_kill9/artifact"
val fs = new org.apache.hadoop.fs.Path(root)
  .getFileSystem(spark.sparkContext.hadoopConfiguration)
println("VERSK9 live_after_kill=" + spark.read.parquet(
  st.resolveRead(spark, root)).as[Int].collect().toSeq.mkString)
println("VERSK9 torn_dir_exists=" +
  fs.exists(new org.apache.hadoop.fs.Path(root + "/v=000002")))
println("VERSK9 torn_unpublished=" +
  !fs.exists(new org.apache.hadoop.fs.Path(root + "/v=000002/_PUBLISHED")))
val v3 = st.publishVersioned(spark, root) { d =>
  Seq(3).toDF("v").write.parquet(d)
}
println("VERSK9 rebuild_version=" + v3 + " (torn number not reused=" + (v3 == 3L) + ")")
println("VERSK9 after_rebuild=" + spark.read.parquet(
  st.resolveRead(spark, root)).as[Int].collect().toSeq.mkString)
println("VERSK9 gc_swept=" + st.gcVersions(spark, root, keep = 0).mkString(","))
println("VERSK9 torn_gone=" +
  !fs.exists(new org.apache.hadoop.fs.Path(root + "/v=000002")))
System.exit(0)
