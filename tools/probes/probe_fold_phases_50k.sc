// Probe: fold wall ATTRIBUTED BY PHASE at 50k live segments (r18
// verdict #3). A year of 5-minute waves that was never folded is ~100k
// segments; this prices the fold's three phases at 50k so the
// object-store math is grounded in measured local constants:
//   write  -- read 50k tiny JSON segments + distinct + parquet write
//             (the distributed job; dominated by the segment listing
//             and 50k file opens);
//   swap   -- replaceDir's two renames (O(1) metadata);
//   delete -- the segment-delete tail, serial vs 32-way pooled. On a
//             local FS a delete is ~10-100 us so the phase is
//             invisible either way; at an object store's 20-50 ms per
//             delete the serial tail is 50k x 20-50 ms = 17-42 MIN,
//             which the pool divides by its width (32 in flight ->
//             0.5-1.3 min). The pooled loop below replicates
//             IO.deleteSegmentsParallel (private[graft] is unreachable
//             from a spark-shell script; keep in sync with io/IO.scala).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_fold_phases_50k.sc -e ':quit'
import org.apache.hadoop.fs.Path
spark.sparkContext.setLogLevel("WARN")

val base = sys.props("java.io.tmpdir") + "/graft_probe_fold_phases"
graft.streaming.Streams.deleteDir(spark, base)
val N = 50000

def timed[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime
  val r = f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-58s $s%8.2f s")
  (r, s)
}

// synthesize N segment dirs exactly as appendLandingManifest lays them
// out (seg_*.json directory, one single-file JSON-lines part inside)
def synth(man: String): Unit = {
  val d = new java.io.File(man); d.mkdirs()
  (0 until N).foreach { i =>
    val seg = new java.io.File(d, f"seg_${1700000000000L + i}_$i%05x.json")
    seg.mkdir()
    java.nio.file.Files.write(
      new java.io.File(seg, "part-00000.json").toPath,
      s"""{"path":"/zone/f$i.bin","length":10}""".getBytes("UTF-8"))
  }
}

val man = s"$base/man"
timed(s"synthesize $N segments")(synth(man))

// the full fold as the engine runs it (lock + read/distinct/write +
// swap + pooled delete + marker release)
val ((folded, rows), foldWall) =
  timed(s"compactLandingManifest over $N segments")(
    graft.io.IO.compactLandingManifest(spark, man))
assert(folded == N && rows == N.toLong, s"got ($folded, $rows)")

// phase attribution on a second copy: the WRITE phase alone (same
// read+distinct+parquet job against a throwaway target), then the
// delete tail serial vs pooled
val man2 = s"$base/man2"
timed(s"synthesize $N segments (copy)")(synth(man2))
val fs = new Path(man2).getFileSystem(spark.sparkContext.hadoopConfiguration)
val segs = fs.globStatus(new Path(s"$man2/seg_*.json")).map(_.getPath)
// inline manifest schema (IO.ManifestSchema is private[graft],
// unreachable from a spark-shell script; keep in sync)
val manSchema = org.apache.spark.sql.types.StructType(Seq(
  org.apache.spark.sql.types.StructField("path",
    org.apache.spark.sql.types.StringType),
  org.apache.spark.sql.types.StructField("length",
    org.apache.spark.sql.types.LongType)))
val (_, writeWall) = timed("phase: read+distinct+parquet write") {
  spark.read.schema(manSchema)
    .json(segs.map(_.toString).toSeq: _*)
    .distinct().write.mode("overwrite").parquet(s"$base/ckpt2")
}
val serialHalf = segs.take(N / 2)
val pooledHalf = segs.drop(N / 2)
val (_, serialWall) = timed(s"phase: serial delete of ${serialHalf.length} segments") {
  serialHalf.foreach(p => fs.delete(p, true))
}
val (_, pooledWall) = timed(s"phase: 32-way pooled delete of ${pooledHalf.length} segments") {
  val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
  try {
    val futs = pooledHalf.map(p => pool.submit(
      new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = { fs.delete(p, true); () }
      }))
    futs.foreach(_.get())
  } finally pool.shutdown()
}
println(f"PROBE fold=$foldWall%.2f s; write-phase=$writeWall%.2f s; " +
  f"delete serial=${serialWall * 2}%.2f s-eq pooled=${pooledWall * 2}%.2f s-eq " +
  s"(halves scaled to $N); swap = fold - write - delete (O(1) renames)")
println(f"PROBE per-delete serial=${serialWall / (N / 2) * 1e6}%.1f us -> at 20-50 ms " +
  f"object-store latency the serial tail is ${N * 0.02 / 60}%.0f-${N * 0.05 / 60}%.0f min, " +
  f"pooled/32 = ${N * 0.02 / 60 / 32}%.1f-${N * 0.05 / 60 / 32}%.1f min")
println("PROBE done")
