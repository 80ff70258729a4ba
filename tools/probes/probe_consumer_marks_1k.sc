// Probe: the consumer-mark CONTROL PLANE priced at 1k registered
// consumers (r18 verdict #8). A fleet of per-tenant drains on one
// landing zone registers one mark file each; every consumer-aware fold
// then lists + opens every mark (readManifestConsumers), and every
// drain's post-success record pays one read (the never-backward clamp)
// + one tmp-write + rename. This walls both sides at 1k marks, plus
// the fold path end-to-end, and proves the decommission-or-wedge
// contract at fleet size: a retired laggard's mark wedges the cutoff;
// removing it unwedges the fold.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_consumer_marks_1k.sc -e ':quit'
import org.apache.hadoop.fs.Path
spark.sparkContext.setLogLevel("WARN")
import spark.implicits._

val base = sys.props("java.io.tmpdir") + "/graft_probe_marks1k"
graft.streaming.Streams.deleteDir(spark, base)
val man = s"$base/man"
val K = 1000

def timed[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime
  val r = f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-58s $s%8.2f s")
  (r, s)
}

// a real manifest with a few segments so the fold has work to gate
val zone = new java.io.File(s"$base/zone"); zone.mkdirs()
val entries = (0 until 4).map { i =>
  val f = new java.io.File(zone, s"f$i.bin")
  java.nio.file.Files.write(f.toPath, s"payload $i".getBytes("UTF-8"))
  (f.getAbsolutePath, f.length())
}
entries.foreach { e =>
  graft.io.IO.appendLandingManifest(spark, man, Seq(e).toDF("path", "length"))
  Thread.sleep(3) // distinct mtimes
}
val fs = new Path(man).getFileSystem(spark.sparkContext.hadoopConfiguration)
val mtimes = fs.globStatus(new Path(s"$man/seg_*.json")).map(_.getModificationTime).sorted

// 1) register 1k marks, each covering everything but the newest wave
//    (record = clamp-read + tmp write + rename, the per-drain cost)
val (_, recWall) = timed(s"record $K marks (clamp-read + tmp+rename each)") {
  (0 until K).foreach(i =>
    graft.io.IO.recordManifestConsumer(spark, man, s"tenant$i", mtimes.last - 1))
}
println(f"PROBE per-record ${recWall / K * 1e3}%.2f ms")

// 2) the fold-path read: list + open every mark
val (marks, readWall) = timed(s"readManifestConsumers over $K marks")(
  graft.io.IO.readManifestConsumers(spark, man))
assert(marks.size == K)
println(f"PROBE per-mark read ${readWall / K * 1e3}%.2f ms")

// 3) the consumer-aware fold end-to-end at 1k marks: cutoff =
//    min(marks) folds all but the newest segment
val ((folded, rows), foldWall) = timed(s"compactLandingManifestForConsumers @ $K marks")(
  graft.io.IO.compactLandingManifestForConsumers(spark, man))
assert(folded == 3 && rows == 3L, s"got ($folded, $rows)")

// 4) decommission-or-wedge at fleet size: a new wave lands, every
//    tenant catches up (second record sweep -- reproducibility of the
//    per-record cost), one pre-registered laggard (MinValue) wedges
//    the next fold; removing its mark unwedges it
graft.io.IO.appendLandingManifest(spark, man,
  Seq(entries.head).toDF("path", "length"))
val newMtime = fs.globStatus(new Path(s"$man/seg_*.json"))
  .map(_.getModificationTime).max
val (_, recWall2) = timed(s"re-record $K marks (second sweep)") {
  (0 until K).foreach(i =>
    graft.io.IO.recordManifestConsumer(spark, man, s"tenant$i", newMtime))
}
graft.io.IO.recordManifestConsumer(spark, man, "laggard", Long.MinValue)
val wedged = graft.io.IO.compactLandingManifestForConsumers(spark, man)
assert(wedged == ((0, 0L)), s"a MinValue laggard must hold every fold, got $wedged")
timed("decommission the laggard")(
  graft.io.IO.removeManifestConsumer(spark, man, "laggard"))
val unwedged = graft.io.IO.compactLandingManifestForConsumers(spark, man)
assert(unwedged._1 >= 1, s"decommission must unwedge the fold, got $unwedged")
println(f"PROBE fold@${K}marks=$foldWall%.2f s (mark read $readWall%.2f s of it); " +
  f"record sweeps ${recWall / K * 1e3}%.2f / ${recWall2 / K * 1e3}%.2f ms per mark; " +
  "decommission-or-wedge contract holds at fleet size")
println("PROBE done")
