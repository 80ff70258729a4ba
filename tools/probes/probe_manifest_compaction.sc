// Probe: landing-manifest compaction at >=50k segments (round-16
// verdict item 1 -- "done" requires a probe row showing read cost FLAT
// after compaction).
// Claims under test:
//   (1) the UN-compacted manifest read cost grows with segment count
//       (one tiny seg_*.json dir per wave: glob + 50k-file JSON scan)
//       -- the small-files curve the manifest was built to kill,
//       re-grown by its own segments;
//   (2) compactLandingManifest folds them into ONE parquet checkpoint
//       and the post-compaction read is flat (checkpoint scan + a glob
//       over only the segments appended since), independent of how
//       many waves ever landed;
//   (3) row content is IDENTICAL before and after (count + an
//       order-insensitive bit_xor-of-row-hash digest),
//       including across fresh waves appended post-compaction.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 16g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_manifest_compaction.sc -e ':quit'
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path => JPath}
import scala.collection.parallel.CollectionConverters._
spark.sparkContext.setLogLevel("WARN")
import spark.implicits._

val root = s"${sys.props("java.io.tmpdir")}/graft_probe/manifest_compact"
def rm(p: JPath): Unit = if (Files.exists(p)) {
  Files.walk(p).sorted(java.util.Comparator.reverseOrder())
    .forEach(f => Files.delete(f))
}
rm(Paths.get(root))
Files.createDirectories(Paths.get(root))

def timed[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime
  val r = f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-52s $s%8.2f s")
  (r, s)
}

// Synthesize wave segments in EXACTLY the appendLandingManifest
// on-disk shape (a seg_<stamp>_<uid>.json DIRECTORY holding one
// json-lines part file + _SUCCESS -- writeJsonLines singleFile output).
// nio, parallel: appending 50k real Spark waves would cost 50k jobs
// and measure the wrong thing.
def mkSegments(from: Int, until: Int): Unit = {
  (from until until).par.foreach { i =>
    val seg = Paths.get(root, f"seg_${1700000000000L + i}%013d_$i%08x.json")
    Files.createDirectories(seg)
    Files.write(seg.resolve(s"part-00000-$i.json"),
      s"""{"path":"/data/landing/f$i.bin","length":${100 + i % 7}}"""
        .getBytes("UTF-8"))
    Files.write(seg.resolve("_SUCCESS"), Array.empty[Byte])
  }
}

def readCost(label: String): (Long, Long, Double) = {
  val (row, s) = timed(label) {
    graft.io.IO.readLandingManifest(spark, root)
      .agg(count(lit(1)), expr("bit_xor(xxhash64(path, length))"))
      .as[(Long, Long)].head()
  }
  (row._1, row._2, s)
}

// --- the growth curve: read cost vs live segment count -------------
println("== un-compacted read cost vs segment count ==")
mkSegments(0, 1000)
val r1k = readCost("read @ 1,000 segments")
mkSegments(1000, 10000)
val r10k = readCost("read @ 10,000 segments")
mkSegments(10000, 50000)
val r50k = readCost("read @ 50,000 segments")
assert(r50k._1 == 50000L, s"expected 50k rows, got ${r50k._1}")

// --- compaction ------------------------------------------------------
val ((folded, ckptRows), tCompact) =
  timed("compactLandingManifest (50k segments)") {
    graft.io.IO.compactLandingManifest(spark, root)
  }
assert(folded == 50000 && ckptRows == 50000L, s"($folded, $ckptRows)")

val rPost = readCost("read @ 0 live segments (post-compaction)")
assert(rPost._1 == r50k._1 && rPost._2 == r50k._2,
  "compaction must be invisible to readers: identical rows")

// --- steady state: a cadence's worth of fresh waves on top ----------
(0 until 100).foreach { i =>
  graft.io.IO.appendLandingManifest(spark, root,
    Seq((s"/data/landing/g$i.bin", 500L + i)).toDF("path", "length"))
}
val rLive = readCost("read @ 100 live segments + checkpoint")
assert(rLive._1 == 50100L, s"got ${rLive._1}")

println(f"""
PROBE SUMMARY
  un-compacted read:  1k ${r1k._3}%.2f s   10k ${r10k._3}%.2f s   50k ${r50k._3}%.2f s   (the re-grown small-files curve)
  compaction (once):  ${tCompact}%.2f s
  post-compaction:    0 live ${rPost._3}%.2f s   100 live ${rLive._3}%.2f s   (flat: checkpoint scan + O(live segments) glob)
  rows identical pre/post: true (count + bit_xor of xxhash64)
""")
rm(Paths.get(root))
