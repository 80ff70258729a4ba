// Phase 1 of the manifest-compaction kill -9 probe (driver:
// probe_compact_kill9.sh). Synthesizes a DETERMINISTIC manifest of
// N segments (same fixture law as probe_manifest_compaction.sc, so
// phase 2 can recompute the expected digest independently), then runs
// compactLandingManifest -- the outer script kill -9s this JVM inside
// one of the two crash windows it observes on the filesystem:
//   (a) fold in progress: _checkpoint.__swap_tmp exists, _checkpoint
//       does not -- live state untouched, readers see raw segments;
//   (b) swap done, segment deletes in progress: _checkpoint exists
//       while seg_* dirs remain -- readers dedup the overlap, the
//       next fold is idempotent.
import java.nio.file.{Files, Paths}
import scala.collection.parallel.CollectionConverters._
spark.sparkContext.setLogLevel("ERROR")

val root = "/tmp/probe_compact_kill9/man"
val n = sys.env.getOrElse("CPK9_SEGMENTS", "20000").toInt
val fresh = sys.env.getOrElse("CPK9_FRESH", "1") == "1"
if (fresh) {
  graft.streaming.Streams.deleteDir(spark, "/tmp/probe_compact_kill9")
  Files.createDirectories(Paths.get(root))
  (0 until n).par.foreach { i =>
    val seg = Paths.get(root, f"seg_${1700000000000L + i}%013d_$i%08x.json")
    Files.createDirectories(seg)
    Files.write(seg.resolve(s"part-00000-$i.json"),
      s"""{"path":"/data/landing/f$i.bin","length":${100 + i % 7}}"""
        .getBytes("UTF-8"))
    Files.write(seg.resolve("_SUCCESS"), Array.empty[Byte])
  }
}
println(s"CPK9 segments_ready n=$n")
Console.flush()
val (folded, rows) = graft.io.IO.compactLandingManifest(spark, root)
// only reached if the outer script did NOT kill in time
println(s"CPK9 compact_done folded=$folded rows=$rows")
