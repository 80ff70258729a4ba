// Phase 2 of the manifest-compaction kill -9 probe: after the kill,
// the manifest must read back IDENTICAL to the deterministic fixture
// (recomputed here from the same law -- no state is passed between the
// phases), and a re-run of the fold must converge to a clean
// checkpoint with zero live segments and the same rows.
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("ERROR")
import spark.implicits._

val root = "/tmp/probe_compact_kill9/man"
val n = sys.env.getOrElse("CPK9_SEGMENTS", "20000").toInt

def digest(df: org.apache.spark.sql.DataFrame): (Long, Long) =
  df.agg(count(lit(1)), expr("bit_xor(xxhash64(path, length))"))
    .as[(Long, Long)].head()

val expected = digest(spark.range(n).select(
  concat(lit("/data/landing/f"), col("id"), lit(".bin")).as("path"),
  (lit(100L) + col("id") % 7).as("length")))

val afterKill = digest(graft.io.IO.readLandingManifest(spark, root))
assert(afterKill == expected,
  s"CPK9 FAIL read-after-kill $afterKill != expected $expected")
println(s"CPK9 read_after_kill_identical rows=${afterKill._1}")

// the kill -9'd fold died holding the _FOLDING lock (acquired at fold
// start since round 19): a plain re-fold REFUSES loudly naming the
// dead holder -- the single-fold-at-a-time contract cannot tell a
// crashed holder from a running one -- and converges only under the
// explicit takeoverCrashedFold recovery
val refused =
  try { graft.io.IO.compactLandingManifest(spark, root); false }
  catch {
    case e: IllegalStateException =>
      e.getMessage.contains("takeoverCrashedFold")
  }
assert(refused, "CPK9 FAIL re-fold must refuse the dead holder's lock")
println("CPK9 held_lock_refused_without_takeover")
val (folded, rows) = graft.io.IO.compactLandingManifest(spark, root,
  takeoverCrashedFold = true)
val afterRefold = digest(graft.io.IO.readLandingManifest(spark, root))
assert(afterRefold == expected,
  s"CPK9 FAIL read-after-refold $afterRefold != expected $expected")
val liveSegs = new java.io.File(root).listFiles()
  .count(_.getName.startsWith("seg_"))
assert(liveSegs == 0, s"CPK9 FAIL $liveSegs live segments after re-fold")
println(s"CPK9 refold_converged folded=$folded rows=$rows live_segments=0")
println("CPK9 PASS")
