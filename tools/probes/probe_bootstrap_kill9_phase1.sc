// Phase 1 of the bootstrap kill -9 probe (driver:
// probe_bootstrap_kill9.sh). Builds a folded zone whose _checkpoint
// band references N REAL payload files (deterministic fixture law, so
// phase 2 recomputes the expected digest independently), lands two
// live waves, then runs a bootstrapFromCheckpoint join -- the outer
// script kill -9s this JVM inside the bootstrap window (the
// .bootstrap_k.lock exists, the _graft_bootstrap.json sentinel does
// not), in one of two sub-windows:
//   (a) mid-SEED: the batch_id=-1 band has no _SUCCESS yet;
//   (b) mid-DRAIN: seed committed, live-segment offsets in flight.
import java.nio.file.{Files, Paths}
import scala.collection.parallel.CollectionConverters._
spark.sparkContext.setLogLevel("ERROR")

val root = "/tmp/probe_bootstrap_kill9"
val man = s"$root/man"
val n = sys.env.getOrElse("BK9_FILES", "20000").toInt
val fresh = sys.env.getOrElse("BK9_FRESH", "1") == "1"
if (fresh) {
  graft.streaming.Streams.deleteDir(spark, root)
  Files.createDirectories(Paths.get(s"$root/zone"))
  Files.createDirectories(Paths.get(man))
  (0 until n).par.foreach { i =>
    Files.write(Paths.get(s"$root/zone", f"f$i%05d.bin"),
      s"bk9 $i".getBytes("UTF-8"))
  }
  // manifest segments in the raw on-disk shape (1000 rows each), then
  // fold the whole band into the parquet checkpoint
  (0 until n / 1000).par.foreach { s =>
    val seg = Paths.get(man, f"seg_${1700000000000L + s}%013d_$s%08x.json")
    Files.createDirectories(seg)
    val body = (s * 1000 until (s + 1) * 1000).map { i =>
      val p = Paths.get(s"$root/zone", f"f$i%05d.bin")
      s"""{"path":"$p","length":${Files.size(p)}}"""
    }.mkString("\n")
    Files.write(seg.resolve(s"part-00000-$s.json"), body.getBytes("UTF-8"))
    Files.write(seg.resolve("_SUCCESS"), Array.empty[Byte])
  }
  val (folded, rows) = graft.io.IO.compactLandingManifest(spark, man)
  assert(folded == n / 1000 && rows == n.toLong, s"fixture fold: $folded, $rows")
  // two LIVE waves land after the fold
  import spark.implicits._
  for (w <- 0 until 2) {
    Thread.sleep(5)
    val files = (0 until 2).map { j =>
      val p = Paths.get(s"$root/zone", s"g${w}_$j.bin")
      Files.write(p, s"bk9 live $w $j".getBytes("UTF-8"))
      (p.toString, Files.size(p))
    }
    graft.io.IO.appendLandingManifest(spark, man, files.toDF("path", "length"))
  }
}
println(s"BK9 fixture_ready n=$n")
Console.flush()
val out = graft.streaming.Streams.runManifestIngestStream(spark, man,
  s"$root/ck_k", s"$root/out_k", consumerId = Some("k"),
  bootstrapFromCheckpoint = true)
// only reached if the outer script did NOT kill in time
println(s"BK9 bootstrap_done rows=${out.count()}")
