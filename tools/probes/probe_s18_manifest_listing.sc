// Probe: s18 manifest-listed ingest vs the binaryFile source at high
// file counts (round-15 verdict item 3). Claims under test:
//   (a) the binaryFile source's DRIVER listing cost grows with file
//       count (InMemoryFileIndex stats every file before task 1 -- the
//       round-15 knee: 26.3 s listing at 100k files);
//   (b) the manifest reader's driver cost is FLAT in file count (one
//       glob over O(segments) tiny manifest files); the O(files) opens
//       still happen, but in EXECUTORS, packed ~maxPartitionBytes per
//       task -- so total ingest wall scales with payload, not with
//       driver-serial metadata RPCs;
//   (c) content equality: both paths yield identical (fname, length,
//       md5(content)) sets.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 16g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_s18_manifest_listing.sc -e ':quit'
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")

def timed(label: String)(f: => Unit): Double = {
  val t0 = System.nanoTime
  f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-36s $s%8.1f s")
  s
}

val root = sys.props("java.io.tmpdir") + "/graft_probe_s18"

def genFiles(n: Int): String = {
  val dir = s"$root/n$n"
  val done = java.nio.file.Paths.get(s"$dir/_GENDONE")
  if (!java.nio.file.Files.exists(done)) {
    val d = new java.io.File(dir)
    if (d.exists) { d.listFiles.foreach(_.delete()); d.delete() }
    java.nio.file.Files.createDirectories(d.toPath)
    val t = timed(s"generate-$n-files") {
      spark.range(0L, n.toLong, 1L, 32).foreachPartition {
        (it: Iterator[java.lang.Long]) =>
          it.foreach { i =>
            val body = s"payload $i " + ("x" * (80 + (i % 37)).toInt)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(f"$dir/doc_$i%08d.bin"),
              body.getBytes("UTF-8"))
          }
      }
    }
    println(f"PROBE gen rate ${n / t}%.0f files/s")
    java.nio.file.Files.createFile(done)
  }
  dir
}

// writer-side manifest: in production each landing wave appends the
// files it just wrote; here the generator replays that knowledge in
// executor-built waves (NO directory listing anywhere on this path)
def genManifest(n: Int, dir: String, waves: Int = 4): String = {
  val man = s"$root/man$n"
  val done = java.nio.file.Paths.get(s"$man/_GENDONE")
  if (!java.nio.file.Files.exists(done)) {
    graft.streaming.Streams.deleteDir(spark, man)
    // exact byte length of the generated body: "payload " (8) + digits
    // of i + " " (1) + 80 + i%37 x's -- the reader REQUIRES the
    // manifested length to match on disk, so the writer must know it.
    // `waves` segments (default 4) replay the writer's append-only
    // cadence and give the ST18 stream real per-wave triggers.
    (0 until waves).foreach { w =>
      val entries = spark.range(0L, n.toLong, 1L, 32)
        .filter(col("id") % waves === w)
        .select(
          format_string(s"$dir/doc_%08d.bin", col("id")).as("path"),
          (lit(89L) + length(col("id").cast("string")) + col("id") % 37L).as("length"))
      // segment-name uniqueness is the UUID suffix's job (IO contract)
      graft.io.IO.appendLandingManifest(spark, man, entries)
    }
    java.nio.file.Files.createFile(done)
  }
  man
}

// codegen/scan warmup so the first timed case isn't billed JVM startup
locally {
  val w = genFiles(20000)
  spark.read.format("binaryFile").load(s"$w/doc_000000*.bin")
    .select(md5(col("content"))).count()
}

Seq(20000, 100000, 300000).foreach { n =>
  val dir = genFiles(n)
  val man = genManifest(n, dir)
  println(s"PROBE ==== n=$n files ====")
  // the claim under test is the PLANNING phase: InMemoryFileIndex stats
  // every file on the driver before task 1; the manifest plan is a scan
  // of O(segments) tiny files. Isolate it from payload reads.
  val tPlanMan = timed(s"manifest-plan-only-$n") {
    require(graft.io.IO.readLandingManifest(spark, man).count() == n)
  }
  val tPlanSrc = timed(s"binaryFile-listing-only-$n") {
    require(spark.read.format("binaryFile").load(s"$dir/*.bin")
      .inputFiles.length == n)
  }
  // full ingest walls (manifest first, so any page-cache warming favors
  // the binaryFile side -- conservative for the claim)
  var viaMan = 0L
  val tMan = timed(s"manifest-read-$n") {
    viaMan = graft.io.IO.readBinaryFromManifest(spark, man)
      .select(md5(col("content"))).count()
  }
  var viaSrc = 0L
  val tSrc = timed(s"binaryFile-read-$n") {
    viaSrc = spark.read.format("binaryFile").load(s"$dir/*.bin")
      .select(md5(col("content"))).count()
  }
  require(viaSrc == n && viaMan == n, s"row counts: src=$viaSrc man=$viaMan")
  println(f"PROBE n=$n%-7d plan: binaryFile=$tPlanSrc%6.1f s manifest=$tPlanMan%6.1f s | " +
    f"ingest: binaryFile=${n / tSrc}%8.0f files/s manifest=${n / tMan}%8.0f files/s")
}

// STREAM drain at 100k files: the binaryFile stream re-lists the whole
// zone every trigger (r15 knee: 0.4-1.2k files/s); the ST18 manifest
// stream's source watches only the manifest segments, so a trigger's
// relist is O(waves). Both drain in 4 triggers for comparability.
locally {
  val n = 100000
  val dir = genFiles(n)
  val man = genManifest(n, dir)
  val tBin = timed(s"binaryFile-STREAM-drain-$n") {
    val out = graft.streaming.Streams.runBinaryPackStream(spark,
      s"$dir/*.bin", s"$root/st_ckpt_bin", s"$root/st_out_bin",
      maxFilesPerTrigger = Some(25000))
    require(out.count() == n)
  }
  val tMan = timed(s"manifest-STREAM-drain-$n") {
    val out = graft.streaming.Streams.runManifestIngestStream(spark,
      man, s"$root/st_ckpt_man", s"$root/st_out_man",
      maxFilesPerTrigger = Some(1))
    require(out.count() == n)
  }
  println(f"PROBE stream-drain n=$n binaryFile=${n / tBin}%8.0f files/s  " +
    f"manifest=${n / tMan}%8.0f files/s  speedup=${tBin / tMan}%5.2f x")
}

// content equality at the smallest size (cheap): both paths must agree
// byte-for-byte
val dir = genFiles(20000)
val man = genManifest(20000, dir)
val a = spark.read.format("binaryFile").load(s"$dir/*.bin")
  .select(element_at(split(col("path"), "/"), -1).as("fname"),
    col("length"), md5(col("content")).as("h"))
val b = graft.io.IO.readBinaryFromManifest(spark, man)
  .select(col("fname"), col("length"), md5(col("content")).as("h"))
val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
println(s"PROBE content-diff-rows=$diff (expect 0)")
println("PROBE done")
System.exit(0)
