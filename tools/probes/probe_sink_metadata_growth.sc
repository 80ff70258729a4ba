// Probe: the parquet FILE SINK's _spark_metadata commit-log growth
// (r19 verdict #3). runFileStreamToParquet (st1/st4a/st5/st11 carrier)
// inherits Spark's FileStreamSinkLog: every `compactInterval` (10)
// batches the log rewrites a `.compact` file holding ONE ENTRY PER
// FILE EVER WRITTEN (Spark 4.1 exposes deletion/cleanupDelay/
// compactInterval only -- no entry expiry), and every read-back plans
// from that compact file. Two walls to measure:
//   1. DRAIN side: each compact rewrite is O(total entries), so a
//      forever-running sink pays a cumulatively QUADRATIC log tax --
//      per-200-batch drain wall across 1200 real single-file batches.
//   2. READ side: spark.read.parquet(out) builds a MetadataLogFileIndex
//      from the compact file -- planning wall at 400/800/1200 real
//      batches, then at 5k and 10k entries via a synthetic compact file
//      templated from the real one (same format, real copied part
//      files) -- the ~10k-batch wall the verdict asks for without
//      paying 10k stream lifecycles.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 8g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_sink_metadata_growth.sc -e ':quit'
import org.apache.spark.sql.types._
spark.sparkContext.setLogLevel("WARN")

val base = sys.props("java.io.tmpdir") + "/graft_probe_sinkmeta"
graft.streaming.Streams.deleteDir(spark, base)
val src = new java.io.File(s"$base/src"); src.mkdirs()
val out = s"$base/out"
val ckpt = s"$base/ckpt"
val schema = StructType(Seq(StructField("entry_id", LongType)))

def timed[A](f: => A): (Double, A) = {
  val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
}

// ---- phase 1: 6 x 200 real single-file micro-batches ----
var landed = 0
for (chunk <- 1 to 6) {
  (0 until 200).foreach { i =>
    val id = landed + i
    java.nio.file.Files.write(
      new java.io.File(src, f"f$id%05d.json").toPath,
      s"""{"entry_id":$id}""".getBytes("UTF-8"))
  }
  landed += 200
  val (drainW, _) = timed {
    graft.streaming.Streams.runFileStreamToParquet(spark, src.toString, schema,
      ckpt, out, df => df, maxFilesPerTrigger = Some(1),
      reset = chunk == 1)
  }
  val (planW, df) = timed { spark.read.parquet(out) }
  val (countW, n) = timed { df.count() }
  println(f"PROBE real chunk=$chunk batches=$landed drain=$drainW%7.1f s " +
    f"plan=$planW%6.3f s count=$countW%6.3f s rows=$n")
}

// sanity: the sink log compacted (a .compact exists) and holds one
// entry per batch
val metaDir = new java.io.File(s"$out/_spark_metadata")
val compacts = metaDir.listFiles().filter(_.getName.endsWith(".compact"))
  .sortBy(_.getName.stripSuffix(".compact").toInt)
assert(compacts.nonEmpty, "no .compact file -- the probe premise is wrong")
val latest = compacts.last
val lines = java.nio.file.Files.readAllLines(latest.toPath)
println(s"PROBE latest compact=${latest.getName} lines=${lines.size} " +
  s"(v-line + entries) bytes=${latest.length()}")

// ---- phase 2: synthetic compact at 5k and 10k entries ----
// template from the REAL format: first line is the version, each entry
// line is JSON with a "path" field we re-point at copied part files
val vLine = lines.get(0)
val entryTemplate = lines.get(1)
val realPart = {
  val m = """"path":"([^"]+)"""".r.findFirstMatchIn(entryTemplate)
  new java.io.File(new java.net.URI(m.get.group(1)))
}
for (n <- Seq(5000, 10000)) {
  val sdir = new java.io.File(s"$base/synth_$n"); sdir.mkdirs()
  val meta = new java.io.File(sdir, "_spark_metadata"); meta.mkdirs()
  val sb = new StringBuilder(vLine); sb.append('\n')
  (0 until n).foreach { i =>
    val f = new java.io.File(sdir, f"part-$i%05d.snappy.parquet")
    java.nio.file.Files.copy(realPart.toPath, f.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    sb.append(entryTemplate.replaceAll(""""path":"[^"]+"""",
      s""""path":"${f.toURI.toString.stripSuffix("/")}""""))
    sb.append('\n')
  }
  java.nio.file.Files.write(new java.io.File(meta, s"${n - 1}.compact").toPath,
    sb.toString.getBytes("UTF-8"))
  val (planW, df) = timed { spark.read.parquet(sdir.toString) }
  val (countW, rows) = timed { df.count() }
  println(f"PROBE synth entries=$n plan=$planW%6.3f s count=$countW%6.3f s rows=$rows")
}
println("PROBE done")
