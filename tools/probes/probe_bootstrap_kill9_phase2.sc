// Phase 2 of the bootstrap kill -9 probe: a FRESH JVM verifies the
// kill -9'd join's wreckage resolves exactly as documented --
//   1. the .bootstrap_k.lock survived, held by the dead JVM;
//   2. a plain re-join REFUSES loudly naming the holder + remediation;
//   3. takeoverCrashedBootstrap = true recovers: the join converges to
//      the full corpus (digest recomputed from the fixture law, nothing
//      carried over from the killed JVM), the lock is released, and
//   4. the consumer then RESUMES as a normal steady-state drain.
import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
spark.sparkContext.setLogLevel("ERROR")

val root = "/tmp/probe_bootstrap_kill9"
val man = s"$root/man"
val n = sys.env.getOrElse("BK9_FILES", "20000").toInt
val fs = new Path(man).getFileSystem(spark.sparkContext.hadoopConfiguration)
val lock = new Path(s"$man/_consumers/.bootstrap_k.lock")

// 1. the dead JVM's lock survived the kill
assert(fs.exists(lock), "BK9 FAIL: the killed bootstrap's lock is gone")
val holder = {
  val in = fs.open(lock)
  val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  """"holder"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1)).getOrElse("?")
}
println(s"BK9 lock_survived holder=$holder")

// 2. a plain re-join refuses loudly, naming the holder and the flag
val refusal =
  try {
    graft.streaming.Streams.runManifestIngestStream(spark, man,
      s"$root/ck_k", s"$root/out_k", consumerId = Some("k"),
      bootstrapFromCheckpoint = true)
    "NO-REFUSAL"
  } catch { case e: IllegalStateException => e.getMessage }
assert(refusal.contains(holder.split(':').take(2).mkString(":"))
  && refusal.contains("takeover"),
  s"BK9 FAIL: refusal must name the dead holder + remediation: $refusal")
assert(fs.exists(lock), "BK9 FAIL: a refused join must not touch the lock")
println("BK9 plain_rejoin_refused_loudly")

// 3. takeover recovers; digest recomputed from the fixture law
val out = graft.streaming.Streams.runManifestIngestStream(spark, man,
  s"$root/ck_k", s"$root/out_k", consumerId = Some("k"),
  bootstrapFromCheckpoint = true, takeoverCrashedBootstrap = true)
val got = out.select("fname", "length").collect()
  .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
val expected = ((0 until n).map(i => (f"f$i%05d.bin",
    s"bk9 $i".getBytes("UTF-8").length.toLong))
  ++ (for (w <- 0 until 2; j <- 0 until 2)
      yield (s"g${w}_$j.bin", s"bk9 live $w $j".getBytes("UTF-8").length.toLong)))
  .sortBy(_._1)
assert(got.length == expected.length && got.sameElements(expected),
  s"BK9 FAIL: takeover output diverges (${got.length} vs ${expected.length} rows)")
assert(!fs.exists(lock), "BK9 FAIL: a completed takeover must release the lock")
println(s"BK9 takeover_converged rows=${got.length}")

// 4. steady-state resume on the recovered checkpoint
val resumed = graft.streaming.Streams.runManifestIngestStream(spark, man,
  s"$root/ck_k", s"$root/out_k", reset = false, consumerId = Some("k"))
assert(resumed.count() == expected.length.toLong,
  "BK9 FAIL: the recovered consumer must resume normally")
println("BK9 resume_ok")
println("BK9 PASS")
