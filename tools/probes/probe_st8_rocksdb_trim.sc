// Probe: price and trim the RocksDB per-trigger constant on the
// stream-stream join (round-16 verdict item 4). st8 is the suite's
// slowest query (6.0-6.7 s, ~2x its heap wall) purely on store
// open/commit cycles over trivial sf0.1 state: 4 partitions x 4-5
// stores/partition x 3 replay triggers. Question: does a RocksDB conf
// (trackTotalNumberOfRows off -- the documented write-path trim: every
// put/remove stops paying a get to maintain the numTotalStateRows
// metric) or a smaller state-partition count recover >=30% at sf0.1
// WITHOUT touching the 10x-state flat-memory result (the conf changes
// bookkeeping, not storage; partitions change task count only --
// results are oracle-pinned partition-independent)?
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 16g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_st8_rocksdb_trim.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import graft.streaming.Streams
spark.sparkContext.setLogLevel("WARN")

val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val base = s"${sys.props("java.io.tmpdir")}/graft_probe/st8_trim"
Streams.deleteDir(spark, base)

val streamSchema = StructType(Seq(
  StructField("entry_id", LongType), StructField("user_id", LongType),
  StructField("ts_us", LongType), StructField("pageview_count", LongType),
  StructField("event_type", StringType)))

// the registry's micro-batch fixture shape: events as 4 time-ordered
// json files, 2 files/trigger => 3 replay triggers (AvailableNow)
val ev = graft.Tables.events(spark, sfDir).select(
  col("event_id").as("entry_id"), col("user_id"),
  unix_micros(col("ts")).as("ts_us"),
  floor(col("value")).cast("long").as("pageview_count"), col("event_type"))
val Array(lo, m1, m2) = Array(0.25, 0.5, 0.75).map(q =>
  ev.stat.approxQuantile("ts_us", Array(q), 0.01).head.toLong)
Seq(("b0", col("ts_us") <= lo), ("b1", col("ts_us") > lo && col("ts_us") <= m1),
    ("b2", col("ts_us") > m1 && col("ts_us") <= m2), ("b3", col("ts_us") > m2))
  .foreach { case (n, pred) =>
    graft.io.IO.writeJsonLines(ev.filter(pred), s"$base/src/$n.json", singleFile = true)
  }
val glob = s"$base/src/*.json/*.json"
println(s"PROBE fixture rows = ${ev.count()}")

val TrackKey = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"

def run(mode: String, partitions: Int, track: Boolean): (Long, Double) = {
  val prevMode = spark.conf.getOption(Streams.StateStoreModeKey)
  val prevTrack = spark.conf.getOption(TrackKey)
  spark.conf.set(Streams.StateStoreModeKey, mode)
  spark.conf.set(TrackKey, track.toString)
  try {
    val t0 = System.nanoTime
    val n = Streams.runFileStream(spark, glob, streamSchema,
      s"$base/ckpt_${System.nanoTime}",
      df => Streams.streamSelfJoinPairs(df), OutputMode.Append(),
      maxFilesPerTrigger = Some(2), shufflePartitions = Some(partitions))
      .count()
    (n, (System.nanoTime - t0) / 1e9)
  } finally {
    prevMode.fold(spark.conf.unset(Streams.StateStoreModeKey))(
      spark.conf.set(Streams.StateStoreModeKey, _))
    prevTrack.fold(spark.conf.unset(TrackKey))(spark.conf.set(TrackKey, _))
  }
}

case class V(label: String, mode: String, partitions: Int, track: Boolean)
// The full U-curve matrix. The DECISIVE run (the one PROBES.md cites
// for the applied trim) interleaved the two contenders to cancel box
// drift: p4/track=on vs p8/track=off alternated in 3 blocks of 3 runs
// each — edit this list to that alternation to reproduce it.
val variants = Seq(
  V("heap        p4          (r16 A/B ref)", "heap", 4, true),
  V("rocksdb     p4 track=on (r16 default)", "rocksdb", 4, true),
  V("rocksdb     p4 track=off             ", "rocksdb", 4, false),
  V("rocksdb     p8 track=on              ", "rocksdb", 8, true),
  V("rocksdb     p8 track=off (applied)   ", "rocksdb", 8, false),
  V("rocksdb     p16 track=off            ", "rocksdb", 16, false),
  V("rocksdb     p2 track=on              ", "rocksdb", 2, true),
  V("rocksdb     p1 track=on              ", "rocksdb", 1, true))

// warm the json/source machinery once so variant 1 doesn't pay it
run("heap", 4, true)

var counts = Set.empty[Long]
variants.foreach { v =>
  val times = (1 to 3).map { _ => val (n, s) = run(v.mode, v.partitions, v.track)
    counts += n; s }
  println(f"PROBE ${v.label} runs=${times.map(t => f"$t%.2f").mkString("/")} min=${times.min}%.2f s")
}
assert(counts.size == 1,
  s"result must be variant-independent (oracle-pinned), got $counts")
println(s"PROBE identical result rows across all variants: ${counts.head}")
Streams.deleteDir(spark, base)
