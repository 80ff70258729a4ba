// Probe: one more RocksDB-tuning pass at the 10x-state per-row tax
// (r18 verdict #7). probe_stream_wall_10x.sc priced the default at
// ~25-40 us/state-row over heap and swept trigger count, changelog
// mode, blockCacheSizeMB and writeBufferSizeMB; this grid covers the
// REMAINING Spark-exposed RocksDB knobs on the same join shape at
// n = 1M, p8:
//   maxWriteBufferNumber (memtable count: absorb write bursts before
//     flush stalls), maxOpenFiles (SST handle cache: -1 = unlimited
//     is already the Spark default, 500 tests the constrained case),
//   compactOnCommit (force compaction each commit -- expected to
//     HURT; documents the floor from the other side),
//   formatVersion=5 (the newest table format; governs the bloom
//     filter's on-disk format -- Spark exposes NO direct bloom-policy
//     knob, so this is the only bloom-adjacent surface).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_rocksdb_knobs_10x.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
spark.sparkContext.setLogLevel("WARN")

val base = sys.props("java.io.tmpdir") + "/graft_probe_rocks_knobs"
graft.streaming.Streams.deleteDir(spark, base)

val schema = StructType(Seq(
  StructField("entry_id", LongType), StructField("user_id", LongType),
  StructField("ts_us", LongType)))

val n = 1000000L
val spanUs = 3L * 24 * 3600 * 1000000
val stepUs = spanUs / n
val ev = spark.range(n).select(
  col("id").as("entry_id"), (col("id") % 5000L).as("user_id"),
  (lit(1704067200000000L) + col("id") * stepUs).as("ts_us"))
val files = 8
(0 until files).foreach { i =>
  ev.filter(col("entry_id") % files === i)
    .coalesce(1).write.mode("overwrite").json(s"$base/src/b$i.json")
}
val glob = s"$base/src/*.json/*.json"

val R = "spark.sql.streaming.stateStore.rocksdb."
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  graft.streaming.Streams.RocksDbProvider)
spark.conf.set(R + "changelogCheckpointing.enabled", "true")
spark.conf.set(R + "trackTotalNumberOfRows", "false")

val grid: Seq[(String, Map[String, String])] = Seq(
  "baseline (engine default)" -> Map.empty,
  "maxWriteBufferNumber=4" -> Map(R + "maxWriteBufferNumber" -> "4"),
  "writeBufferSizeMB=256 + maxWriteBufferNumber=4" ->
    Map(R + "writeBufferSizeMB" -> "256", R + "maxWriteBufferNumber" -> "4"),
  "maxOpenFiles=500" -> Map(R + "maxOpenFiles" -> "500"),
  "compactOnCommit=true" -> Map(R + "compactOnCommit" -> "true"),
  "formatVersion=5" -> Map(R + "formatVersion" -> "5"))

def runJoin(ckpt: String): Double = {
  graft.streaming.Streams.deleteDir(spark, ckpt)
  spark.conf.set("spark.sql.shuffle.partitions", 8)
  val events = spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 2).json(glob)
  val t0 = System.nanoTime()
  val q = graft.streaming.Streams.streamSelfJoinPairs(events)
    .writeStream.format("noop").option("checkpointLocation", ckpt)
    .trigger(Trigger.AvailableNow()).start()
  q.awaitTermination()
  spark.conf.set("spark.sql.shuffle.partitions", 32)
  (System.nanoTime() - t0) / 1e9
}

for (sweep <- 1 to 2; ((label, confs), i) <- grid.zipWithIndex) {
  confs.foreach { case (k, v) => spark.conf.set(k, v) }
  val w = runJoin(s"$base/ck_${sweep}_$i")
  confs.keys.foreach(spark.conf.unset)
  println(f"PROBE sweep$sweep $label%-46s joinWall=$w%7.1f s")
}
println("PROBE done")
