// Probe: the st8 state-PARTITION U-curve re-tested at 10x state under
// the RocksDB default (r18 verdict #6). The registry's p8 pin came
// from the sf0.1 sweep (probe_st8_rocksdb_trim.sc: p1 27.2 / p4 7.9 /
// p8 5.5 / p16 6.6 / p32 ~16 s); the 10x wall probe then showed
// 39-57 s spreads without re-testing partition counts. Same join
// shape and fixture law as probe_stream_wall_10x.sc (3-day span,
// user_id % 5000 -> join state a fixed fraction of n), n = 1M.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_st8_partitions_10x.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
spark.sparkContext.setLogLevel("WARN")

val base = sys.props("java.io.tmpdir") + "/graft_probe_st8_p10x"
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

// engine-default RocksDB confs as newRunnerSession pins them
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  graft.streaming.Streams.RocksDbProvider)
spark.conf.set(
  "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
spark.conf.set(
  "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")

def runJoin(parts: Int, ckpt: String): Double = {
  graft.streaming.Streams.deleteDir(spark, ckpt)
  spark.conf.set("spark.sql.shuffle.partitions", parts)
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

for (sweep <- 1 to 2; p <- Seq(1, 4, 8, 16, 32)) {
  val w = runJoin(p, s"$base/ck_${sweep}_p$p")
  println(f"PROBE sweep$sweep p=$p%-3d joinWall=$w%7.1f s (n=$n, rocksdb default)")
}
println("PROBE done")
