// Probe: stream-stream join (st8 shape) state memory at 1x and 10x,
// heap provider (HDFSBackedStateStoreProvider, the Spark default) vs
// RocksDB (the graft engine default since round 16).
// Claim under test: the heap provider's JVM footprint grows linearly
// with state rows (it IS the loaded-version map), so 100x stream state
// is an executor OOM; RocksDB keeps state in native memtables/SST
// files and its JVM-side footprint stays flat as state grows 10x.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_state_store_10x.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
spark.sparkContext.setLogLevel("WARN")

val base = sys.props("java.io.tmpdir") + "/graft_probe_state10x"
graft.streaming.Streams.deleteDir(spark, base)

val schema = StructType(Seq(
  StructField("entry_id", LongType), StructField("user_id", LongType),
  StructField("ts_us", LongType)))

// synthetic event stream: n events over a fixed 3-day span, so the
// join's retained state (delay 24h + 600s window behind max ts) is a
// FIXED FRACTION of n -- 10x events = 10x state rows by construction
def writeFixture(n: Long, dir: String): Unit = {
  val spanUs = 3L * 24 * 3600 * 1000000
  // integer step: long/long division in Column land yields DOUBLE and
  // the JSON roundtrip would null out the LongType schema read
  val stepUs = spanUs / n
  val ev = spark.range(n).select(
    col("id").as("entry_id"),
    (col("id") % 5000L).as("user_id"),
    (lit(1704067200000000L) + col("id") * stepUs).as("ts_us"))
  val files = 8
  (0 until files).foreach { i =>
    ev.filter(col("entry_id") % files === i)
      .coalesce(1).write.mode("overwrite").json(s"$dir/b$i.json")
  }
}

def heapUsedMb(): Long = {
  System.gc(); Thread.sleep(300); System.gc()
  val r = Runtime.getRuntime
  (r.totalMemory - r.freeMemory) / (1024 * 1024)
}

def runJoin(src: String, ckpt: String, mode: String): Unit = {
  graft.streaming.Streams.deleteDir(spark, ckpt)
  val key = "spark.sql.streaming.stateStore.providerClass"
  if (mode == "rocksdb")
    spark.conf.set(key, graft.streaming.Streams.RocksDbProvider)
  else spark.conf.unset(key)
  val events = spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 2).json(src)
  val joined = graft.streaming.Streams.streamSelfJoinPairs(events)
  val h0 = heapUsedMb()
  val t0 = System.nanoTime()
  val q = joined.writeStream.format("noop")
    .option("checkpointLocation", ckpt)
    .trigger(Trigger.AvailableNow()).start()
  q.awaitTermination()
  val wall = (System.nanoTime() - t0) / 1e9
  // peak JVM heap right after the final trigger, BEFORE the query's
  // state maps unload -- this is what an executor must hold live
  val hPeak = heapUsedMb()
  val progs = q.recentProgress.toSeq
  val stateRows = progs.flatMap(_.stateOperators.toSeq.map(_.numRowsTotal)).maxOption.getOrElse(0L)
  val memUsed = progs.flatMap(_.stateOperators.toSeq.map(_.memoryUsedBytes)).maxOption.getOrElse(0L)
  println(f"PROBE mode=$mode%-8s stateRows=$stateRows%9d stateMemMB=${memUsed / 1048576.0}%8.1f " +
    f"jvmHeapDeltaMB=${hPeak - h0}%6d wall=$wall%6.1f s")
}

for (scale <- Seq(1L, 10L)) {
  val n = 100000L * scale
  val src = s"$base/src_$scale"
  writeFixture(n, src)
  println(s"PROBE ---- scale=${scale}x (n=$n events, 3-day span, delay 24h) ----")
  for (mode <- Seq("heap", "rocksdb")) {
    runJoin(s"$src/*.json/*.json", s"$base/ckpt_${scale}_$mode", mode)
  }
}
println("PROBE done")
