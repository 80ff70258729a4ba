// Probe: WALL-CLOCK A/B of the engine's streaming defaults (RocksDB +
// changelog + trackTotalNumberOfRows=false) vs the heap provider at
// 1x and 10x stream state (r17 verdict #6 -- the r17 10x rerun proved
// the flat-MEMORY claim; this prices the WALL so the RocksDB
// per-trigger constant is shown to amortize as state grows).
// Shapes:
//   join  -- st8's stream-stream self-join (4-5 state stores per
//            partition, p8 as the registry runs it);
//   dedup -- st13's dropDuplicatesWithinWatermark with entry_id keys
//            (state rows == events, the 10x-state-sensitive shape, p4);
//   upsertB (st12) -- the bucketed foreachBatch merge: NO stateful
//            operator exists in its plan (state lives in the parquet
//            table + the source's seen-file log), so the provider A/B
//            is expected to read ~equal -- the row documents that st12
//            has no state-store surface to tune.
// Fixture law = probe_state_store_10x.sc (3-day span, join state a
// fixed fraction of n).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_stream_wall_10x.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger
spark.sparkContext.setLogLevel("WARN")

val base = sys.props("java.io.tmpdir") + "/graft_probe_wall10x"
graft.streaming.Streams.deleteDir(spark, base)

val schema = StructType(Seq(
  StructField("entry_id", LongType), StructField("user_id", LongType),
  StructField("ts_us", LongType)))

def writeFixture(n: Long, dir: String): Unit = {
  val spanUs = 3L * 24 * 3600 * 1000000
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

val provKey = "spark.sql.streaming.stateStore.providerClass"
val logKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
val trackKey = "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows"
val partKey = "spark.sql.shuffle.partitions"

// the engine-default vs heap conf sets, as newRunnerSession pins them
def setMode(mode: String): Unit = mode match {
  case "default" =>
    spark.conf.set(provKey, graft.streaming.Streams.RocksDbProvider)
    spark.conf.set(logKey, "true"); spark.conf.set(trackKey, "false")
  case "heap" =>
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
}

def runNoop(tag: String, src: String, ckpt: String, parts: Int,
            mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Double = {
  graft.streaming.Streams.deleteDir(spark, ckpt)
  spark.conf.set(partKey, parts)
  val events = spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 2).json(src)
  val t0 = System.nanoTime()
  val q = mk(events).writeStream.format("noop")
    .option("checkpointLocation", ckpt)
    .trigger(Trigger.AvailableNow()).start()
  q.awaitTermination()
  val wall = (System.nanoTime() - t0) / 1e9
  spark.conf.set(partKey, 32)
  wall
}

for (scale <- Seq(1L, 10L)) {
  val n = 100000L * scale
  val src = s"$base/src_$scale"
  writeFixture(n, src)
  val glob = s"$src/*.json/*.json"
  println(s"PROBE ---- scale=${scale}x (n=$n events) ----")
  for (mode <- Seq("heap", "default")) {
    setMode(mode)
    val wJoin = runNoop("join", glob, s"$base/ck_j_${scale}_$mode", 8,
      df => graft.streaming.Streams.streamSelfJoinPairs(df))
    val wDedup = runNoop("dedup", glob, s"$base/ck_d_${scale}_$mode", 4,
      df => graft.streaming.Streams.streamDedupKeysWithinWatermark(
        df, Seq("entry_id"), delay = "40 days"))
    val t0 = System.nanoTime()
    graft.streaming.Streams.runFileStreamUpsertBucketed(spark, glob, schema,
      s"$base/ck_u_${scale}_$mode", s"$base/tbl_${scale}_$mode",
      keys = Seq("user_id"), order = Seq("ts_us", "entry_id"), nBuckets = 16)
    val wUpsert = (System.nanoTime() - t0) / 1e9
    println(f"PROBE scale=${scale}x mode=$mode%-8s joinWall=$wJoin%7.1f s  " +
      f"dedupWall=$wDedup%7.1f s  upsertBWall=$wUpsert%7.1f s")
  }
  spark.conf.unset(provKey)
}
println("PROBE done")
