// Probe: the memory runner's SINK-COPY cost attributed per phase (r18
// verdict #5). The r18 clone+copy change touched every memory-sink
// runner and several st queries drifted +0.2-0.33 s in the same
// direction; only st1 was attributed. This separates, IN ONE RUN,
//   drain -- source listing + micro-batch replay + memory sink append
//            (everything up to awaitTermination);
//   copy  -- sink.collect() + ArraySeq wrap + parallelize on the
//            caller session + one materializing count
// for a TABLE-SIZED result (st1's projection, ~600k rows at sf0.1)
// and a CONTROL-SIZED one (st4's session aggregate), x2 sweeps. The
// runner internals are replicated inline (newRunnerSession is
// private[graft], unreachable from a spark-shell script; keep in sync
// with streaming/Streams.scala).
// Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_st_sink_copy_ab.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
spark.sparkContext.setLogLevel("WARN")

val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val base = sys.props("java.io.tmpdir") + "/graft_probe_sinkcopy"
graft.streaming.Streams.deleteDir(spark, base)

val streamSchema = StructType(Seq(
  StructField("entry_id", LongType), StructField("user_id", LongType),
  StructField("ts_us", LongType), StructField("pageview_count", LongType),
  StructField("event_type", StringType)))

// the registry's shared micro-batch fixture law (StreamQueries
// .writeMicroBatches): 4 time-ordered JSON files of the events table
val ev = graft.Tables.events(spark, sf).select(
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

// inline twin of runFileStream with the drain and the copy timed
// separately (keep in sync with Streams.scala)
def phased(tag: String, ckpt: String, outputMode: OutputMode,
           mft: Option[Int], parts: Option[Int],
           transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame):
    (Long, Double, Double) = {
  graft.streaming.Streams.deleteDir(spark, ckpt)
  val runner = spark.newSession()
  parts.foreach(n => runner.conf.set("spark.sql.shuffle.partitions", n))
  runner.conf.set("spark.sql.streaming.stateStore.providerClass",
    graft.streaming.Streams.RocksDbProvider)
  runner.conf.set(
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
  runner.conf.set(
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
  val reader = runner.readStream.schema(streamSchema)
  val src = mft.map(n => reader.option("maxFilesPerTrigger", n))
    .getOrElse(reader).format("json").load(glob)
  val name = s"mem_${System.nanoTime()}"
  try {
    val t0 = System.nanoTime()
    val q = transform(src).writeStream.format("memory").queryName(name)
      .outputMode(outputMode).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val drain = (System.nanoTime() - t0) / 1e9
    val sink = runner.table(name)
    val t1 = System.nanoTime()
    val rows = scala.collection.immutable.ArraySeq.unsafeWrapArray(sink.collect())
    val slices = math.max(1,
      math.min(spark.sparkContext.defaultParallelism, rows.size / 10000 + 1))
    val n = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, slices), sink.schema).count()
    val copy = (System.nanoTime() - t1) / 1e9
    (n, drain, copy)
  } finally { runner.catalog.dropTempView(name); () }
}

for (sweep <- 1 to 3) {
  val (n1, d1, c1) = phased("st1", s"$base/ck1_$sweep", OutputMode.Append(),
    None, None, df => df.select("entry_id", "user_id", "event_type", "ts_us"))
  println(f"PROBE sweep$sweep st1-shape  rows=$n1%7d drain=$d1%6.2f s copy=$c1%6.2f s")
  val (n4, d4, c4) = phased("st4", s"$base/ck4_$sweep", OutputMode.Complete(),
    None, None, df => graft.streaming.Streams.sessionWindowAgg(df))
  println(f"PROBE sweep$sweep st4-shape  rows=$n4%7d drain=$d4%6.2f s copy=$c4%6.2f s")
  // a genuinely CONTROL-SIZED sink (st6's hourly tumbling windows,
  // ~720 rows over the 30-day fixture): the copy should read ~0
  val (n6, d6, c6) = phased("st6", s"$base/ck6_$sweep", OutputMode.Append(),
    Some(2), Some(4), df => graft.streaming.Streams.tumblingAgg(df))
  println(f"PROBE sweep$sweep st6-shape  rows=$n6%7d drain=$d6%6.2f s copy=$c6%6.2f s")
}
println("PROBE done")
