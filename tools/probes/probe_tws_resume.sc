// Probe: checkpoint RESUME for stitchDwellTws -- the Spark 4
// transformWithState path whose per-user state lives in RocksDB files
// (round-11 verdict task 3: the one stateful operator with no
// crash-resume evidence; round 10 covered the foreachBatch upsert).
// Claims under test:
//   (a) a query that dies MID-BATCH (foreachBatch throws on batch 1,
//       before the sink write, so the TWS state commit for that batch
//       never lands) resumes from the same checkpoint, re-processes
//       ONLY the failed batch, and the RocksDB ValueState carries each
//       user's last event ACROSS the crash -- the replayed batch's
//       dwells still stitch to predecessors from the committed batch;
//   (b) the final output is row-identical to an uninterrupted run of
//       the same pipeline AND to the batch lead()-window oracle.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=4 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 4g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_tws_resume.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

spark.sparkContext.setLogLevel("WARN")
spark.conf.set("spark.sql.shuffle.partitions", "4")
spark.conf.set("spark.sql.streaming.stateStore.providerClass",
  "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

val root = "/tmp/probe_tws_resume"
graft.streaming.Streams.deleteDir(spark, root)
val srcDir = s"$root/src"

// 4 single-file micro-batches, 3 users interleaved in every file with
// monotonically increasing ts across files: every batch boundary cuts
// every user's stream, so EVERY batch's first dwell per user depends
// on state carried from the previous batch -- a resume that lost or
// double-applied RocksDB state changes the output, it cannot hide.
val schema = StructType(Seq(StructField("user_id", LongType),
  StructField("entry_id", LongType), StructField("ts_us", LongType)))
for (b <- 0 until 4) {
  val df = spark.range(0L, 30L).select(
    (col("id") % 3L).as("user_id"),
    (col("id") + b * 100L).as("entry_id"),
    (col("id") * 7L + b * 1000L).as("ts_us"))
  graft.io.IO.writeJsonLines(df, s"$srcDir/b$b.json", singleFile = true)
}

val seen = collection.mutable.ArrayBuffer.empty[Long]
@volatile var crashOnce = false

def runTws(outDir: String, ckpt: String, label: String): Boolean = {
  seen.clear()
  val src = spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 1).json(s"$srcDir/*.json/*.json")
  val dwells = graft.streaming.Streams.stitchDwellTws(spark, src)
  val q = dwells.writeStream
    .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      seen += batchId
      if (crashOnce && batchId == 1L) { crashOnce = false; sys.error("injected crash in batch 1") }
      batch.toDF().write.mode("append").parquet(outDir)
    }
    .option("checkpointLocation", ckpt)
    .trigger(Trigger.AvailableNow())
    .start()
  try { q.awaitTermination(); true }
  catch { case e: Exception =>
    println(s"PROBE_TWS $label terminated: ${e.getMessage}")
    false }
  finally { if (q.isActive) q.stop() }
}

// uninterrupted twin: own checkpoint + own output table
val baseOk = runTws(s"$root/out_base", s"$root/ckpt_base", "baseline")
val baseSeen = seen.toList

// crash + resume against ONE checkpoint + output table
crashOnce = true
val firstOk = runTws(s"$root/out_crash", s"$root/ckpt_crash", "first")
val firstSeen = seen.toList
val resumeOk = runTws(s"$root/out_crash", s"$root/ckpt_crash", "resume")
val resumeSeen = seen.toList
println(s"PROBE_TWS baseline ok=$baseOk seen=$baseSeen")
println(s"PROBE_TWS first ok=$firstOk seen=$firstSeen (expect crash after [0, 1])")
println(s"PROBE_TWS resume ok=$resumeOk seen=$resumeSeen (expect [1, 2, 3] -- batch 0 committed, 1 replayed)")

// batch oracle: per-user lead() over the union of all files
val all = spark.read.schema(schema).json(s"$srcDir/*.json/*.json")
val w = org.apache.spark.sql.expressions.Window
  .partitionBy("user_id").orderBy(col("ts_us"), col("entry_id"))
val expect = all.withColumn("next_ts", lead(col("ts_us"), 1).over(w))
  .filter(col("next_ts").isNotNull)
  .select(col("user_id"), col("entry_id"), (col("next_ts") - col("ts_us")).as("dwell_us"))

def diffVs(dir: String): Long = {
  val got = spark.read.parquet(dir).select("user_id", "entry_id", "dwell_us")
  got.exceptAll(expect).count() + expect.exceptAll(got).count()
}
val dBase = diffVs(s"$root/out_base")
val dCrash = diffVs(s"$root/out_crash")
println(s"PROBE_TWS diff_base_vs_oracle=$dBase diff_crashresume_vs_oracle=$dCrash " +
  s"ok=${baseOk && !firstOk && resumeOk && dBase == 0 && dCrash == 0 &&
    firstSeen == List(0L, 1L) && resumeSeen == List(1L, 2L, 3L)}")
