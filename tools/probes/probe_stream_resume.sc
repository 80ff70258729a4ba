// Probe: streaming checkpoint RESUME through the bucketed upsert sink.
// The registered st10/st12 replays delete their checkpoint up front by
// design (fresh, idempotent oracle replays); production wires
// upsertBucketedBatch into its own foreachBatch stream and relies on
// the checkpoint for crash recovery. Claims under test:
//   (a) a stream that CRASHES mid-replay (foreachBatch throws on its
//       2nd micro-batch) resumes from the same checkpoint and
//       re-processes ONLY the failed batch id -- committed batches do
//       not re-run;
//   (b) the final table equals the batch keep-latest oracle exactly --
//       the crash + resume is invisible in the data.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=8 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 4g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_stream_resume.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

spark.sparkContext.setLogLevel("WARN")
import spark.implicits._

val root = "/tmp/probe_stream_resume"
graft.streaming.Streams.deleteDir(spark, root)
val srcDir = s"$root/src"
val ckpt = s"$root/ckpt"
val tbl = s"$root/table"

// 4 single-file micro-batches of (id, v, ts): later files carry newer
// ts for overlapping ids, so keep-latest has real work per batch
val schema = StructType(Seq(StructField("id", LongType),
  StructField("v", LongType), StructField("ts", LongType)))
for (b <- 0 until 4) {
  val df = spark.range(0L, 1000L)
    .select((col("id") + b * 500L).as("id"), lit(b.toLong * 10L).as("v"), lit(b.toLong).as("ts"))
  graft.io.IO.writeJsonLines(df, s"$srcDir/b$b.json", singleFile = true)
}

// batchIds seen by each stream incarnation, and a one-shot crash
val seen = collection.mutable.ArrayBuffer.empty[Long]
@volatile var crashOnce = true

def runStream(label: String): Boolean = {
  seen.clear()
  val src = spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", 1).json(s"$srcDir/*.json/*.json")
  val q = src.writeStream
    .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      seen += batchId
      if (crashOnce && batchId == 1L) { crashOnce = false; sys.error("injected crash in batch 1") }
      graft.streaming.Streams.upsertBucketedBatch(
        spark, tbl, batch.toDF(), Seq("id"), Seq("ts"), 4)
    }
    .option("checkpointLocation", ckpt)
    .trigger(Trigger.AvailableNow())
    .start()
  try { q.awaitTermination(); true }
  catch { case e: Exception =>
    // surface WHY this incarnation died: the injected batch-1 crash is
    // expected for the first run, anything else must be diagnosable
    // from the output, not a bare ok=false
    println(s"PROBE_RESUME $label terminated: ${e.getMessage}")
    false }
  finally { if (q.isActive) q.stop() }
}

val firstOk = runStream("first")
val firstSeen = seen.toList
val secondOk = runStream("resume")
val secondSeen = seen.toList
println(s"PROBE_RESUME first ok=$firstOk seen=$firstSeen (expect crash after [0, 1])")
println(s"PROBE_RESUME resume ok=$secondOk seen=$secondSeen (expect [1, 2, 3] -- batch 0 committed, batch 1 replayed)")

// oracle: batch keep-latest over the union of all four files
val all = spark.read.schema(schema).json(s"$srcDir/*.json/*.json")
val expect = all.withColumn("rn", row_number().over(
    org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy(desc("ts"))))
  .filter(col("rn") === 1).drop("rn")
val got = spark.read.parquet(tbl).select("id", "v", "ts")
val diff = got.exceptAll(expect.select("id", "v", "ts")).count() +
  expect.select("id", "v", "ts").exceptAll(got).count()
println(s"PROBE_RESUME table rows=${got.count()} diff_vs_oracle=$diff " +
  s"ok=${secondOk && diff == 0 && firstSeen == List(0L, 1L) && secondSeen.headOption.contains(1L)}")
