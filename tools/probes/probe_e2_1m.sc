// Probe: E2 flagship (browsing preprocess, per-user) at a 1M-event
// upscale (10x the largest on-disk sf) -- round-6 verdict item 7. The
// one-exchange claim is spec'd at sf0.001; this runs the identical
// code path at 1M events with AQE's real partition counts and counts
// hash exchanges in the FINAL (post-AQE) plan. The upscale keeps the
// raw nanos-long ts so graft.Tables.events' `ts div 1000` path is the
// one exercised. Run like probe_x16.
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
println("schema=" + ev.schema.simpleString)
// 10 clones: 5x users x 2x per-user volume; props/ts shifted so the
// 3-col dedup key doesn't collapse clones
val up = spark.range(10).crossJoin(ev).select(
  (col("event_id") + col("id") * 10000000L).as("event_id"),
  (col("user_id") + (col("id") % 5) * 10000000L).as("user_id"),
  col("event_type"),
  (col("ts") + col("id") * 1000000000L).as("ts"),
  col("value"),
  concat(col("props"), lit("_"), col("id")).as("props"))
up.write.mode("overwrite").parquet("/tmp/probe_e2/events.parquet")
println("events=" + spark.read.parquet("/tmp/probe_e2/events.parquet").count)

val t0 = System.nanoTime
val out = graft.pipeline.Browsing.pipeline(spark, "/tmp/probe_e2", perUser = true)
out.write.format("noop").mode("overwrite").save()
val t1 = System.nanoTime
val finalPlan = out.queryExecution.executedPlan.toString
val hashEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
println(f"PROBE_E2_1M rows=${out.count} hash_exchanges=$hashEx wall_s=${(t1 - t0) / 1e9}%.1f")
System.exit(0)
