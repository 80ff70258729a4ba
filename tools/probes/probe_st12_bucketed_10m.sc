// Probe: st12 bucketed streaming upsert at 10M rows / 64 buckets.
// Claim under test: per-batch cost is O(touched buckets), not O(table)
// -- a small batch touching 2 of 64 buckets must cost a small fraction
// of the full-table seed write, and keep-latest semantics must hold.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-class-path target/scala-2.13/classes -i tools/probes/probe_st12_bucketed_10m.sc -e ':quit'
import org.apache.spark.sql.functions._
import graft.streaming.Streams

val root = "/tmp/probe_st12_10m"
val tbl = root + "/table"
val fsp = new org.apache.hadoop.fs.Path(root)
val fs = fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
fs.delete(fsp, true)

def timed(label: String)(f: => Unit): Double = {
  val t0 = System.nanoTime
  f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-24s $s%8.1f s")
  s
}

// seed: 10M rows spread over all 64 buckets (the full-table write)
val seed = (spark.range(0L, 10000000L).toDF("id")
  .withColumn("v", col("id") * 2L)
  .withColumn("ts", lit(0L)))
val tSeed = timed("seed-10M-64buckets") {
  Streams.upsertBucketedBatch(spark, tbl, seed, Seq("id"), Seq("ts"), 64)
}

// update batch A: 100k rows confined to buckets {3, 17} (2 of 64)
val b2 = (spark.range(0L, 100000L).toDF("n")
  .withColumn("id", (col("n") % 50000L) * 64L +
    when(col("n") < 50000L, 3L).otherwise(17L))
  .withColumn("v", lit(-1L))
  .withColumn("ts", lit(1L))
  .drop("n"))
val t2 = timed("upsert-100k-2of64") {
  Streams.upsertBucketedBatch(spark, tbl, b2, Seq("id"), Seq("ts"), 64)
}

// update batch B: 100k rows over 8 buckets (32..39, disjoint from A)
val b8 = (spark.range(0L, 100000L).toDF("n")
  .withColumn("id", floor(col("n") / 8L).cast("long") * 64L + 32L + (col("n") % 8L))
  .withColumn("v", lit(-2L))
  .withColumn("ts", lit(2L))
  .drop("n"))
val t8 = timed("upsert-100k-8of64") {
  Streams.upsertBucketedBatch(spark, tbl, b8, Seq("id"), Seq("ts"), 64)
}

// correctness: pure updates (every id < 10M), so count holds and the
// keep-latest winners are exactly the two batches
val t = spark.read.parquet(tbl)
println("PROBE rows=" + t.count())
println("PROBE updatedA=" + t.filter(col("v") === -1L).count())
println("PROBE updatedB=" + t.filter(col("v") === -2L).count())
println(f"PROBE ratio 2of64/seed = ${t2 / tSeed}%.3f, 8of64/seed = ${t8 / tSeed}%.3f")
