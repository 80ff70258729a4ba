// Probe: x16 bloom-prefilter incremental dedup at 100M-row history.
// Claim under test (BloomDedup scaladoc): survivor set ~ true dupes +
// fpp*|history|, so the broadcast side stays small at corpus scale and
// the history NEVER shuffles. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_x16_bloom_100m.sc
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val H = 100000000L // history rows
val B = 1000000L   // batch rows; half dupes, half new
val history = spark.range(H).select(concat(lit("k"), col("id")).as("k"))
val batch = spark.range(B).select(
  when(col("id") % 2 === 0, concat(lit("k"), col("id") * 100L))
    .otherwise(concat(lit("x"), col("id"))).as("k"))

// survivor census -- the number the 100 TB broadcast claim rests on
graft.llm.BloomDedup.register(spark)
val t0 = System.nanoTime
val bf = batch.select(xxhash64(col("k")).as("__h")).stat.bloomFilter("__h", B, 0.001)
val bos = new java.io.ByteArrayOutputStream()
bf.writeTo(bos)
val bytes = bos.toByteArray
val survivors = history
  .filter(call_function("bloom_might_contain", lit(bytes), xxhash64(col("k"))))
  .distinct.count
val t1 = System.nanoTime

// end-to-end operator
val out = graft.llm.BloomDedup.antiJoinBloom(batch, history, "k", B, 0.001)
val n = out.count
val t2 = System.nanoTime
println(f"PROBE_X16 bloom_bytes=${bytes.length} survivors=$survivors expected_true_dupes=${B / 2} fp_budget=${(0.001 * H).toLong} result_rows=$n census_s=${(t1 - t0) / 1e9}%.1f e2e_s=${(t2 - t1) / 1e9}%.1f")
System.exit(0)
