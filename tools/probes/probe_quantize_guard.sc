// Probe: what the round-14 quantize amplitude guard costs on the
// embedding scale path. Similarity.quantize now prepends a per-row
// array_max(|x|) check (one extra array traversal + sqrt + compare)
// before the fixed-point transform, so EVERY embedding family
// (x5/x6/x7/x9/x17/x22/x27) pays it per corpus scan. Claim under test
// (quantize scaladoc): in-bound embeddings "never pay more than the
// check" -- i.e. the guard is a bounded, small constant over the
// unguarded transform, not a plan regression (no codegen break, no
// extra exchange). Two arms over the same 10M x 64-dim corpus, same
// consumer (sum of integer self-dots -- forces full materialization of
// every quantized component):
//   unguarded = the pre-r14 transform-only expression (inlined here)
//   guarded   = Similarity.quantize as shipped
// Checksums must match bit-for-bit (the guard is check-only inside the
// bound). First sweep in a fresh JVM carries JIT tier-up; repeats give
// steady state (the nfcq-probe convention).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_quantize_guard.sc -e ':quit'
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

spark.sparkContext.setLogLevel("WARN")
graft.functions.LongArrayDot.register(spark)

val N = sys.env.getOrElse("GRAFT_QG_N", "10000000").toLong
val dim = 64
// components in [0.1, 10.2] -- an order inside the ~95 bound at dim 64
val vec = transform(sequence(lit(0), lit(dim - 1)),
  j => (((col("id") * 2654435761L + j.cast("long") * 40503L) % 101L) + 1L).cast("double") / 10.0)
val base = spark.range(1, N + 1).select(col("id").as("vec_id"), vec.as("embedding"))

val unguarded: Column => Column =
  v => transform(v, x => floor(x.cast("double") * 1000000.0).cast("long"))
val guarded: Column => Column = graft.llm.Similarity.quantize

def sweep(label: String, q: Column => Column): Unit = {
  val t0 = System.nanoTime
  // modular sum: raw self-dots are ~6.7e15 each and would overflow the
  // ANSI long sum within thousands of rows
  val r = base.select(call_function("dotq", q(col("embedding")), q(col("embedding"))).as("d"))
    .agg(sum(pmod(col("d"), lit(1000000007L))).as("ck")).collect()(0)
  println(f"QGUARD n=$N $label%-12s wall_s=${(System.nanoTime - t0) / 1e9}%6.1f checksum=${r.getLong(0)}")
}

for (rep <- 1 to 3) {
  sweep(s"unguarded_$rep", unguarded)
  sweep(s"guarded_$rep", guarded)
}
System.exit(0)
