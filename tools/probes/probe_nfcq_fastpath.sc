// Probe: the nfcq ASCII fast path at corpus scale -- the claim in
// NfcNormalize's scaladoc is that a pure-ASCII value (the overwhelming
// majority of English crawl text) is detected on the raw UTF8String
// BYTES and returned as-is, zero String allocation, so putting NFC in
// front of every hashing consumer (x1/x19/y4/y18) is ~free for the
// common case and only multi-byte rows pay the JDK normalizer. Three
// sweeps over N ~120-byte synthetic docs, identical shapes:
//   baseline = md5(text)            -- the consumer without NFC
//   ascii    = md5(nfcq(text))      -- NFC added, all-ASCII corpus (fast path)
//   decomp   = md5(nfcq(text'))     -- every row carries one decomposed
//                                      e+U+0301 (forces isNormalized +
//                                      rebuild -- the worst case)
// Run: GRAFT_NFCQ_N=50000000 /opt/spark/bin/spark-shell --master 'local[32]' \
//   --conf spark.ui.enabled=false --conf spark.sql.shuffle.partitions=32 \
//   --conf spark.sql.session.timeZone=UTC --driver-memory 24g \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_nfcq_fastpath.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
graft.functions.NfcNormalize.register(spark)

val N = sys.env.getOrElse("GRAFT_NFCQ_N", "50000000").toLong

def timed(label: String)(f: => Long): Unit = {
  val t0 = System.nanoTime
  val r = f
  println(f"NFCQ n=$N $label%-28s ${(System.nanoTime - t0) / 1e9}%8.1f s  agg=$r")
}

// ~120-byte ASCII doc per id, deterministic; the repeat+id mix defeats
// any constant-folding of the md5 input
val asciiText = concat(lit("the quick brown fox jumps over the lazy dog "),
  col("id").cast("string"), lit(" pack my box with five dozen liquor jugs "),
  col("id").cast("string"))
val base = spark.range(N).select(col("id"), asciiText.as("text"))

// warm the input pipeline once so JIT + page-cache effects hit all
// three sweeps equally
base.agg(count(lit(1))).head.getLong(0)

// the consumer without NFC: one md5 per row (what x1's digest costs)
timed("baseline_md5") {
  base.agg(sum(crc32(md5(col("text"))))).head.getLong(0)
}

// repeated at the tail below -- the first 50M-row sweep in a fresh JVM
// carries JIT tier-up for the codegen class, so last-position repeats
// give the steady-state number

// NFC in front, all-ASCII corpus: the fast path must make this sweep
// indistinguishable from baseline (bytes-only scan, same reference out)
timed("ascii_nfcq_md5") {
  base.agg(sum(crc32(md5(expr("nfcq(text)"))))).head.getLong(0)
}

// worst case: every row multi-byte AND genuinely decomposed, so every
// row pays toString + isNormalized + normalize + re-encode
timed("decomposed_nfcq_md5") {
  base.select(concat(lit("e\u0301 "), col("text")).as("text"))
    .agg(sum(crc32(md5(expr("nfcq(text)"))))).head.getLong(0)
}

// control for the decomposed sweep's extra 3 bytes: same prefix length,
// still ASCII -- isolates the normalizer cost from the concat cost
timed("ascii_prefix_md5") {
  base.select(concat(lit("ex "), col("text")).as("text"))
    .agg(sum(crc32(md5(expr("nfcq(text)"))))).head.getLong(0)
}

timed("baseline_md5_repeat") {
  base.agg(sum(crc32(md5(col("text"))))).head.getLong(0)
}

timed("ascii_nfcq_md5_repeat") {
  base.agg(sum(crc32(md5(expr("nfcq(text)"))))).head.getLong(0)
}

println(s"NFCQ n=$N done")
