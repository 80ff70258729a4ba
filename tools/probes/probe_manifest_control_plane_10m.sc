// Probe: the manifest CONTROL PLANE priced at 10M rows (r17 verdict
// #5). A 100 TB landing zone of ~1 MB objects is ~10^8 manifest rows;
// the probes so far stopped at 50k. Per open, the control plane pays:
//   (1) openManifested's metadata agg (count / countDistinct(basename)
//       / sum(length) / min(length)) -- one columnar agg;
//   (2) byte-aware split assignment: the LPT sort + distributed prefix
//       sum (ops.Cumsum) + the exact key-as-partition-id placement;
//   (3) (pre-r18 only) readLandingManifest's always-on `.distinct()`
//       over checkpoint+segments -- the full-manifest shuffle the
//       _FOLDING marker fix scopes to the fold crash window.
// This synthesizes the (path, length) FRAME (rows, not files -- the
// per-file open cost is the payload plane, priced elsewhere) and walls
// each stage at 1M and 10M rows. The split-assignment stages duplicate
// IO.assignByteSplits/openManifested's exact expressions (private[graft]
// is unreachable from a spark-shell script; keep in sync with
// io/IO.scala).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_manifest_control_plane_10m.sc -e ':quit'
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")
import spark.implicits._

def timed[T](label: String)(f: => T): (T, Double) = {
  val t0 = System.nanoTime
  val r = f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-58s $s%8.2f s")
  (r, s)
}

def heapUsedMb(): Long = {
  System.gc(); Thread.sleep(200); System.gc()
  val r = Runtime.getRuntime
  (r.totalMemory - r.freeMemory) / (1024 * 1024)
}

// ~1 MB objects with a long-tailed size mix and a giant outlier per
// ~1M files (the skew shape assignByteSplits exists for)
def manifest(n: Long) = spark.range(n).select(
  concat(lit("/data/landing/zone/"), col("id") % 4096, lit("/f"),
    col("id"), lit(".bin")).as("path"),
  when(col("id") % 1000000L === 0L, lit(2000000000L))
    .otherwise((col("id") % 2097152L) + 65536L).as("length"))

for (n <- Seq(1000000L, 10000000L)) {
  println(s"PROBE ---- n=$n manifest rows ----")
  val m = manifest(n).localCheckpoint() // materialize: price the plane, not the generator
  val h0 = heapUsedMb()

  // (1) openManifested's metadata agg (exact expression incl. the
  // basename-collision countDistinct over a derived column)
  val basename = element_at(split(col("path"), "/"), -1)
  val (stats, tAgg) = timed(s"open plan: metadata agg") {
    m.agg(count(lit(1)).as("n"), countDistinct(basename).as("nd"),
      sum(col("length")).as("bytes"), min(col("length")).as("min_len")).head()
  }
  assert(stats.getLong(0) == n && stats.getLong(1) == n)

  // (2) byte-aware splits: LPT order -> distributed prefix sum ->
  // split id -> EXACT placement (key-as-partition-id partitioner);
  // count() forces the full placement shuffle without opening files
  val maxPB = 134217728L
  val nSplits = math.max(1L, (stats.getLong(2) + maxPB - 1) / maxPB).toInt
  val (placed, tSplit) = timed(s"open plan: cumsum split assign + exact placement ($nSplits splits)") {
    graft.ops.Cumsum.globalCumsum(
      m.select("path", "length"),
      Seq(col("length").desc, col("path")), col("length"), "__cum")
      .withColumn("__split",
        ((col("__cum") - col("length")) / lit(maxPB)).cast("long"))
      .select("__split", "path", "length")
      .rdd
      .map(r => (math.min(r.getLong(0), (nSplits - 1).toLong).toInt,
        (r.getString(1), r.getLong(2))))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nSplits
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .count()
  }
  assert(placed == n)

  // (3) the pre-r18 always-on distinct vs the r18 plain union read:
  // what the _FOLDING marker fix saves on EVERY steady-state open
  val (_, tUnion) = timed("steady-state read: plain union (r18, no marker)") {
    m.agg(count(lit(1)), expr("bit_xor(xxhash64(path, length))")).head()
  }
  val (_, tDistinct) = timed("steady-state read: union + distinct (pre-r18)") {
    m.distinct().agg(count(lit(1)), expr("bit_xor(xxhash64(path, length))")).head()
  }

  val h1 = heapUsedMb()
  println(f"PROBE summary n=$n%d aggS=$tAgg%.2f splitS=$tSplit%.2f " +
    f"unionReadS=$tUnion%.2f distinctReadS=$tDistinct%.2f driverHeapDeltaMB=${h1 - h0}%d")
  m.unpersist(): Unit
}
println("PROBE done")
