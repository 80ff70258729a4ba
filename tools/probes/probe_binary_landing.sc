// Probe: s16/st16 binary landing volume at a realistic small-file
// count (round-14 verdict item 3). Claims under test:
//   (a) the batch binaryFile source is LISTING-bound at high file
//       counts -- whole-file tasks, no splits -- so files/s, the task
//       count, and the listing wall are the numbers that matter;
//   (b) the streaming source RE-LISTS the directory every trigger and
//       diffs against its seen-files log, so draining N files at
//       m files/trigger pays O(N/m) listings of O(N) entries -- the
//       quadratic knee that makes tiny maxFilesPerTrigger values
//       catastrophic at landing-volume scale;
//   (c) the mitigation is one ingest pass that PACKS the files into a
//       parquet payload table (splittable, columnar, ~MB-sized files)
//       -- downstream consumers then re-scan at parquet speed instead
//       of re-paying per-file open/list costs.
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 16g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_binary_landing.sc -e ':quit'
import org.apache.spark.sql.functions._

def timed(label: String)(f: => Unit): Double = {
  val t0 = System.nanoTime
  f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-34s $s%8.1f s")
  s
}

val root = sys.props("java.io.tmpdir") + "/graft_probe_binfiles"

/** Generate n small .bin files (~120 B each, deterministic content) in
  * parallel -- 32 writer tasks, one subdir per probe size. */
def genFiles(n: Int): String = {
  val dir = s"$root/n$n"
  val done = java.nio.file.Paths.get(s"$dir/_GENDONE")
  if (!java.nio.file.Files.exists(done)) {
    val d = new java.io.File(dir)
    if (d.exists) { d.listFiles.foreach(_.delete()); d.delete() }
    java.nio.file.Files.createDirectories(d.toPath)
    val t = timed(s"generate-$n-files") {
      spark.range(0L, n.toLong, 1L, 32).foreachPartition {
        (it: Iterator[java.lang.Long]) =>
          it.foreach { i =>
            val body = s"payload $i " + ("x" * (80 + (i % 37)).toInt)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(f"$dir/doc_$i%08d.bin"),
              body.getBytes("UTF-8"))
          }
      }
    }
    println(f"PROBE gen rate ${n / t}%.0f files/s")
    java.nio.file.Files.createFile(done)
  }
  dir
}

def cleanDir(p: String): Unit = {
  val fs = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  fs.delete(new org.apache.hadoop.fs.Path(p), true)
}

// ---------- batch binaryFile: listing vs scan, at two file counts ----------
for (n <- Seq(100000, 300000)) {
  val dir = genFiles(n)
  var df: org.apache.spark.sql.DataFrame = null
  val tList = timed(s"batch-listing-$n") {
    df = spark.read.format("binaryFile").load(s"$dir/*.bin")
  }
  var agg: org.apache.spark.sql.Row = null
  val tScan = timed(s"batch-scan-$n") {
    // crc over content forces every byte through the reader -- a
    // length-only agg would let column pruning skip the payload
    agg = df.agg(count(lit(1)), sum(crc32(col("content"))), sum(col("length"))).head()
  }
  println(s"PROBE batch n=$n rows=${agg.getLong(0)} tasks=${df.rdd.getNumPartitions}" +
    f" list=${tList}%.1f s scan=${tScan}%.1f s rate=${n / tScan}%.0f files/s")
  assert(agg.getLong(0) == n.toLong)
}

// ---------- streaming: maxFilesPerTrigger sweep over 100k files ----------
val dir100k = genFiles(100000)
val binSchema = org.apache.spark.sql.types.StructType(Seq(
  org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
  org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
  org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
  org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
for (m <- Seq(5000, 25000, 100000)) {
  val ckpt = s"$root/ckpt_m$m"
  cleanDir(ckpt)
  var triggers = 0L
  val t = timed(s"stream-drain-100k-m$m") {
    val q = spark.readStream.schema(binSchema)
      .option("maxFilesPerTrigger", m)
      .format("binaryFile").load(s"$dir100k/*.bin")
      .select(col("length"), crc32(col("content")).as("crc"))
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    triggers = q.recentProgress.map(_.batchId).distinct.length.toLong
  }
  println(f"PROBE stream m=$m triggers>=$triggers rate=${100000 / t}%.0f files/s")
}

// ---------- mitigation: pack once into parquet, rescan at parquet speed ----------
val packed = s"$root/packed_100k"
cleanDir(packed)
val tPack = timed("pack-100k-to-parquet") {
  spark.read.format("binaryFile").load(s"$dir100k/*.bin")
    .select(element_at(split(col("path"), "/"), -1).as("fname"),
      col("length"), col("content"))
    .repartition(32)
    .write.mode("overwrite").parquet(packed)
}
var pAgg: org.apache.spark.sql.Row = null
val tRescan = timed("rescan-packed-parquet") {
  pAgg = spark.read.parquet(packed)
    .agg(count(lit(1)), sum(crc32(col("content"))), sum(col("length"))).head()
}
val nFilesPacked = new java.io.File(packed).listFiles
  .count(f => f.getName.startsWith("part-"))
println(f"PROBE packed rows=${pAgg.getLong(0)} files=$nFilesPacked" +
  f" pack=${tPack}%.1f s rescan=${tRescan}%.1f s rate=${100000 / tRescan}%.0f files/s")
// value identity: the packed table carries exactly the bytes the
// binaryFile scan read (checksum + total length match)
val bAgg = spark.read.format("binaryFile").load(s"$dir100k/*.bin")
  .agg(sum(crc32(col("content"))), sum(col("length"))).head()
println("PROBE packed match=" +
  (pAgg.getLong(1) == bAgg.getLong(0) && pAgg.getLong(2) == bAgg.getLong(1)))
