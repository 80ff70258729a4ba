// Probe: SemDeDup cell-count sizing at 1M vectors (round-15 verdict
// item 6) -- fixed numCells=16 vs the new count-derived sqrt(n) default.
// The pair-verify stage compares every same-cell pair, so its cost is
// Sum(|cell|^2); with 16 cells over 1M vectors that is ~6e10 pairs (the
// quadratic trap the old default hid in a comment), with derived
// sqrt(1M)=1000 cells it is ~1e9 -- 60x less, and the full dedup
// actually RUNS. We measure: (a) the pair count each geometry implies
// (exact, from the trained assignment -- no quadratic join executed for
// fixed-16); (b) the full dedup wall under the derived default;
// (c) the full dedup wall for fixed-16 at 100k as the extrapolation
// anchor (100k^2/16 = 6e8 pairs is the same per-pair work, 100x fewer).
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-memory 24g --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x17_numcells_derived_1m.sc -e ':quit'
import org.apache.spark.sql.functions._
spark.sparkContext.setLogLevel("WARN")

def timed(label: String)(f: => Unit): Double = {
  val t0 = System.nanoTime
  f
  val s = (System.nanoTime - t0) / 1e9
  println(f"PROBE $label%-40s $s%8.1f s")
  s
}

def corpus(n: Long) = spark.range(n).select(col("id").as("vec_id"),
  transform(sequence(lit(1), lit(64)),
    j => (((col("id") % 997) * 131 + j * 29) % 211).cast("double") / lit(1000.0))
    .as("embedding"))

// exact pair-verify volume for a geometry: stage the cell assignment
// (the public train+assign path), then Sum over cells of
// |cell|*(|cell|-1)/2 from the staged table
def pairVolume(n: Long, cells: Option[Int], tag: String): Long = {
  val dir = sys.props("java.io.tmpdir") + s"/graft_probe_numcells_$tag"
  graft.streaming.Streams.deleteDir(spark, dir)
  graft.llm.Similarity.stageSemanticCells(corpus(n), dir, numCells = cells,
    corpusSize = Some(n))
  val occ = spark.read.parquet(graft.io.Staging.resolveRead(spark, dir))
    .groupBy("cell_id").count()
  occ.agg(sum(col("count") * (col("count") - 1) / 2)).head().getDouble(0).toLong
}

println("PROBE pair-verify volume at 1M (exact, from the staged assignment):")
val p16 = pairVolume(1000000L, Some(16), "fixed16")
println(f"PROBE   fixed-16:        $p16%,d same-cell pairs")
val pDerived = pairVolume(1000000L, None, "derived")
println(f"PROBE   derived sqrt(n)=1000 cells: $pDerived%,d same-cell pairs (${p16.toDouble / pDerived}%.0fx less)")

// the derived default end-to-end at 1M: the thing fixed-16 cannot do
val c1m = corpus(1000000L)
timed("full-semanticDedup-1m-derived") {
  graft.llm.Similarity.semanticDedup(c1m, corpusSize = Some(1000000L))
    .write.format("noop").mode("overwrite").save()
}
// fixed-16 anchor at 100k: same pairs-per-cell density class as 1M/16
// at 1/100 the volume -- multiply the pair-stage wall by ~100 for the
// 1M/fixed-16 estimate
val c100k = corpus(100000L)
timed("full-semanticDedup-100k-fixed16") {
  graft.llm.Similarity.semanticDedup(c100k, numCells = Some(16))
    .write.format("noop").mode("overwrite").save()
}
println("PROBE done")
System.exit(0)
