// Probe: y22 exact heavy hitters at 100M token instances / ~30M vocab.
// Claim under test (Sketches.exactHeavyHitters scaladoc): the MG
// candidate pass shrinks the aggregation shuffle from |vocab| rows to
// <= partitions*k rows while staying value-identical to the direct
// GROUP BY ... HAVING. Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_y22_hh_100m.sc
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
val N = 100000000L
// 20% of instances spread over 10 hot tokens (2% each); the rest over a
// ~27M-token tail (~3 occurrences each) - the vocab-shuffle killer
val items = spark.range(N).select(
  when(col("id") % 5 === 0, concat(lit("hot"), (col("id") / 5).cast("long") % 10))
    .otherwise(concat(lit("r"), (col("id") / 3).cast("long"))).as("term"))

// A: direct single-shuffle GROUP BY + HAVING over the full vocabulary.
// Under the memory-pressure variant of this probe (small heap), the
// direct plan may legitimately fail on the 27M-key shuffle; the MG
// path must still complete (its sketch pass is k-counter-bounded by
// construction), so a direct failure is reported, not fatal.
val tA0 = System.nanoTime
val directRows: Option[Array[org.apache.spark.sql.Row]] =
  try {
    val direct = items.groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(items.select(count(lit(1)).as("n_total"))))
      .filter(col("cnt") * 100 > col("n_total"))
    Some(direct.collect().sortBy(_.getString(0)))
  } catch { case e: Throwable =>
    println(s"PROBE_Y22 direct plan FAILED under pressure: ${e.getClass.getSimpleName}")
    None
  }
val tA1 = System.nanoTime

// B: two-pass MG-pruned operator (phiDen=100 <= k+1)
val hh = graft.llm.Sketches.exactHeavyHitters(items, "term", phiDen = 100L, k = 256)
val hhRows = hh.collect().sortBy(_.getString(0))
val tB1 = System.nanoTime

val identical = directRows.forall(d =>
  d.map(r => (r.getString(0), r.getLong(1))).toSeq ==
    hhRows.map(r => (r.getString(0), r.getLong(1))).toSeq)
println(f"PROBE_Y22 n=$N hitters=${hhRows.length} " +
  f"direct=${directRows.fold("FAILED")(_ => "ok")} identical=$identical " +
  f"direct_s=${(tA1 - tA0) / 1e9}%.1f mg_s=${(tB1 - tA1) / 1e9}%.1f")
System.exit(if (identical && hhRows.length == 10) 0 else 1)
