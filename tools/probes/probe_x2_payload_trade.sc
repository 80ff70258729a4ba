// Probe: the shingle-payload trade in nearDupPairs' pair-dedup
// exchange at 1M docs (round-6 verdict item 5). Current plan carries
// sh_a/sh_b (functionally dependent on the ids) through
// dropDuplicates(id_a, id_b); the alternative dedups ids only and
// re-joins the shingles for the verify -- two extra exchanges for a
// thin dedup. Both are built from the SAME persisted banded table so
// only the pair path differs. Run like probe_x16.
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

spark.sparkContext.setLogLevel("WARN")
val N = 500000L // + 500k near-clones = 1M docs
val text = concat_ws(" ", (0 until 20).map(j => concat(lit("w"), (col("id") * 7 + j) % 50000, lit("t" + j))): _*)
val base = spark.range(N).select(col("id").as("doc_id"), text.as("text"))
val clones = spark.range(N).select((col("id") + N).as("doc_id"),
  concat(text, lit(" extra")).as("text"))
val docs = base.unionByName(clones)

// banded staging shared by both variants (mirror of bandedTable)
graft.functions.SortedArrayJaccard.register(spark)
val par = spark.sparkContext.defaultParallelism
val guarded = docs.filter(size(split(col("text"), "\\s+")) >= 3).repartition(par)
val withBands = guarded
  .withColumn("tk", split(col("text"), "\\s+"))
  .withColumn("sh", graft.llm.DedupLsh.shinglesFromTokens(col("tk"), 3))
  .withColumn("band", explode(graft.llm.DedupLsh.bandKeys(col("sh"), 4, 3)))
  .select(col("doc_id").as("id0"), col("sh"), col("band"))
  .persist(StorageLevel.MEMORY_AND_DISK)
println("banded_rows=" + withBands.count) // materialize before timing

def timeIt(label: String)(f: => Long): Long = {
  val t0 = System.nanoTime
  val n = f
  println(f"PROBE_X2_TRADE $label pairs=$n wall_s=${(System.nanoTime - t0) / 1e9}%.1f")
  n
}

// variant A -- carry-through (the shipped plan)
val aA = withBands.select(col("band"), col("id0").as("id_a"), col("sh").as("sh_a"))
val bA = withBands.select(col("band"), col("id0").as("id_b"), col("sh").as("sh_b"))
val nA = timeIt("carry_through") {
  aA.join(bA.hint("shuffle_hash"), Seq("band"))
    .filter(col("id_a") < col("id_b"))
    .dropDuplicates("id_a", "id_b")
    .select(col("id_a"), col("id_b"),
      graft.llm.DedupLsh.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
    .filter(col("jaccard") >= 0.5)
    .count
}

// variant B -- ids-only dedup + shingle re-join
val sh1 = withBands.select(col("id0"), col("sh")).dropDuplicates("id0")
  .persist(StorageLevel.MEMORY_AND_DISK)
println("sh_rows=" + sh1.count)
val aB = withBands.select(col("band"), col("id0").as("id_a"))
val bB = withBands.select(col("band"), col("id0").as("id_b"))
val nB = timeIt("ids_only_rejoin") {
  aB.join(bB.hint("shuffle_hash"), Seq("band"))
    .filter(col("id_a") < col("id_b"))
    .dropDuplicates("id_a", "id_b")
    .join(sh1.select(col("id0").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
    .join(sh1.select(col("id0").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    .select(col("id_a"), col("id_b"),
      graft.llm.DedupLsh.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
    .filter(col("jaccard") >= 0.5)
    .count
}
assert(nA == nB, s"variants disagree: $nA vs $nB")

// variant C -- thin bands end-to-end: persist the pre-explode (id, sh)
// frame, explode only (id, band), and join the arrays back at verify.
// This removes the array payload from BOTH the band self-join exchange
// (corpus x numBands rows) and the pair-dedup exchange; arrays cross
// the wire exactly once per side at the verify join.
val withSh = guarded
  .withColumn("tk", split(col("text"), "\\s+"))
  .withColumn("sh", graft.llm.DedupLsh.shinglesFromTokens(col("tk"), 3))
  .select(col("doc_id").as("id0"), col("sh"))
  .persist(StorageLevel.MEMORY_AND_DISK)
println("withSh_rows=" + withSh.count)
val thinBands = withSh
  .withColumn("band", explode(graft.llm.DedupLsh.bandKeys(col("sh"), 4, 3)))
  .select(col("id0"), col("band"))
  .persist(StorageLevel.MEMORY_AND_DISK)
println("thinBands_rows=" + thinBands.count)
val aC = thinBands.select(col("band"), col("id0").as("id_a"))
val bC = thinBands.select(col("band"), col("id0").as("id_b"))
val nC = timeIt("thin_bands_rejoin") {
  aC.join(bC.hint("shuffle_hash"), Seq("band"))
    .filter(col("id_a") < col("id_b"))
    .dropDuplicates("id_a", "id_b")
    .join(withSh.select(col("id0").as("id_a"), col("sh").as("sh_a")).hint("shuffle_hash"), Seq("id_a"))
    .join(withSh.select(col("id0").as("id_b"), col("sh").as("sh_b")).hint("shuffle_hash"), Seq("id_b"))
    .select(col("id_a"), col("id_b"),
      graft.llm.DedupLsh.jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
    .filter(col("jaccard") >= 0.5)
    .count
}
assert(nA == nC, s"variants disagree: $nA vs $nC")
System.exit(0)
