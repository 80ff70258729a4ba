// Probe: A/B the x2 verify-join strategy at sf0.1 (round-11 verdict
// task 2). The round-10 merge pin bought spill safety for +1.84 s at
// bench scale; this measures whether hint-free planning (static
// estimate + AQE runtime broadcast conversion) recovers the small-
// scale cost without giving the safety back. Three modes over the
// IDENTICAL x2 corpus, 3 runs each, checksum-pinned results:
//   merge        -- the round-10 shipping default
//   shuffle_hash -- the round-9 form (fast small-scale, non-spillable)
//   none         -- no hint: planner + AQE pick the strategy
// Run: /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//   --conf spark.sql.shuffle.partitions=32 --conf spark.sql.session.timeZone=UTC \
//   --driver-class-path target/scala-2.13/classes \
//   -i tools/probes/probe_x2_verify_join.sc -e ':quit'
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")

val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val d = spark.read.parquet(sf + "/documents.parquet").select(col("doc_id"), col("text"))
val toks = split(col("text"), " ")
val corpus = d.unionByName(d.select((col("doc_id") + 10000L).as("doc_id"),
  concat_ws(" ", slice(toks, lit(1), size(toks) - 1)).as("text")))

def run(mode: String): Unit = {
  System.setProperty("graft.dedup.verifyJoin", mode)
  for (i <- 1 to 3) {
    spark.catalog.clearCache()
    val t0 = System.nanoTime
    val r = graft.llm.DedupLsh.nearDupPairs(corpus, "doc_id", "text", threshold = 0.5)
      .agg(count(lit(1)),
        sum(xxhash64(col("id_a") * 31 + col("id_b")).cast("decimal(38,0)"))).head
    println(f"X2VERIFY mode=$mode%-12s run=$i wall=${(System.nanoTime - t0) / 1e9}%6.2f " +
      s"n=${r.getLong(0)} sum=${r.getDecimal(1)}")
  }
}
run("merge")
run("shuffle_hash")
run("none")
System.clearProperty("graft.dedup.verifyJoin")
