// Probe: the NearestCell fused argmax at the EXACT shape its scaladoc
// claims for -- 1M vectors x 1024 cells x dim 64 (round-13 verdict item
// 5: PROBES.md had the old "minutes" number but not the new
// expression's at that shape). Two arms over the SAME persisted
// quantized corpus and the SAME 1024-centroid codebook:
//   OLD  - the pre-r13 declarative argmax: crossJoin(broadcast(cents))
//          + cosineQ + max_by(struct(cell_id, nv), struct(sim, -cell_id)).
//          The struct-ordered, array-carrying agg buffer is not
//          UnsafeRow-mutable, so Spark plans a SortAggregate that sorts
//          the 1.024e9-row pair stream with nv copied through every
//          buffer update (shape reproduced verbatim from the r12 tree).
//   NEW  - the native nearest_cell_cos codegen loop against the
//          broadcast packed codebook: one narrow corpus scan, no pair
//          explosion, no aggregate, no sort.
// Identical assignment semantics (argmax cosine, tie -> lower cell_id),
// asserted by an assignment checksum sum(vec_id * cell_id) + row count.
// Run with:
//   /opt/spark/bin/spark-shell --master 'local[32]' --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes -i tools/probes/probe_nearest_cell_1m.sc
import org.apache.spark.sql.functions._

spark.sparkContext.setLogLevel("WARN")
graft.functions.LongArrayDot.register(spark)
graft.functions.NearestCell.register(spark)
def dotq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
  call_function("dotq", a, b)
def cosineQ(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
  dotq(a, b).cast("double") / (sqrt(dotq(a, a).cast("double")) * sqrt(dotq(b, b).cast("double")))

val N = 1000000L
val dim = 64
val cellsN = 1024
// deterministic pseudo-random components in [0.1, 10.2] -- far inside
// the quantize amplitude bound (~190 at dim 64), no zero norms
val vec = transform(sequence(lit(0), lit(dim - 1)),
  j => (((col("id") * 2654435761L + j.cast("long") * 40503L) % 101L) + 1L).cast("double") / 10.0)
val v = spark.range(1, N + 1)
  .select(col("id").as("vec_id"), graft.llm.Similarity.quantize(vec).as("nv"))
  .repartition(32)
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
println(s"PROBE_NC corpus_rows=${v.count}")
val cents = v.filter(col("vec_id") <= cellsN)
  .select(col("vec_id").as("cell_id"), col("nv").as("cv"))
  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
println(s"PROBE_NC cells=${cents.count}")

// NEW: fused per-row codegen argmax against the packed codebook
val packed = cents.agg(sort_array(collect_list(struct(col("cell_id"), col("cv"),
  dotq(col("cv"), col("cv")).as("c2")))).as("cells"))
def newArm() = v.crossJoin(broadcast(packed))
  .select(col("vec_id"), call_function("nearest_cell_cos", col("nv"), col("cells")).as("cell_id"))
  .agg(sum(col("vec_id") * col("cell_id")).as("checksum"), count(lit(1)).as("n"))
  .collect()(0)
for (rep <- 1 to 2) {
  val t0 = System.nanoTime
  val r = newArm()
  println(f"PROBE_NC new_rep=$rep wall_s=${(System.nanoTime - t0) / 1e9}%.1f checksum=${r.getLong(0)} n=${r.getLong(1)}")
}

// OLD: the r12 declarative argmax (SortAggregate over the exploded pairs)
val t0 = System.nanoTime
val old = v.crossJoin(broadcast(cents))
  .withColumn("cell_sim", cosineQ(col("nv"), col("cv")))
  .groupBy(col("vec_id"))
  .agg(max_by(struct(col("cell_id"), col("nv")),
    struct(col("cell_sim"), -col("cell_id"))).as("m"))
  .select(col("vec_id"), col("m.cell_id").as("cell_id"))
  .agg(sum(col("vec_id") * col("cell_id")).as("checksum"), count(lit(1)).as("n"))
  .collect()(0)
println(f"PROBE_NC old_wall_s=${(System.nanoTime - t0) / 1e9}%.1f checksum=${old.getLong(0)} n=${old.getLong(1)}")
System.exit(0)
