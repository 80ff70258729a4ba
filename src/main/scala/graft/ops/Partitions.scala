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
  * split count from logical-plan size stats over
  * `spark.sql.files.maxPartitionBytes`. Without CBO the stats only
  * ever OVERestimate a filtered subtree's size, which only ever SKIPS
  * the repartition — and only on inputs already big enough to have
  * spread across many splits.
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
    val fileBacked = plan.collectLeaves().exists {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => true
      case _ => false
    }
    if (!fileBacked) return df
    val par = spark.sparkContext.defaultParallelism
    val maxSplitBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    val estSplits = plan.stats.sizeInBytes / math.max(maxSplitBytes, 1L)
    if (estSplits < par) df.repartition(par) else df
  }
}
