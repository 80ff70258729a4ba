// Audit: every registered query's physical plan, scanned for
// array-typed columns riding a ShuffleExchange -- the fat-exchange
// class of scale bug (rounds 7-8: thin bands, cross-dedup order).
// AQE off so the collect() sees the real exchange nodes. Some array
// exchanges are LEGITIMATE (an aggregation that builds the array
// after its own exchange ships none; a fingerprint join whose array
// IS the payload being verified exactly once) -- the audit prints
// every site so each can be judged at the plan, not guessed at.
// Run: /opt/spark/bin/spark-shell --master 'local[8]' --conf spark.ui.enabled=false \
//   --conf spark.sql.session.timeZone=UTC --conf spark.sql.shuffle.partitions=8 \
//   --driver-class-path target/scala-2.13/classes -i tools/probes/probe_exchange_audit.sc -e ':quit'
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.types.ArrayType

spark.conf.set("spark.sql.adaptive.enabled", "false")
val dir = "/root/testdata/sf0.001"
var flagged = 0
var cartesians = 0
var bnlJoins = 0
var planned = 0
graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
  try {
    val plan = q(spark, dir).queryExecution.executedPlan
    planned += 1
    plan.collect { case e: ShuffleExchangeExec => e }.foreach { e =>
      val arrays = e.output.filter(_.dataType.isInstanceOf[ArrayType]).map(_.name)
      if (arrays.nonEmpty) {
        flagged += 1
        println(s"AUDIT $name :: ${arrays.mkString(",")} ride ${e.outputPartitioning}")
      }
    }
    // join smells: a CartesianProduct is O(n*m) with both sides
    // materialized; a BroadcastNestedLoopJoin is acceptable ONLY
    // against a deliberately-broadcast tiny side (centroid tables,
    // scalar frames) -- print every site for judgment
    plan.collect { case j: CartesianProductExec => j }.foreach { _ =>
      cartesians += 1
      println(s"AUDIT $name :: CARTESIAN PRODUCT")
    }
    plan.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      bnlJoins += 1
      println(s"AUDIT $name :: BNL join buildSide=${j.buildSide}")
    }
  } catch {
    case ex: Throwable =>
      println(s"AUDIT $name :: PLAN-ERROR ${ex.getClass.getSimpleName}: ${ex.getMessage.take(80)}")
  }
}
println(s"AUDIT planned=$planned arrayExchangeSites=$flagged" +
  s" cartesians=$cartesians bnlJoins=$bnlJoins")
