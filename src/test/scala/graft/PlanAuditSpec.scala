package graft

import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan-shape regression gate (SURVEY.md §5): every SparkEntry query's
  * PHYSICAL plan must be free of unbounded join strategies, and the
  * flagship scan must push filters and prune columns. This enforces
  * mechanically what the survey claims by hand — reintroducing a
  * nested-loop join (e.g. an accidental non-equi condition) fails CI
  * instead of surfacing at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  /** All nodes of the executed plan, descending into AQE wrappers and
    * reused/subquery children. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case other => other.children ++ other.subqueries
    }
    p +: kids.flatMap(allNodes)
  }

  /** BroadcastNestedLoopJoin is pathological when the build side is
    * unbounded (it once broadcast half the embeddings corpus in d5) —
    * but it is exactly right when the build side is a KNOWN-BOUNDED
    * tiny frame. These entries are the intended linear-scan shapes: */
  private val bnljAllowed = Map(
    "q10_having_sub" -> "scalar subquery: single-row broadcast",
    "s1_ann_brute" -> "broadcast(query vectors, ≤k rows) × corpus scan — linear by design",
    "s4_ann_pq" -> "broadcast(query ADC tables, ≤k rows) × code scan — linear by design")

  test("no SparkEntry query plans a CartesianProduct or BroadcastNestedLoopJoin") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      allNodes(plan).collect {
        case _: CartesianProductExec => s"$name: CartesianProduct"
        case _: BroadcastNestedLoopJoinExec if !bnljAllowed.contains(name) =>
          s"$name: BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty,
      s"unbounded join strategies in: ${offenders.mkString(", ")}")
  }

  test("q2's parquet scan pushes filters and prunes columns") {
    val plan = SparkEntry.queries("q2_filter_project")(spark, sf)
      .queryExecution.executedPlan
    val scans = allNodes(plan).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, "q2 must read from a parquet file scan")
    val scan = scans.head
    assert(scan.metadata.get("PushedFilters").exists(f => f != "[]" && f.nonEmpty),
      s"q2 scan must push predicates, got ${scan.metadata.get("PushedFilters")}")
    // projection must prune: the scan schema reads fewer columns than
    // lineitem's 16
    assert(scan.schema.fields.length < 10,
      s"q2 scan must prune columns, reads ${scan.schema.fields.map(_.name).mkString(",")}")
  }

  test("dimension joins broadcast: q3's plan contains broadcast exchanges") {
    val plan = SparkEntry.queries("q3_join_agg")(spark, sf)
      .queryExecution.executedPlan
    val hasBroadcast = allNodes(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec])
    assert(hasBroadcast, "q3's dimension joins must be broadcast, not shuffled")
  }
}
