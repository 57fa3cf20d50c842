package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r13): execute a query and dump the FINAL adaptive plan —
  * what AQE actually ran, including ReusedExchange/ReusedQueryStage
  * nodes that neither `explain` before execution nor ShapeProbe's
  * as-planned walk can show. The runtime-reuse forensics tool: whether
  * a duplicated subtree (e.g. an uncached rollup referenced by both
  * sides of a self-join) was deduplicated by AQE stage reuse or truly
  * executed twice.
  * Usage: scripts/run.sh graft.PostExec <sfDir> <query> [query...]
  * Env: SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS /
  * SPARK_GRAFT_MAX_PARTITION_BYTES as in Bench (defaults 4/4/1m).
  */
object PostExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"))
      // full-plan mode: a finishIf() localCheckpoint would otherwise
      // reduce the inspected plan to a bare RDD scan (see Exec)
      .config(Exec.Key, "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val countsOnly = sys.env.contains("GRAFT_POSTEXEC_COUNTS")
    args.drop(1).foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan
      if (countsOnly) {
        // runtime-truth audit line: how many times did this query's
        // FINAL plan touch a file source, and how many duplicate
        // subtrees did AQE deduplicate (the e19 double-scan class is a
        // scan count above the query's table count with 0 reuse)
        val nodes = allNodesPost(plan)
        val scans = nodes.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.rootPaths.mkString(",")
        }
        val reused = nodes.count {
          case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
          case _: org.apache.spark.sql.execution.adaptive.QueryStageExec => false
          case _ => false
        }
        val byPath = scans.groupBy(identity).view.mapValues(_.size).toMap
          .toSeq.sortBy(_._1)
          .map { case (p, n) => s"${p.substring(p.lastIndexOf('/') + 1)}=$n" }
        println(s"POSTEXEC $q scans=${scans.size} reused_exchange=$reused " +
          s"per_table=[${byPath.mkString(" ")}]")
      } else {
        println(s"\n========== $q (final adaptive plan, after execution) ==========")
        println(plan.treeString)
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }

  /** Post-execution node walk: descends into adaptive stages and each
    * cached plan exactly once (same descent as ShapeProbe). */
  private def allNodesPost(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val seen = scala.collection.mutable.Set[Int]()
    def walk(n: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = n match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(qs.plan)
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          val cp = im.relation.cachedPlan
          if (seen.add(System.identityHashCode(cp))) Seq(cp) else Nil
        case other => other.children ++ other.subqueries
      }
      n +: kids.flatMap(walk)
    }
    walk(p)
  }
}
