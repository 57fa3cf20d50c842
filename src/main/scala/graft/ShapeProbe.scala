package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins._

/** Dev tool (r10): full-plan-mode node-count dump for plan-shape
  * forensics — the PlanAuditSpec golden-net counter as a standalone
  * main, zero counts NOT elided and reused exchanges shown.
  * Usage: scripts/run.sh graft.ShapeProbe <sfDir> <query> [query...]
  * With GRAFT_SHAPE_DUMP_DIR set, also writes each query's full
  * as-planned treeString to <dir>/<query>.txt for exchange-level
  * forensics (the r10 d8-shuffle-drift diff workflow).
  */
object ShapeProbe {
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val seen = scala.collection.mutable.Set[Int]()
    def walk(n: SparkPlan): Seq[SparkPlan] = {
      val kids = n match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case qs: QueryStageExec => Seq(qs.plan)
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          val cp = im.relation.cachedPlan
          if (seen.add(System.identityHashCode(cp))) Seq(cp) else Nil
        case other => other.children ++ other.subqueries
      }
      n +: kids.flatMap(walk)
    }
    walk(p)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .config(Exec.Key, "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      val nodes = allNodes(plan)
      val counts = Map(
        "shuffle" -> nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
        "broadcast" -> nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
        "reused_exchange" -> nodes.count(_.isInstanceOf[ReusedExchangeExec]),
        "sort" -> nodes.count(_.isInstanceOf[SortExec]),
        "bhj" -> nodes.count(_.isInstanceOf[BroadcastHashJoinExec]),
        "smj" -> nodes.count(_.isInstanceOf[SortMergeJoinExec]),
        "shj" -> nodes.count(_.isInstanceOf[ShuffledHashJoinExec]),
        "total_nodes" -> nodes.size)
      println(s"SHAPE $q ${counts.toSeq.sortBy(_._1).mkString(", ")}")
      sys.env.get("GRAFT_SHAPE_DUMP_DIR").foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(dir, s"$q.txt"),
          plan.treeString(verbose = false))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
