package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec

/** Dev tool: dump the engaged-regime plan for d9's fuzzyJoin. The
  * corpus-derived repartition regime (parts > session shuffle
  * partitions) is unreachable at test SFs, so — like the PlanAuditSpec
  * pin — it is injected via the corpusRows contract: 2^24 corpus rows
  * → parts = 2^24/16384 + 1 = 1025 > 32. Runs with
  * `spark.graft.materialize=false` so the localCheckpoint does not
  * hide the operator plan, and descends into cached subtrees (the
  * corpus shingle index cache) the way PlanAuditSpec does. Used to
  * record plans/r13/d9_fuzzy_join_{before,after}.txt (the probe-side
  * repartition fix, ADVICE r12).
  * Usage: scripts/run.sh graft.ExplainD9
  */
object ExplainD9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.graft.materialize", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val corpus = Seq((100L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val probe = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    println("===== d9 fuzzyJoin, engaged regime (corpusRows = 2^24 -> parts = 1025) =====")
    val plan = operators.Dedup.fuzzyJoin(probe, corpus, corpusRows = 1L << 24)
      .queryExecution.executedPlan
    dump(plan, "top-level plan")
    spark.stop()
  }

  /** Print a plan tree, then recurse into each cached subtree exactly
    * once (same descent as PlanAuditSpec.allNodesThroughCaches). */
  private def dump(p: SparkPlan, label: String,
                   seen: java.util.IdentityHashMap[SparkPlan, Boolean] =
                     new java.util.IdentityHashMap[SparkPlan, Boolean]): Unit = {
    println(s"\n----- $label -----")
    println(p.treeString)
    val caches = (p +: p.collect { case q => q }).collect {
      case s: InMemoryTableScanExec => s.relation.cachedPlan
    }.filter { cp => if (seen.containsKey(cp)) false else { seen.put(cp, true); true } }
    caches.zipWithIndex.foreach { case (cp, i) =>
      dump(cp, s"cached subtree ${i + 1} (under: $label)", seen)
    }
  }
}
