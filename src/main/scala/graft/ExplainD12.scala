package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r13): dump the plan of d12's keeperSelect over literal
  * (clusters, quality) frames — the same injection trick as ExplainD9,
  * so the dump shows exactly the changed function without unrolling
  * d8's iterative CC plan (full-plan mode over the real d12 unrolls
  * every CC round into a 7 MB tree; the cluster input is an opaque
  * materialized RDD in production anyway). Runs with
  * `spark.graft.materialize=false` so the r13 `scored` cache boundary
  * is visible. Source of plans/r13/d12_keeper_select_{before,after}.txt.
  * Usage: scripts/run.sh graft.ExplainD12
  */
object ExplainD12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.graft.materialize", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L))
      .toDF("doc_id", "cluster")
    val quality = Seq((1L, 0.5), (2L, 0.9), (3L, 0.7))
      .toDF("doc_id", "quality")
    println("===== d12 keeperSelect over literal frames =====")
    operators.Dedup.keeperSelect(clusters, quality).explain("formatted")
    spark.stop()
  }
}
