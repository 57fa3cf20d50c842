package graft

import org.apache.spark.sql.SparkSession

/** Dev CLI for the scale record (SURVEY §9 / BASELINE_SELF): measures
  * the candidate-pair volume of a blocking-based operator at a given
  * data dir — the quantity the sub-quadratic claims are about, and
  * what the decade sweeps adjudicate when a runtime exponent drifts.
  * Usage: scripts/run.sh graft.ScaleProbe <op> <dir> where op ∈
  * {d2, d7, d16, s6}. Prints one RESULT line.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val (op, dir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.io.compression.codec",
        GraftSession.shuffleCodecFor(dir))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.spread(spark, Tables.documents(spark, dir))
    val t0 = System.nanoTime()
    val n = op match {
      case "d2" => operators.Dedup.containmentCandidateCount(
        docs, k = 5, minCover = 0.5, symmetric = true)
      case "d7" => operators.Dedup.containmentCandidateCount(docs)
      case "d16" => operators.Dedup.editCandidateCount(
        docs.select("doc_id", "text"))
      case "s6" => operators.Similarity.knnCandidateCount(
        Tables.spread(spark, Tables.embeddings(spark, dir))
          .select("vec_id", "embedding"))
      case other => throw new IllegalArgumentException(s"unknown op $other")
    }
    println(s"RESULT op=$op dir=$dir candidates=$n " +
      s"secs=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
