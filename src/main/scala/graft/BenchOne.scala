package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: time a single query N times. Usage: BenchOne <sfDir> <name> [n] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"))
      .config("spark.io.compression.codec",
        GraftSession.shuffleCodecFor(sfDir))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      // full-plan execution — see Bench.scala on why count() lies
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[$i] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
