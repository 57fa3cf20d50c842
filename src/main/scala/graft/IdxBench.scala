package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment: time the two shingle-index shapes (HOF transform +
  * explode + xxhash64 vs typed flatMap + FNV-1a 64). Usage:
  * scripts/run.sh graft.IdxBench <sfDir> [n]. */
object IdxBench {
  def fnv1a64(s: String): Long = {
    var h = -3750763034362895579L // FNV offset basis
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
    h
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.spread(spark, Tables.documents(spark, sfDir))
    docs.count()
    def time(label: String)(f: => Long): Unit = (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = f
      println(f"[$label $i] ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    time("hof") {
      docs.select(col("doc_id"), split(col("text"), " ").as("w"))
        .withColumn("sh", expr(
          "array_distinct(transform(sequence(0, greatest(size(w) - 5, 0)), i -> concat_ws(' ', slice(w, i + 1, 5))))"))
        .select(col("doc_id"), explode(col("sh")).as("gs"))
        .select(col("doc_id"), xxhash64(col("gs")).as("g"))
        .count()
    }
    time("flatmap") {
      docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (id, text) =>
          val w = text.split(" ")
          val out = new scala.collection.mutable.HashSet[Long]
          if (w.length <= 5) out += fnv1a64(w.mkString(" "))
          else {
            var i = 0
            val sb = new java.lang.StringBuilder(64)
            while (i + 5 <= w.length) {
              sb.setLength(0)
              var j = i
              while (j < i + 5) {
                if (j > i) sb.append(' ')
                sb.append(w(j)); j += 1
              }
              out += fnv1a64(sb.toString); i += 1
            }
          }
          out.iterator.map(g => (id, g))
        }.toDF("doc_id", "g")
        .count()
    }
    spark.stop()
  }
}
