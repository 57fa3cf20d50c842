package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B behind the i7 offset-attach decision (r11, VERDICT r10
  * item 5): interleaved same-JVM timing of the SHIPPED broadcast-join
  * form vs a literal nested-CASE attach (sources → rb → off folded
  * into one expression, dropping BroadcastExchange + BHJ from the
  * plan). Measured at sf0.1: join min 0.42 s / case min 0.71 s — the
  * sources×32 when-chain pays Janino codegen compile on every run and
  * would also pay O(sources) comparisons per row at high provenance
  * cardinality, so the join stays. Usage:
  * scripts/run.sh graft.I7Probe [sfDir] [passes]
  */
object I7Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // the REJECTED literal-CASE form, kept here as the measured arm
    def caseForm(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.functions.PortableHash
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"))
        .withColumn("ok", PortableHash.mdhash64(
          concat(col("doc_id").cast("string"), lit(":il"))))
        .withColumn("rb", expr("ok >> 55"))
      val counts = docs.groupBy("source", "rb").count().collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val offsets: Seq[(String, Long, Long)] =
        counts.groupBy(_._1).toSeq.flatMap { case (src, g) =>
          g.sortBy(_._2).scanLeft((src, Long.MinValue, 0L)) {
            case ((_, _, acc), (_, rb, n)) => (src, rb, acc + n)
          }.sliding(2).map {
            case Array((_, _, prev), (s2, rb, _)) => (s2, rb, prev)
          }.toSeq
        }
      val offExpr = offsets.groupBy(_._1).toSeq.sortBy(_._1)
        .foldLeft(lit(0L)) { case (acc, (src, g)) =>
          val rbCase = g.sortBy(_._2).foldLeft(lit(0L)) {
            case (a, (_, rb, off)) =>
              when(col("rb") === rb, lit(off)).otherwise(a)
          }
          when(col("source") === src, rbCase).otherwise(acc)
        }
      val w = Window.partitionBy("source", "rb").orderBy("ok", "doc_id")
      docs.withColumn("off", offExpr)
        .withColumn("pos",
          col("off") + row_number().over(w).cast("long") - lit(1L))
        .select(col("doc_id"), col("source"), col("pos"))
        .orderBy("doc_id")
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "join" -> (() => operators.Sampling.i7Interleave(spark, sfDir)),
      "case" -> (() => caseForm()))
    val samples = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (p <- 1 to passes; (name, fn) <- arms) {
      val t0 = System.nanoTime()
      fn().queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      samples(name) = dt :: samples(name)
      System.err.println(f"[$p] $name $dt%.3f s")
    }
    arms.foreach { case (name, _) =>
      System.err.println(f"$name min ${samples(name).min}%.3f s " +
        f"median ${samples(name).sorted.apply(passes / 2)}%.3f s")
    }
    spark.stop()
  }
}
