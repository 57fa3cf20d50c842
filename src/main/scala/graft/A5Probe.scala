package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev A/B behind the r14 a5_mahalanobis work (VERDICT r13 item 1 —
  * the one standing 2x gate breach, raw 2.08 / adjS 1.94 in
  * BENCH_r13). a5 is two passes over the events fact (moment
  * aggregate, then score+filter against the broadcast stats), and
  * each pass pays two per-row costs on top of the scan: the
  * props -> y extraction and (pass 1 only) the exact-decimal moment
  * casts. This probe attributes the wall cost to those components and
  * gates any candidate variant on bit-exactness of the full output.
  *
  * Measured (min-of-6, sf0.1, idle box, 2026-08-18): cur 1.841 s vs
  * sub 0.705 s (0.38x); extraction-only scan 0.496 vs 0.131 s; the
  * decimal-over-double aggregate delta is 0.278 s — left alone, the
  * decimal sums are the oracle's exactness anchor and the remaining
  * reading is already far under the gate. Exactness gate: 0 mismatches
  * on the full collected output. The sub form SHIPPED in r14; `cur`
  * below pins the pre-r14 get_json_object form so the A/B stays
  * reproducible.
  *
  * Arms:
  *  - cur:     the pre-r14 form (get_json_object extraction)
  *  - sub:     the shipped form (codegen substring arithmetic on the
  *             generator's fixed `{"k": %d}` shape)
  *  - scanJ:   pass-1 input frame only, get_json_object extraction
  *  - scanS:   pass-1 input frame only, substring extraction
  *  - aggC:    the decimal moment aggregate only (json extraction)
  *  - aggD:    ATTRIBUTION ONLY — same aggregate with double sums
  *             (not exactness-eligible; isolates the decimal cost)
  *
  * Usage: scripts/run.sh graft.A5Probe [sfDir] [passes]
  */
object A5Probe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def dec18(c: Column) = sum(c.cast(DecimalType(18, 6))).cast("double")
    def dec28(c: Column) = sum(c.cast(DecimalType(28, 10))).cast("double")

    def evJson(): DataFrame = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value").as("x"),
        get_json_object(col("props"), "$.k").cast("int").cast("double").as("y"))
      .filter(col("y").isNotNull)

    // candidate extraction: props is format_string("{\"k\": %d}", k)
    // by generator contract, so the digits are exactly
    // substr(7 .. len-1); cast("") -> null keeps the null contract
    def evSub(): DataFrame = Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value").as("x"),
        expr("substring(props, 7, length(props) - 7)")
          .cast("int").cast("double").as("y"))
      .filter(col("y").isNotNull)

    def stOf(ev: DataFrame): DataFrame = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        dec18(col("x")).as("sx"), dec18(col("y")).as("sy"),
        dec28(col("x") * col("x")).as("sxx"),
        dec28(col("y") * col("y")).as("syy"),
        dec28(col("x") * col("y")).as("sxy"))

    def stDbl(ev: DataFrame): DataFrame = ev.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))

    def full(ev: () => DataFrame, st0: DataFrame => DataFrame): DataFrame = {
      val e = ev()
      val st = st0(e)
        .withColumn("mx", col("sx") / col("n"))
        .withColumn("my", col("sy") / col("n"))
        .withColumn("cxx", (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1)))
        .withColumn("cyy", (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - lit(1)))
        .withColumn("cxy", (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - lit(1)))
        .withColumn("det", col("cxx") * col("cyy") - col("cxy") * col("cxy"))
      val dx = col("x") - col("mx")
      val dy = col("y") - col("my")
      val d2 = (dx * dx * col("cyy") - lit(2.0) * dx * dy * col("cxy")
        + dy * dy * col("cxx")) / col("det")
      ev().join(broadcast(st), "event_type")
        .withColumn("d2", d2)
        .filter(col("d2") > 9)
        .select(col("event_id"), col("event_type"), col("x"), col("y"),
          round(col("d2"), 6).as("d2"))
        .orderBy("event_id")
    }

    // bit-exactness gate: the substring arm must reproduce the json
    // form's output row-for-row before any timing of it means anything
    def cur(): DataFrame = full(() => evJson(), stOf)
    def sub(): DataFrame = operators.AnomalyML.a5Mahalanobis(spark, sfDir)
    val a = cur().collect()
    val b = sub().collect()
    require(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
    val bad = a.zip(b).filterNot { case (x, y) => x == y }
    println(s"exactness: ${a.length} rows, ${bad.length} mismatches")
    bad.take(5).foreach { case (x, y) => println(s"  cur=$x sub=$y") }
    require(bad.isEmpty, "substring extraction is NOT bit-identical — ineligible")

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cur" -> (() => cur()),
      "sub" -> (() => sub()),
      "scanJ" -> (() => evJson()),
      "scanS" -> (() => evSub()),
      "aggC" -> (() => stOf(evJson())),
      "aggD" -> (() => stDbl(evJson())))
    val mins = collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (p <- 1 to passes; (n, f) <- arms) {
      val t0 = System.nanoTime()
      f().queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      mins(n) = math.min(mins(n), dt)
      println(f"[$p] $n%-6s $dt%.3f s")
    }
    println(arms.map { case (n, _) => f"$n=${mins(n)}%.3f" }.mkString("min: ", " ", ""))
    println(f"full sub/cur = ${mins("sub") / mins("cur")}%.2f  " +
      f"scan sub/json = ${mins("scanS") / mins("scanJ")}%.2f  " +
      f"decimal-over-double agg = ${mins("aggC") - mins("aggD")}%.3f s")
    spark.stop()
  }
}
