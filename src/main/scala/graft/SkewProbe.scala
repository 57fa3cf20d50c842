package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-skew measurement (VERDICT r8 item 5) — the evidence that
  * retired graft's hand-rolled Skew.saltedAgg/saltedJoin helpers (the
  * salted formulations are inlined below so the measurement stays
  * reproducible after the deletion).
  *
  * Measured 2026-08-15, 50M rows, one key owning 50%, min-of-3
  * interleaved (numbers in BASELINE_SELF §skew-probe):
  *
  *   - AGGREGATION: plain groupBy 0.59-0.76 s vs salted two-phase
  *     0.79-1.12 s. Hash aggregation pre-aggregates map-side, so the
  *     hot key reaches the exchange as ONE row per map task regardless
  *     of its row share — the salt's second shuffle is pure overhead
  *     for exactly the algebraic aggregate class it supports.
  *   - JOIN: plain SMJ against a 2M-row dim (above the broadcast
  *     threshold): default AQE 12.5-13.7 s — OptimizeSkewedJoin does
  *     NOT fire, because skew detection reads COMPRESSED shuffle bytes
  *     and "hot"+doubles compresses under the 256 MB threshold, so 25M
  *     rows funnel through one reducer (the executed plan reads
  *     `AQEShuffleRead coalesced`, not `skewed`). Static 16-way salt
  *     replication recovers to 9.0-10.7 s — but TUNING AQE
  *     (skewedPartitionThresholdInBytes=32m, advisory 16m, factor 2)
  *     reads 4.7 s, 2x better than salting: the split is per-map-chunk
  *     and replication-free.
  *
  * Adjudication: AQE owns join skew once its threshold accounts for
  * compression (a conf, not a plan rewrite), and partial aggregation
  * owns agg skew outright — so the library ships NO salting machinery,
  * and the 100 TB guidance is "size skewedPartitionThresholdInBytes to
  * compressed-bytes reality" (OPERATIONS.md).
  *
  * Run: `scripts/run.sh graft.SkewProbe [rows]`.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skew-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one key owns 50% of the fact; the rest spread over 100k keys
    def fact = spark.range(rows).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 100000)).as("k"),
      (col("id") % 1000).cast("double").as("v"))
    def dim = spark.range(2000000).select(
      when(col("id") === 0, lit("hot"))
        .otherwise(concat(lit("k"), col("id") % 100000)).as("k"),
      (col("id") % 97).as("w"))

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def aqe(on: Boolean): Unit =
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)

    def aggPlain = fact.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), avg("v").as("a"))
    // the retired Skew.saltedAgg, inline: per-(key, salt) partials,
    // then a per-key merge
    def aggSalted = fact
      .withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(32)))
      .groupBy(col("k"), col("__salt"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .groupBy(col("k")).agg(sum("s").as("s"), sum("n").as("n"))
      .withColumn("a", col("s") / col("n"))
    def joinPlain = fact.join(dim, "k").groupBy(lit(1).as("g"))
      .agg(sum(col("v") * col("w")).as("x"), count(lit(1)).as("n"))
    // the retired Skew.saltedJoin, inline: salt the fact, replicate the
    // dim across every salt, join on (key, salt)
    def joinSalted = {
      val saltedLeft = fact.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(16)))
      val replicatedRight = dim.withColumn("__salt",
        explode(sequence(lit(0L), lit(15L))))
      saltedLeft.join(replicatedRight, Seq("k", "__salt")).drop("__salt")
        .groupBy(lit(1).as("g"))
        .agg(sum(col("v") * col("w")).as("x"), count(lit(1)).as("n"))
    }

    def tunedSkew[T](body: => T): T = {
      // defaults miss this skew: the hot partition's COMPRESSED shuffle
      // bytes sit under the 256 MB skewedPartitionThresholdInBytes
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
      spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      try body finally {
        spark.conf.unset(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      }
    }

    val arms: Seq[(String, () => Double)] = Seq(
      ("agg_plain", () => time(aggPlain)),
      ("agg_salted", () => time(aggSalted)),
      ("join_plain_aqe", () => { aqe(true); time(joinPlain) }),
      ("join_plain_aqe_tuned", () => { aqe(true); tunedSkew(time(joinPlain)) }),
      ("join_plain_noaqe", () => { aqe(false); val t = time(joinPlain); aqe(true); t }),
      ("join_salted_aqe", () => { aqe(true); time(joinSalted) }))

    if (sys.env.contains("GRAFT_SKEW_EXPLAIN")) {
      val df = joinPlain
      df.queryExecution.toRdd.count()
      // the final adaptive plan shows whether OptimizeSkewedJoin split
      // the hot partition (AQEShuffleRead ... skewed)
      println(df.queryExecution.executedPlan.toString.take(6000))
    }

    // interleaved min-of-3 (the bench protocol's contention discipline)
    val mins = scala.collection.mutable.Map[String, Double]()
    for (_ <- 1 to 3; (name, f) <- arms) {
      val t = f()
      mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), t)
    }
    // equality guard: the salted forms must agree with the plain ones
    val pa = aggPlain.orderBy("k").collect()
    val sa = aggSalted.select("k", "s", "n", "a").orderBy("k").collect()
    require(pa.length == sa.length && pa.zip(sa).forall { case (x, y) =>
      x.getString(0) == y.getString(0) && x.getLong(2) == y.getLong(2) },
      "salted agg disagrees with plain")
    val pj = joinPlain.collect()(0)
    val sj = joinSalted.collect()(0)
    require(pj.getLong(2) == sj.getLong(2), "salted join row count disagrees")

    println(s"""{"metric":"skew_probe","rows":$rows,""" +
      mins.toSeq.sortBy(_._1).map { case (k, v) =>
        f""""$k":$v%.2f""" }.mkString(",") + "}")
    spark.stop()
  }
}
