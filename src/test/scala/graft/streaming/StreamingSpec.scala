package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** SURVEY.md §2.H — st1..st4 driven through MemoryStream (real
  * micro-batch execution, real state store), plus batch twins. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("st1_ingest parses valid telemetry JSON and drops malformed rows") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val q = Ingest.parseTelemetry(in.toDF().withColumnRenamed("value", "value"))
      .writeStream.format("memory").queryName("st1_out")
      .outputMode(OutputMode.Append).start()
    in.addData(
      """{"timestamp":"2024-01-01 00:00:01","plant_type":"solar","region":"north","power_output":120.5,"demand":99.0,"grid_frequency":50.01}""",
      """{"timestamp":"2024-01-01 00:00:02","plant_type":"wind","region":"south","power_output":88.0,"demand":101.5,"grid_frequency":49.98}""",
      """not json at all""",
      """{"timestamp":"2024-01-01 00:00:03","plant_type":"hydro"}""")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("st1_out").orderBy("ts").collect()
    assert(rows.length == 2) // malformed + missing-numerics dropped
    assert(rows(0).getAs[String]("plant_type") == "solar")
    assert(rows(0).getAs[Timestamp]("ts") == ts("2024-01-01 00:00:01"))
    assert(rows(1).getAs[Double]("power_output") == 88.0)
  }

  test("st2_window_agg aggregates tumbling windows and watermark closes them") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String, Double, Double, Double)]
    val parsed = in.toDF()
      .toDF("ts", "plant_type", "power_output", "demand", "grid_frequency")
    val q = WindowAgg.tumblingStats(parsed)
      .writeStream.format("memory").queryName("st2_out")
      .outputMode(OutputMode.Append).start()
    in.addData(
      (ts("2024-01-01 00:00:10"), "solar", 100.0, 90.0, 50.0),
      (ts("2024-01-01 00:00:50"), "solar", 110.0, 91.0, 50.0),
      (ts("2024-01-01 00:01:10"), "solar", 120.0, 92.0, 50.0))
    q.processAllAvailable()
    // advance watermark far enough to close the 00:00 and 00:01 windows
    in.addData((ts("2024-01-01 00:10:00"), "solar", 1.0, 1.0, 50.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("st2_out").orderBy("w_start").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Timestamp]("w_start") == ts("2024-01-01 00:00:00"))
    assert(rows(0).getAs[Long]("n") == 2)
    assert(rows(0).getAs[Double]("avg_power") == 105.0)
    assert(rows(1).getAs[Long]("n") == 1)
    assert(rows(1).getAs[Double]("max_power") == 120.0)
  }

  test("st3_sliding_detector flags a spike after warmup, carries state across batches") {
    implicit val sc = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val in = MemoryStream[Reading]
    val q = SlidingDetector.detect(in.toDS())
      .writeStream.format("memory").queryName("st3_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: warmup — 60 readings in a tight band (no flags possible
    // for the first MinTrain rows; band keeps z small after)
    val warm = (0 until 60).map(i =>
      Reading(ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), "solar",
        100.0 + (i % 7) * 0.5, 90.0, 50.0))
    in.addData(warm: _*)
    q.processAllAvailable()
    // batch 2: one extreme spike among normals — state (window of 60)
    // must have carried over for the spike to be scored against it
    in.addData(
      Reading(ts("2024-01-01 00:02:00"), "solar", 101.0, 90.0, 50.0),
      Reading(ts("2024-01-01 00:02:01"), "solar", 400.0, 90.0, 50.0),
      Reading(ts("2024-01-01 00:02:02"), "solar", 102.0, 90.0, 50.0))
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("st3_out").collect()
    assert(flagged.exists(r => r.getAs[Double]("power_output") == 400.0),
      s"spike not flagged: ${flagged.mkString(";")}")
    val spike = flagged.find(_.getAs[Double]("power_output") == 400.0).get
    assert(math.abs(spike.getAs[Double]("zscore")) > SlidingDetector.ZThresh)
    assert(spike.getAs[Double]("if_score") > 0.6) // far outside the band
    assert(!flagged.exists(r => r.getAs[Double]("power_output") <= 102.0),
      "normal readings must not be flagged")
  }

  test("st3 multivariate: joint two-feature anomaly flagged while z-score stays quiet") {
    implicit val sc = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val in = MemoryStream[Reading]
    val q = SlidingDetector.detect(in.toDS())
      .writeStream.format("memory").queryName("st3_mv_out")
      .outputMode(OutputMode.Append).start()
    // warmup: wind readings where turbine_efficiency tracks wind_speed
    // (eff = 60 + ws ± 1) — the joint structure the forest learns
    def wind(sec: Int, ws: Double, eff: Double, power: Double = 100.0) =
      Reading(ts(f"2024-01-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d"),
        "wind", power, 90.0, 50.0,
        wind_speed = Some(ws), turbine_efficiency = Some(eff))
    val warm = (0 until 200).map { i =>
      val ws = 5.0 + (i % 41) * 0.5            // 5..25 m/s
      val eff = 60.0 + ws + (i % 3 - 1) * 1.0  // 64..86, correlated
      wind(i, ws, eff, 100.0 + (i % 7) * 0.5)
    }
    in.addData(warm: _*)
    q.processAllAvailable()
    // planted JOINT anomaly: ws=24 (in range), eff=66 (in range — the
    // band's floor is ~64), but eff at ws=24 should be ~84: each
    // marginal is unremarkable, the combination is impossible. A
    // univariate monitor on any single field cannot see this.
    in.addData(
      wind(200, 15.0, 75.0),        // normal, on the diagonal
      wind(201, 24.0, 66.0, 101.0), // joint anomaly, power in band
      wind(202, 18.0, 78.0))        // normal, on the diagonal
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("st3_mv_out").collect()
      .filter(_.getAs[Timestamp]("ts").toString >= "2024-01-01 00:03:20")
    val joint = flagged.find(_.getAs[Timestamp]("ts") == ts("2024-01-01 00:03:21"))
    assert(joint.isDefined,
      s"joint anomaly must be flagged; flagged after warmup: ${flagged.mkString(";")}")
    // and the z channel (power_output) was quiet — only the
    // multivariate forest could have caught it
    assert(math.abs(joint.get.getAs[Double]("zscore")) < SlidingDetector.ZThresh)
    assert(!flagged.exists(_.getAs[Timestamp]("ts") == ts("2024-01-01 00:03:20")))
    assert(!flagged.exists(_.getAs[Timestamp]("ts") == ts("2024-01-01 00:03:22")))
  }

  test("st3 contamination quantile: ~5% flag rate clean, elevated when injected") {
    implicit val sc = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    val in = MemoryStream[Reading]
    val q = SlidingDetector.detect(in.toDS())
      .writeStream.format("memory").queryName("st3_rate_out")
      .outputMode(OutputMode.Append).start()
    // deterministic uniform-ish noise in [0,1)
    def u(i: Int, salt: Int) = ((i * 2654435761L + salt * 40503L) % 1000) / 1000.0
    def r(sec: Int, power: Double) =
      Reading(ts(f"2024-01-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d"),
        "plant", power, 90.0 + u(sec, 7) * 5.0, 50.0)
    // batch 1: 500-row clean window, power uniform in [100, 110)
    in.addData((0 until 500).map(i => r(i, 100.0 + u(i, 1) * 10.0)): _*)
    q.processAllAvailable()
    val warmFlags = spark.table("st3_rate_out").count()
    // batch 2: 400 more CLEAN rows from the same distribution — the
    // contamination quantile should flag ≈5% of them
    in.addData((500 until 900).map(i => r(i, 100.0 + u(i, 1) * 10.0)): _*)
    q.processAllAvailable()
    val cleanFlags = spark.table("st3_rate_out").count() - warmFlags
    val cleanRate = cleanFlags / 400.0
    // batch 3: 400 rows with 10% injected 3x spikes
    in.addData((900 until 1300).map(i =>
      if (i % 10 == 0) r(i, 3.0 * (100.0 + u(i, 1) * 10.0))
      else r(i, 100.0 + u(i, 1) * 10.0)): _*)
    q.processAllAvailable()
    q.stop()
    val injFlags = spark.table("st3_rate_out").count() - warmFlags - cleanFlags
    val injRate = injFlags / 400.0
    info(s"clean rate=$cleanRate injected rate=$injRate")
    assert(cleanRate <= 0.12, s"clean flag rate $cleanRate should be ≈5%")
    assert(injRate >= cleanRate + 0.05,
      s"injected rate $injRate must be elevated over clean $cleanRate")
  }

  test("st5_stream_dedup drops replayed records within the watermark") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Timestamp, String, Double)]
    val parsed = in.toDF().toDF("ts", "plant_type", "power_output")
    val q = StreamDedup.byContent(parsed)
      .writeStream.format("memory").queryName("st5_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    val r1 = (ts("2024-01-01 00:00:01"), "solar", 100.0)
    val r2 = (ts("2024-01-01 00:00:02"), "wind", 90.0)
    in.addData(r1, r2, r1) // duplicate within one batch
    q.processAllAvailable()
    in.addData(r2) // replay in a later batch, still inside watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("st5_out").collect()
    assert(rows.length == 2, s"expected 2 distinct records, got ${rows.length}")
    assert(rows.map(_.getAs[String]("plant_type")).toSet == Set("solar", "wind"))
  }

  test("st6_stream_join joins readings to alerts within the interval bound") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val readings = MemoryStream[(Timestamp, String, Double)]
    val alerts = MemoryStream[(Timestamp, String, String)]
    val l = readings.toDF().toDF("ts", "plant_type", "power_output")
    val r = alerts.toDF().toDF("a_ts", "plant_type", "alert")
    val q = StreamJoin.withinInterval(l, r, "plant_type", "ts", "a_ts", 60L)
      .writeStream.format("memory").queryName("st6_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    readings.addData(
      (ts("2024-01-01 00:10:00"), "solar", 100.0),
      (ts("2024-01-01 00:20:00"), "wind", 90.0))
    alerts.addData(
      (ts("2024-01-01 00:10:30"), "solar", "overload"),   // within 60s
      (ts("2024-01-01 00:15:00"), "solar", "late"),       // outside bound
      (ts("2024-01-01 00:19:30"), "hydro", "other_key"))  // key mismatch
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("st6_out").collect()
    assert(rows.length == 1, s"expected exactly the bounded match: ${rows.mkString(";")}")
    assert(rows.head.getAs[String]("alert") == "overload")
    assert(rows.head.getAs[Double]("power_output") == 100.0)
  }

  test("st6_stream_join supports the same event-time column name on both sides") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val readings = MemoryStream[(Timestamp, String, Double)]
    val alerts = MemoryStream[(Timestamp, String, String)]
    // both sides name their event time "ts" — the common case (ADVICE r1)
    val l = readings.toDF().toDF("ts", "plant_type", "power_output")
    val r = alerts.toDF().toDF("ts", "plant_type", "alert")
    val q = StreamJoin.withinInterval(l, r, "plant_type", "ts", "ts", 60L)
      .writeStream.format("memory").queryName("st6_same_ts_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    readings.addData((ts("2024-01-01 00:10:00"), "solar", 100.0))
    alerts.addData(
      (ts("2024-01-01 00:10:30"), "solar", "overload"), // within 60s
      (ts("2024-01-01 00:15:00"), "solar", "late"))     // outside bound
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("st6_same_ts_out").collect()
    assert(rows.length == 1, s"expected the bounded match: ${rows.mkString(";")}")
    assert(rows.head.getAs[String]("alert") == "overload")
  }

  test("st7_outlier_table caps per-key tables at the last N by event time") {
    implicit val sc = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val in = MemoryStream[Flagged]
    val q = OutlierTable.table(in.toDS(), cap = 5)
      .writeStream.format("memory").queryName("st7_out")
      .outputMode(OutputMode.Update).start()
    def f(sec: Int, p: String = "solar") =
      Flagged(ts(f"2024-01-01 00:00:$sec%02d"), p, 100.0 + sec, 3.5, 0.7)
    in.addData(f(1), f(2), f(3), f(10, "wind"))
    q.processAllAvailable()
    val batch1 = spark.table("st7_out").collect()
    // snapshot per key: 3 solar + 1 wind
    assert(batch1.count(_.getAs[String]("plant_type") == "solar") == 3)
    assert(batch1.count(_.getAs[String]("plant_type") == "wind") == 1)
    in.addData(f(4), f(5), f(6), f(7))
    q.processAllAvailable()
    q.stop()
    // latest solar snapshot: capped at 5, the most recent by ts (3..7)
    val all = spark.table("st7_out").collect()
      .filter(_.getAs[String]("plant_type") == "solar")
    val latest = all.drop(3) // rows appended by batch 2's snapshot
    assert(latest.length == 5, s"table must cap at 5: got ${latest.length}")
    val secs = latest.map(_.getAs[Timestamp]("ts").toString.takeRight(4)).sorted
    assert(secs.sameElements(Array("03.0", "04.0", "05.0", "06.0", "07.0")),
      s"want seconds 3..7, got ${secs.mkString(",")}")
  }

  test("st8_drift_detector alarms on cross-batch drift, silent when stationary") {
    implicit val sc = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val in = MemoryStream[Reading]
    val q = DriftDetector.detect(in.toDS())
      .writeStream.format("memory").queryName("st8_out")
      .outputMode(OutputMode.Append).start()
    def r(key: String, sec: Int, v: Double) =
      Reading(ts(f"2024-01-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d"),
        key, v, 0.0, 50.0)
    // batch 1: 60 baseline readings per key, alternating +-1 around 100
    val base = (0 until 60).flatMap(i => Seq(
      r("drifty", i, if (i % 2 == 0) 101.0 else 99.0),
      r("steady", i, if (i % 2 == 0) 101.0 else 99.0)))
    in.addData(base: _*)
    q.processAllAvailable()
    assert(spark.table("st8_out").count() == 0, "no alarms during baseline")
    // batch 2: drifty ramps +0.5/reading (sustained shift); steady stays
    val next = (60 until 120).flatMap(i => Seq(
      r("drifty", i, 100.0 + (i - 60) * 0.5),
      r("steady", i, if (i % 2 == 0) 101.0 else 99.0)))
    in.addData(next: _*)
    q.processAllAvailable()
    q.stop()
    val alarms = spark.table("st8_out").collect()
    assert(alarms.nonEmpty, "drift must alarm (state carried across batches)")
    assert(alarms.forall(_.getAs[String]("plant_type") == "drifty"),
      s"steady key must stay silent: ${alarms.mkString(";")}")
    assert(alarms.forall(_.getAs[String]("side") == "up"))
  }

  test("st4_generator is deterministic, 10% anomalies, non-negative, seasonal") {
    val n = 8L * 3600 * 24 // one synthetic day at 8 Hz
    val t = Generator.telemetry(spark.range(n).toDF("value")).cache()
    val frac = t.filter(col("is_anomaly")).count().toDouble / n
    assert(math.abs(frac - 0.10) < 0.01, s"anomaly fraction $frac")
    assert(t.filter(col("power_output") < 0 || col("demand") < 0).count() == 0)
    // determinism: same value → same record
    val a = t.filter(col("seq") === 12345L).collect().head
    val b = Generator.telemetry(spark.range(12345L, 12346L).toDF("value"))
      .collect().head
    assert(a == b)
    // seasonality: demand at the daily peak hour exceeds the trough hour
    val byHour = t.groupBy(hour(col("ts")).as("h"))
      .agg(avg("demand").as("d")).collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(byHour.values.max > byHour.values.min * 1.2)
    t.unpersist()
  }
}
