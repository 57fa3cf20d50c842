package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end reference loop: generated telemetry (with ground-truth
  * anomaly markers) → Kafka-shaped JSON → schema-enforced parse →
  * sliding-window detector. */
class PipelineSpec extends SparkSpec {

  test("end-to-end: detector flags correlate with injected anomalies") {
    val n = 4000L
    val truth = Generator.telemetry(spark.range(n).toDF("value"))
      .select(col("ts"), col("plant_type"), col("is_anomaly"),
        col("power_output"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getBoolean(2), r.getDouble(3))).toMap
    val flagged = Pipeline.endToEndBatch(spark, n).collect()
    assert(flagged.nonEmpty, "no anomalies flagged")
    // every flagged row must round-trip to a generated record
    assert(flagged.forall(f => truth.contains((f.ts, f.plant_type))))
    val hits = flagged.count(f => truth((f.ts, f.plant_type))._1)
    val precision = hits.toDouble / flagged.length
    // recall over the *strong* anomalies (2.5x spikes stand far outside
    // the seasonal band; 0.3x drops can hide inside it early on)
    val strong = truth.filter { case (_, (anom, p)) => anom && p > 250.0 }
    val strongHit = flagged.count(f =>
      truth((f.ts, f.plant_type))._1 && f.power_output > 250.0)
    info(s"flagged=${flagged.length} precision=$precision " +
      s"strong=${strong.size} strongHit=$strongHit")
    assert(precision >= 0.9, s"precision $precision")
    assert(strong.nonEmpty)
    assert(strongHit.toDouble / strong.size >= 0.85,
      s"strong-spike recall ${strongHit.toDouble / strong.size}")
  }

  test("end-to-end outlier table keeps the most recent flags per entity") {
    val flagged = Pipeline.endToEndBatch(spark, 4000L).collect()
    val table = Pipeline.endToEndTable(spark, 4000L, cap = 10).collect()
    table.groupBy(_.plant_type).foreach { case (k, rows) =>
      val all = flagged.filter(_.plant_type == k)
        .sortBy(r => (r.ts.getTime, r.power_output))
      assert(rows.length == math.min(10, all.length), s"key $k cap")
      assert(rows.map(_.ts).toSet == all.takeRight(rows.length).map(_.ts).toSet,
        s"key $k must keep the most recent flags")
    }
  }

  test("rate-controlled pipeline: bounded triggers drain the backlog to the same flags") {
    implicit val s = spark
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val n = 2000L
    // ground truth: the unbounded batch twin over the same records
    val expect = Pipeline.endToEndBatch(spark, n).collect()
      .map(f => (f.ts, f.plant_type)).sorted.toSeq
    val values = Pipeline.toKafkaValue(Generator.telemetry(
      spark.range(n).toDF("value"))).as[String].collect()
    // AvailableNow: drain the whole backlog, then stop. (The VOLUME
    // dial — maxOffsetsPerTrigger / rowsPerSecond — applies at the
    // SOURCE (fromKafka / rateSource), which MemoryStream is not; this
    // test exercises the writer-side CADENCE dial only.)
    val in = MemoryStream[String]
    in.addData(values.toIndexedSeq)
    val q = Pipeline.startControlled(
      Pipeline.detect(in.toDF()), "rc_avail",
      RateControl(availableNow = true))
    assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
    val gotAvail = spark.table("rc_avail").collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).sorted.toSeq
    assert(gotAvail == expect, "bounded AvailableNow drain must equal the batch twin")
    // ProcessingTime cadence: same answer, batches gated by the timer
    val in2 = MemoryStream[String]
    val q2 = Pipeline.startControlled(
      Pipeline.detect(in2.toDF()), "rc_tick",
      RateControl(triggerIntervalMs = Some(50L)))
    in2.addData(values.toIndexedSeq)
    q2.processAllAvailable()
    q2.stop()
    val gotTick = spark.table("rc_tick").collect()
      .map(r => (r.getTimestamp(0), r.getString(1))).sorted.toSeq
    assert(gotTick == expect)
    // the reference's dial is representable verbatim
    assert(RateControl.Reference.maxOffsetsPerTrigger.contains(500L))
  }

  test("JSON round-trip preserves every field to the parsed schema") {
    implicit val s = spark
    val t = Generator.telemetry(spark.range(100L).toDF("value"))
    val parsed = Ingest.parseTelemetry(Pipeline.toKafkaValue(t))
    assert(parsed.count() == 100L)
    val a = t.select("ts", "plant_type", "region", "power_output", "demand", "grid_frequency")
      .orderBy("ts").collect()
    val b = parsed.select("ts", "plant_type", "region", "power_output", "demand", "grid_frequency")
      .orderBy("ts").collect()
    assert(a.sameElements(b))
  }
}
