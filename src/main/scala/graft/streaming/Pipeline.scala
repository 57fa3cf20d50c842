package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Rate-control surface of the live loop — the reference caps its
  * consumer at maxOffsetsPerTrigger=500 on the Kafka read
  * (app3_ML.py:87); graft generalizes the same two dials:
  *
  *  - CADENCE: the micro-batch trigger — `triggerIntervalMs` plans
  *    Trigger.ProcessingTime (a new batch at most every N ms, the
  *    backpressure release valve when downstream is the bottleneck);
  *    `availableNow` plans Trigger.AvailableNow (drain the backlog in
  *    rate-capped batches, then stop — the backfill mode).
  *  - VOLUME per trigger: `maxOffsetsPerTrigger` flows to the Kafka
  *    source option ([[Ingest.fromKafka]]), `rowsPerSecond` to the
  *    rate source — both bound a single micro-batch's input, which is
  *    what bounds state-update burst size and per-batch shuffle memory
  *    at 100 TB-scale backlogs.
  */
final case class RateControl(
    triggerIntervalMs: Option[Long] = None,
    availableNow: Boolean = false,
    maxOffsetsPerTrigger: Option[Long] = None,
    rowsPerSecond: Option[Long] = None) {
  /** The writer-side trigger this control plans, if any. */
  def trigger: Option[Trigger] =
    if (availableNow) Some(Trigger.AvailableNow())
    else triggerIntervalMs.map(ms => Trigger.ProcessingTime(ms))
}

object RateControl {
  /** The reference consumer's dials (app3_ML.py:87). */
  val Reference: RateControl = RateControl(maxOffsetsPerTrigger = Some(500))
}

/** The reference's full live loop, composed from graft's streaming ops
  * (producer/producer-3.py → Kafka → app/app3_ML.py):
  *
  *   st4 Generator → Kafka-shaped JSON `value` → st1 Ingest (schema
  *   enforcement) → st3 SlidingDetector (per-key 500-row window).
  *
  * Works identically over a streaming rate source or a batch range
  * frame — the spec drives it through MemoryStream and checks flags
  * against the generator's ground-truth anomaly markers.
  */
object Pipeline {

  /** Serialize telemetry to the reference producer's JSON record shape
    * (the exact bytes a Kafka consumer would see in `value`). */
  def toKafkaValue(telemetry: DataFrame): DataFrame =
    telemetry.select(to_json(struct(Seq(
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS").as("timestamp"),
      col("plant_type"), col("region"),
      col("power_output"), col("demand"), col("grid_frequency")) ++
      Ingest.plantSpecificFields.map(col): _*)).as("value"))

  /** value-JSON → parsed → flagged outliers (the consumer side). */
  def detect(raw: DataFrame)(implicit s: SparkSession): Dataset[Flagged] = {
    import s.implicits._
    SlidingDetector.detect(Ingest.parseTelemetry(raw).as[Reading])
  }

  /** Whole loop over a batch `value` range (smoke/bench form): generate
    * n records, round-trip through JSON, detect. */
  def endToEndBatch(s: SparkSession, n: Long): Dataset[Flagged] = {
    implicit val sp = s
    detect(toKafkaValue(Generator.telemetry(s.range(n).toDF("value"))))
  }

  /** The loop through its last stage — st7's per-entity capped outlier
    * table (the reference's dashboard feed): generate → JSON → parse →
    * detect → table. */
  def endToEndTable(s: SparkSession, n: Long,
      cap: Int = OutlierTable.DefaultCap): Dataset[Flagged] = {
    implicit val sp = s
    OutlierTable.table(endToEndBatch(s, n), cap)
  }

  /** The `rate` source under [[RateControl]]'s volume dial — the
    * no-Kafka stand-in for [[Ingest.fromKafka]] with the same
    * control surface (graft.Live uses it). */
  def rateSource(s: SparkSession, rc: RateControl): DataFrame =
    s.readStream.format("rate")
      .option("rowsPerSecond", rc.rowsPerSecond.getOrElse(8L))
      .load()

  /** Start a streaming result into the in-memory sink under `rc`'s
    * trigger — the rate-controlled form of the live loop's
    * writeStream (cadence from the trigger; per-trigger volume from
    * the source options the same RateControl fed to the source). */
  def startControlled[T](out: Dataset[T], queryName: String,
      rc: RateControl = RateControl(),
      mode: OutputMode = OutputMode.Append): StreamingQuery = {
    val w = out.writeStream.format("memory").queryName(queryName)
      .outputMode(mode)
    rc.trigger.fold(w)(w.trigger).start()
  }
}
