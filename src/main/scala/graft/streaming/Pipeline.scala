package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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
}
