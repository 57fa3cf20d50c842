package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** st2_window_agg — watermarked tumbling-window aggregation per
  * plant_type (SURVEY.md §2.H; the streaming form of the reference
  * dashboard's per-entity rollups, app/app3_ML.py:185-214).
  *
  * Scale: windowed hash-agg with map-side partials; state store holds
  * only open windows (watermark evicts closed ones), keyed by
  * (plant_type, window) — bounded by cardinality(plant_type) ×
  * windows-in-watermark, independent of input volume.
  */
object WindowAgg {

  /** Generic watermarked tumbling-window aggregation: any event-time
    * column, key set, and aggregate list. Returns the raw
    * `window` + keys + aggs frame; callers project. This is the exact
    * streaming form of a batch `groupBy(window(ts, w), keys).agg(...)`
    * — the TwinEquivalenceSpec replays a batch table through it and
    * asserts row equality with the DuckDB-oracled batch twin (e2). */
  def tumbling(parsed: DataFrame, tsCol: String, keyCols: Seq[String],
      aggs: Seq[org.apache.spark.sql.Column], watermark: String,
      window_ : String): DataFrame =
    parsed
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_) +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** st10_window_distinct — watermarked tumbling-window APPROX distinct
    * counts (HyperLogLog++, rsd 0.02): "how many distinct devices
    * reported this window" at 100 TB stream rates. Exact streaming
    * countDistinct would hold every key seen per open window in the
    * state store; the HLL sketch caps state at ~KB per (key, window)
    * regardless of arrival cardinality, and merges associatively
    * across micro-batches. TwinEquivalenceSpec bounds the completed
    * stream's estimates against the exact batch counts (≤ 3×rsd). */
  def tumblingDistinct(parsed: DataFrame, tsCol: String, keyCol: String,
      distinctCol: String, watermark: String,
      window_ : String): DataFrame =
    tumbling(parsed, tsCol, Seq(keyCol), Seq(
        approx_count_distinct(col(distinctCol), rsd = 0.02).as("n_uniq_est"),
        count(lit(1)).as("n")),
      watermark, window_)
      .select(col("window.start").as("w_start"), col(keyCol),
        col("n_uniq_est"), col("n"))

  /** 1-minute tumbling stats per plant_type; late data beyond
    * `watermark` is dropped (reference semantics: a batch that arrives
    * after the window closed never re-opens it). */
  def tumblingStats(parsed: DataFrame, watermark: String = "2 minutes",
      window_ : String = "1 minute"): DataFrame =
    tumbling(parsed, "ts", Seq("plant_type"), Seq(
        count(lit(1)).as("n"),
        avg(col("power_output")).as("avg_power"),
        min(col("power_output")).as("min_power"),
        max(col("power_output")).as("max_power"),
        avg(col("demand")).as("avg_demand"),
        avg(col("grid_frequency")).as("avg_freq")),
      watermark, window_)
      .select(col("window.start").as("w_start"), col("plant_type"),
        col("n"), col("avg_power"), col("min_power"), col("max_power"),
        col("avg_demand"), col("avg_freq"))
}
