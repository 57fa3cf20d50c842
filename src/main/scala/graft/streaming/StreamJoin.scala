package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** st6_stream_join — stream-stream inner join within a time interval
  * (SURVEY.md §2.H): e.g. enrich telemetry readings with command/alert
  * records for the same plant that occurred within the bound.
  *
  * Scale: both sides are watermarked, and the interval condition gives
  * the state store an eviction horizon — each side buffers only rows
  * whose event time can still match a future row of the other side
  * (watermark + bound), so state tracks rate × (watermark + bound),
  * never stream history.
  */
object StreamJoin {

  /** Inner-join `left` and `right` on `key` where
    * `right.ts ∈ [left.ts − boundSeconds, left.ts + boundSeconds]`.
    * The event-time columns may share a name across the two sides (the
    * condition is dataset-qualified); other columns should be disjoint
    * so the joined output is unambiguous to select from. */
  def withinInterval(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, boundSeconds: Long,
      watermark: String = "2 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    // dataset-qualified columns throughout the condition: both streams
    // commonly name their event time identically (e.g. "ts"), and an
    // unqualified col(ts) would fail analysis as ambiguous (ADVICE r1)
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $boundSeconds SECONDS") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $boundSeconds SECONDS"))
      .drop(r(key))
  }
}
