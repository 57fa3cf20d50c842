package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

import graft.ml.GraftIsolationForest

/** One parsed telemetry reading (Ingest.parseTelemetry row, typed). */
case class Reading(ts: java.sql.Timestamp, plant_type: String,
    power_output: Double, demand: Double, grid_frequency: Double)

/** Flagged outlier with both detector scores. */
case class Flagged(ts: java.sql.Timestamp, plant_type: String,
    power_output: Double, zscore: Double, if_score: Double)

/** Bounded per-key sliding-window state: ring buffer of the last
  * `cap` power_output readings (reference: deque maxlen=500). */
case class RingState(buf: Array[Double], pos: Int, count: Long)

/** st3_sliding_detector — per-key sliding-window anomaly detection via
  * `flatMapGroupsWithState` (SURVEY.md §2.H; reference app/app3_ML.py:
  * 143-182: per-plant_type 500-row window, Isolation Forest re-fit per
  * 5 s tick, flagged outliers appended to a capped table).
  *
  * Re-fit granularity = once per key per micro-batch (the Spark-native
  * form of the reference's 5 s refit timer), from the window as it
  * stood at batch start; incoming rows are scored in event-time order
  * and then appended to the ring.
  *
  * Scale: state is O(cap) doubles per key — ~4 KB at cap 500 — and
  * keys are hash-partitioned across executors, so state scales with
  * key cardinality only, never input volume. Scoring is executor-local;
  * the only shuffle is the groupByKey hash exchange.
  */
object SlidingDetector {

  val WindowCap = 500 // reference deque maxlen
  val MinTrain = 30   // don't score until the window has this many rows
  val ZThresh = 3.0
  val IfThresh = 0.62

  private def stats(buf: Array[Double], n: Int): (Double, Double) = {
    var s = 0.0; var i = 0
    while (i < n) { s += buf(i); i += 1 }
    val mean = s / n
    var v = 0.0; i = 0
    while (i < n) { val d = buf(i) - mean; v += d * d; i += 1 }
    (mean, math.sqrt(v / n))
  }

  private[streaming] def detectGroup(key: String, rows: Iterator[Reading],
      state: GroupState[RingState]): Iterator[Flagged] = {
    val st = state.getOption.getOrElse(RingState(new Array[Double](WindowCap), 0, 0L))
    val buf = st.buf.clone()
    var pos = st.pos
    var count = st.count
    val filled = math.min(count, WindowCap.toLong).toInt
    // one refit per key per micro-batch, from the window at batch start
    val forest =
      if (filled >= MinTrain)
        GraftIsolationForest.fit(buf.take(filled).map(Array(_)),
          numTrees = 50, sampleSize = 128, seed = 42L + key.hashCode)
      else null
    val out = Vector.newBuilder[Flagged]
    var n = filled
    rows.toArray.sortBy(r => (r.ts.getTime, r.power_output)).foreach { r =>
      if (n >= MinTrain) {
        val (mean, sd) = stats(buf, n)
        val z = if (sd > 0) (r.power_output - mean) / sd else 0.0
        val ifs = if (forest != null) forest.score(Array(r.power_output)) else 0.5
        if (math.abs(z) > ZThresh || ifs > IfThresh)
          out += Flagged(r.ts, key, r.power_output,
            math.rint(z * 1e6) / 1e6, math.rint(ifs * 1e6) / 1e6)
      }
      buf(pos) = r.power_output
      pos = (pos + 1) % WindowCap
      count += 1
      if (n < WindowCap) n += 1
    }
    state.update(RingState(buf, pos, count))
    out.result().iterator
  }

  /** Wire the detector over a parsed telemetry Dataset (streaming or
    * batch — same code path, which is what the specs exercise).
    *
    * `idleTimeout` (e.g. "1 hour") evicts state for keys that stop
    * sending — with unbounded key cardinality (devices come and go)
    * per-key ring buffers would otherwise accumulate forever in the
    * state store. None keeps state indefinitely (the reference's fixed
    * plant_type universe). */
  def detect(parsed: Dataset[Reading], idleTimeout: Option[String] = None)(
      implicit s: SparkSession): Dataset[Flagged] = {
    import s.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    parsed.groupByKey(_.plant_type)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: String, rows: Iterator[Reading], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val out = detectGroup(key, rows, state)
            idleTimeout.foreach(state.setTimeoutDuration)
            out
          }
      }
  }
}
