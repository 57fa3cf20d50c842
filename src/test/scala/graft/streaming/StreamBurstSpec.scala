package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** SURVEY.md §2.H st20 — streaming minute-volume burst alerts
  * (frozen-baseline causal form of the e20 batch statistic). */
class StreamBurstSpec extends SparkSpec {

  private val base = 1700000040L // minute-aligned epoch seconds

  private def tick(min: Int, i: Int, et: String) =
    TypedTick(et, new Timestamp((base + min * 60L) * 1000L + i))

  test("st20 flags a planted post-warm burst minute and keeps steady/flat traffic quiet") {
    implicit val s = spark
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // "steady": 4/5/6 events per minute (variance > 0) through the
    // 30-minute warm-up, a 60-event burst at minute 35, then two
    // trailing minutes so the burst minute completes and is scored.
    // "flat": constant 5/minute — zero variance, sd-guard keeps it
    // quiet even though its minutes complete and score.
    def volume(m: Int): Int = Seq(4, 5, 6)(m % 3)
    val steady = (0 until 40).flatMap { m =>
      val n = if (m == 35) 60 else volume(m)
      (0 until n).map(i => tick(m, i, "steady"))
    }
    val flat = (0 until 40).flatMap(m => (0 until 5).map(i => tick(m, i, "flat")))
    val events = (steady ++ flat).sortBy(_.ts.getTime)
    val in = MemoryStream[TypedTick]
    val q = StreamBurst.detect(in.toDS())
      .writeStream.format("memory").queryName("st20_out")
      .outputMode(OutputMode.Append).start()
    events.grouped(events.length / 5 + 1).foreach { chunk =>
      in.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    val alerts = spark.table("st20_out").as[BurstAlert].collect()
    assert(alerts.length == 1, s"expected one alert, got ${alerts.toSeq}")
    val a = alerts.head
    assert(a.event_type == "steady" && a.m == base + 35 * 60 && a.n == 60L)
    assert(a.z > 3.0)
    // causal twin sanity: the batch e20 statistic over the same frame
    // also flags the burst minute (full-history vs frozen baseline —
    // same alarm, different denominator)
    val batch = graft.operators.EventOps.rateBurst(
        events.toDF()).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(batch.contains(("steady", base + 35 * 60)))
  }

  test("st21 gap monitor alerts on a planted feed hole with exact extent, steady feed quiet") {
    implicit val s = spark
    implicit val sc = spark.sqlContext
    import spark.implicits._
    // "holey": minutes 0-9 and 20-24 (a 10-minute hole); "steady":
    // minutes 0-24 unbroken. Chunked so the hole spans micro-batches.
    val holey = ((0 until 10) ++ (20 until 25)).map(m => tick(m, 0, "holey"))
    val steady = (0 until 25).map(m => tick(m, 0, "steady"))
    val events = (holey ++ steady).sortBy(_.ts.getTime)
    val in = MemoryStream[TypedTick]
    val q = StreamGap.detect(in.toDS())
      .writeStream.format("memory").queryName("st21_out")
      .outputMode(OutputMode.Append).start()
    events.grouped(7).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    q.stop()
    val alerts = spark.table("st21_out").as[GapAlert].collect()
    assert(alerts.length == 1, s"expected one gap alert, got ${alerts.toSeq}")
    val a = alerts.head
    // last event minute 9 → gap starts at minute 10, 10 minutes long,
    // witnessed by the resumption at minute 20
    assert(a.event_type == "holey")
    assert(a.gap_start == base + 10 * 60)
    assert(a.gap_minutes == 10L)
    assert(a.resumed_m == base + 20 * 60)
    // batch twin sanity: the e21 minute rollup over the same frame
    // sees exactly the missing minutes (observed 15 of spanned 25)
    val ev = holey.map(t => ("holey", t.ts)).toDF("event_type", "ts")
    val batch = ev.groupBy($"event_type",
        org.apache.spark.sql.functions.expr(
          "unix_timestamp(date_trunc('minute', ts))").as("m"))
      .count().groupBy("event_type")
      .agg(org.apache.spark.sql.functions.count("*").as("observed"))
      .collect().head.getLong(1)
    assert(batch == 15L)
  }

  test("st20 state stays O(1): warm-up freezes and late events drop") {
    implicit val s = spark
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[TypedTick]
    val q = StreamBurst.detect(in.toDS())
      .writeStream.format("memory").queryName("st20_late")
      .outputMode(OutputMode.Append).start()
    // minutes 0..34 at alternating volume, then a LATE event for
    // minute 3 arriving after minute 34 — must not resurrect or
    // corrupt the closed minute (no emission, no crash)
    val ev = (0 until 35).flatMap { m =>
      (0 until Seq(4, 5, 6)(m % 3)).map(i => tick(m, i, "k"))
    } :+ tick(3, 99, "k")
    in.addData(ev); q.processAllAvailable()
    q.stop()
    assert(spark.table("st20_late").isEmpty) // no burst planted → quiet
  }
}
