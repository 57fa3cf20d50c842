package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2.C a1/a2 — distributed anomaly ops with statistical
  * self-oracles (flagged rows must live in the per-key tails). */
class AnomalyMLSpec extends SparkSpec {

  test("a1_isoforest flags only per-type tail values") {
    val flagged = AnomalyML.a1Isoforest(spark, sf).collect()
    assert(flagged.nonEmpty)
    // per-type 5/95 percentile fences from the raw table
    val fences = graft.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.10)").as("lo"),
        expr("percentile(value, 0.90)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    flagged.foreach { r =>
      val (lo, hi) = fences(r.getString(1))
      val v = r.getDouble(2)
      assert(v < lo || v > hi,
        s"flagged $v for ${r.getString(1)} is inside [$lo,$hi]")
    }
  }

  test("a1 is deterministic across runs") {
    val x = AnomalyML.a1Isoforest(spark, sf).collect().toSeq
    val y = AnomalyML.a1Isoforest(spark, sf).collect().toSeq
    assert(x == y)
  }

  test("a2_ewma matches a driver-side recomputation for one user") {
    val rows = AnomalyML.a2Ewma(spark, sf)
      .filter(col("user_id") === 3).orderBy("event_id").collect()
    assert(rows.nonEmpty)
    val raw = graft.Tables.events(spark, sf)
      .filter(col("user_id") === 3)
      .select(col("event_id"), col("value"), col("ts").cast("long").as("secs"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._3, t._1))
    // same discipline as AnomalyML.a2: resid against the pre-update
    // smoothed value, emit the post-update one
    var ew = raw.head._2
    val expect = raw.map { case (id, v, _) =>
      val resid = v - ew
      ew = 0.3 * v + 0.7 * ew
      (id, math.rint(ew * 1e6) / 1e6, math.rint(resid * 1e6) / 1e6)
    }.sortBy(_._1).toSeq
    val got = rows.map(r => (r.getLong(0), r.getDouble(3), r.getDouble(4))).toSeq
    assert(got == expect)
  }
}
