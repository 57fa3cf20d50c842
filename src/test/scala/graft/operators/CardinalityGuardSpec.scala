package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The chunk-parallel scan twins (e18 driftScanChunked, q13Suite, a4
  * cusumChunked) exist to fix LOW key cardinality — their driver-side
  * stitch grids are |keys|×buckets count cells, bounded only while
  * |keys| is small. A high-cardinality caller must take the per-key
  * window/sequential form instead (which at that cardinality has no
  * parallelism wall to fix, and whose driver footprint is zero).
  * These specs plant a synthetic high-cardinality key column, assert
  * the guard selects the fallback plan, and assert the fallback is
  * bit-identical to the per-key form — plus a forced-chunked control
  * so the plan fingerprints can't go vacuously green. */
class CardinalityGuardSpec extends SparkSpec {

  import spark.implicits._

  private def plan(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  // ---- e18 driftScanChunked -------------------------------------

  /** 500 keys × 12 rows: over the size guard at chunkRows=8, over a
    * 1000-cell grid cap at fineBuckets=13. */
  private lazy val manyKeyEvents = spark.range(6000)
    .select(col("id").as("event_id"),
      concat(lit("k"), pmod(col("id"), lit(500))).as("event_type"),
      (col("id") * 7 % 997).as("secs"),
      ((col("id") * 31 % 211).cast("double") / 10).as("value"))

  test("driftScanChunked falls back to the window form past the grid cap") {
    val guarded = EventOps.driftScanChunked(manyKeyEvents, w = 2,
      fineBuckets = 13, chunkRows = 8, maxGridCells = 1000)
    assert(!plan(guarded).contains("MapPartitions"),
      "guard should have selected the window form")
    // control: without the cap the chunked machinery engages
    val forced = EventOps.driftScanChunked(manyKeyEvents, w = 2,
      fineBuckets = 13, chunkRows = 8, maxGridCells = Long.MaxValue)
    assert(plan(forced).contains("MapPartitions"),
      "control should have selected the chunked form")
    // and both are bit-identical to the per-key window form
    def rows(df: DataFrame) = df
      .select("event_id", "event_type", "sb", "sa", "shift").collect()
      .map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(4))))
      .sortBy(r => (r._2, r._1))
    val window = rows(EventOps.driftScan(manyKeyEvents, 2))
    assert(window.nonEmpty)
    assert(rows(guarded).sameElements(window))
    assert(rows(forced).sameElements(window))
  }

  // ---- q13 suite -------------------------------------------------

  /** 500k rows (over the chunk threshold) in 2000 groups: 2000×4096
    * cells busts the default 4M grid cap → window form. */
  private lazy val manyGroupLi = spark.range(500000)
    .select(col("id").as("l_orderkey"), lit(1).as("l_linenumber"),
      concat(lit("f"), pmod(col("id"), lit(2000))).as("l_returnflag"),
      ((col("id") * 37 % 10007).cast("double") / 100).as("l_extendedprice"))

  test("q13Suite falls back to the window form past the grid cap") {
    val guarded = Analytics.q13Suite(manyGroupLi)
    assert(plan(guarded).contains("ntile"),
      "guard should have selected the window form (ntile window)")
    // control: 3 groups on the same rows → chunked form (no ntile)
    val fewGroups = manyGroupLi.withColumn("l_returnflag",
      concat(lit("f"), pmod(col("l_orderkey"), lit(3))))
    assert(!plan(Analytics.q13Suite(fewGroups)).contains("ntile"),
      "control should have selected the chunked form")
  }

  // ---- a4 cusumChunked -------------------------------------------

  /** 300 keys × 20 rows; chunks=4 → 1200 cells busts a 100-cell cap. */
  private lazy val manyKeyCusum = spark.range(6000)
    .select(col("id").as("event_id"),
      concat(lit("k"), pmod(col("id"), lit(300))).as("key"),
      (col("id") * 13 % 797).as("secs"),
      ((col("id") * 17 % 89).cast("double")
        + when(col("id") % 300 === 7 && col("id") > 3000, 500.0)
          .otherwise(0.0)).as("value"))

  private def alarms(df: DataFrame) = df
    .select("event_id", "key", "side", "stat").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2),
      java.lang.Double.doubleToRawLongBits(r.getDouble(3))))
    .sortBy(r => (r._1, r._3))

  test("cusumChunked falls back to the sequential form past the grid cap") {
    val guarded = AnomalyML.cusumChunked(manyKeyCusum, col("key"),
      col("event_id"), col("secs"), col("value"), slackK = 0.1,
      alarmH = 1.0, chunks = 4, maxGridCells = 100)
    assert(!plan(guarded).contains("chunk"),
      "guard should have selected the sequential per-key form")
    // the chunked path localCheckpoints its result (LogicalRDD hides
    // the plan) — build the control with materialization off so the
    // plan fingerprint is real (Exec.Key exists for exactly this)
    spark.conf.set(graft.Exec.Key, "false")
    val forced =
      try AnomalyML.cusumChunked(manyKeyCusum, col("key"),
        col("event_id"), col("secs"), col("value"), slackK = 0.1,
        alarmH = 1.0, chunks = 4, maxGridCells = Long.MaxValue)
      finally spark.conf.set(graft.Exec.Key, "true")
    assert(plan(forced).contains("chunk"),
      "control should have selected the chunked form")
    val seq = alarms(AnomalyML.cusum(manyKeyCusum, col("key"),
      col("event_id"), col("secs"), col("value"), slackK = 0.1,
      alarmH = 1.0))
    assert(seq.nonEmpty, "planted shift should alarm")
    assert(alarms(guarded).sameElements(seq))
    assert(alarms(forced).sameElements(seq))
  }

  test("cusumChunked on an empty frame returns empty instead of throwing") {
    val out = AnomalyML.cusumChunked(manyKeyCusum.filter(lit(false)),
      col("key"), col("event_id"), col("secs"), col("value"))
    assert(out.collect().isEmpty)
  }
}
