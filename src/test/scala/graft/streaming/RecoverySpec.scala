package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming crash-recovery: a checkpointed stateful query is killed
  * mid-stream and restarted from its checkpoint. The restarted query
  * must (a) resume the per-key state built BEFORE the crash — the
  * frozen CUSUM baseline, not a fresh one — and (b) deliver outputs
  * exactly once under the idempotent-by-batch-id sink contract
  * (foreachBatch re-runs the same id on replay; keying the sink by id
  * makes redelivery invisible, which is exactly how the st24 snapshot
  * sink and every production foreachBatch sink absorb replays).
  */
class RecoverySpec extends SparkSpec {

  private def ts(sec: Int) = Timestamp.valueOf(
    f"2024-01-01 ${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d")

  test("st8 CUSUM state survives a kill/restart; alarms deliver exactly once") {
    implicit val sc = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val cp = java.nio.file.Files.createTempDirectory("st8cp").toString
    // idempotent sink: batch id -> rows; a replayed id overwrites itself
    val sink = scala.collection.concurrent.TrieMap[Long, Seq[DriftAlarm]]()
    val in = MemoryStream[Reading]
    def start() = DriftDetector.detect(in.toDS())
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (ds: Dataset[DriftAlarm], id: Long) =>
        sink(id) = ds.collect().toSeq; ()
      }
      .start()

    def r(sec: Int, v: Double) = Reading(ts(sec), "drifty", v, 0.0, 50.0)

    // ---- phase 1: build the 50-reading baseline (±1 around 100) plus
    // 10 stationary readings; no alarms expected
    val q1 = start()
    in.addData((0 until 60).map(i => r(i, if (i % 2 == 0) 101.0 else 99.0)))
    q1.processAllAvailable()
    assert(sink.values.flatten.isEmpty, "stationary phase must not alarm")
    val batchesBeforeCrash = sink.keySet.toSet

    // ---- the crash
    q1.stop()

    // ---- phase 2: restart from the checkpoint and feed a sustained
    // +3 shift. THREE readings suffice ONLY against the pre-crash
    // baseline (sd=1: S+ = 2.5, 5.0, 7.5 > h=5): a fresh query would
    // still be accumulating baseline (n=3 < 50) and stay silent — so
    // the alarm itself proves the state recovered.
    val q2 = start()
    in.addData(Seq(r(60, 103.0), r(61, 103.0), r(62, 103.0)))
    q2.processAllAvailable()
    q2.stop()

    val alarms = sink.values.flatten.toSeq
    assert(alarms.length == 1, s"exactly one alarm, got $alarms")
    val a = alarms.head
    assert(a.plant_type == "drifty" && a.side == "up")
    assert(a.ts == ts(62), "alarm fires on the third post-restart reading")
    assert(a.stat == 7.5, s"S+/sd must resume from the recovered state: $a")
    // replay accounting: a restart that lost the checkpoint would begin
    // again at batch 0 and re-read EVERYTHING, landing the alarm in a
    // pre-crash batch id — so the pre-crash ids staying empty and the
    // alarm arriving on a strictly newer id together prove offsets were
    // recovered, not re-read
    batchesBeforeCrash.foreach { id =>
      assert(sink(id).isEmpty, s"pre-crash batch $id re-ran with data")
    }
    assert(sink.filter(_._2.nonEmpty).keys.min > batchesBeforeCrash.max)
  }

  test("st12 session assembly survives a kill/restart across the gap") {
    implicit val sc = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val cp = java.nio.file.Files.createTempDirectory("st12cp").toString
    val sink = scala.collection.concurrent.TrieMap[Long, Seq[org.apache.spark.sql.Row]]()
    val in = MemoryStream[(Timestamp, String, Double)]
    def start() = SessionWindow.sessions(
        in.toDF().toDF("ts", "plant_type", "power_output"),
        tsCol = "ts", keyCols = Seq("plant_type"),
        aggs = Seq(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events")),
        gap = "30 minutes", watermark = "10 seconds")
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        sink(id) = df.collect().toSeq; ()
      }
      .start()
    // one session's first half before the crash…
    val q1 = start()
    in.addData((ts(0), "solar", 10.0), (ts(600), "solar", 20.0))
    q1.processAllAvailable()
    q1.stop()
    // …second half + a watermark-advancing straggler after restart: the
    // halves must fuse into ONE session, which requires the recovered
    // session state, not a fresh store
    val q2 = start()
    in.addData((ts(1200), "solar", 30.0))
    in.addData((ts(20000), "solar", 1.0)) // pushes the watermark past the gap
    q2.processAllAvailable()
    q2.stop()
    val sessions = sink.values.flatten.toSeq
      .filter(_.getAs[Long]("n_events") == 3L)
    assert(sessions.length == 1,
      s"the pre/post-crash halves must fuse into one 3-event session: " +
        s"${sink.values.flatten.mkString(";")}")
  }
}
