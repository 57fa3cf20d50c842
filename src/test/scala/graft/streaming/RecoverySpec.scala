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

  test("st8 recovery at 10^4 keys: every key's state survives, alarms exactly once") {
    // the r6 verdict's scale-recovery gap: the 1-key test proves the
    // MECHANISM; this proves the state STORE — 10,000 independent CUSUM
    // baselines (530k pre-crash rows) checkpointed, killed, restarted,
    // then a +3σ shift on EVERY key. Exactly one alarm per key, each
    // with the stat only the recovered baseline can produce.
    implicit val sc = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val nKeys = 10000
    val cp = java.nio.file.Files.createTempDirectory("st8cp10k").toString
    val sink = scala.collection.concurrent.TrieMap[Long, Seq[DriftAlarm]]()
    val in = MemoryStream[Reading]
    def start() = DriftDetector.detect(in.toDS())
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch { (ds: Dataset[DriftAlarm], id: Long) =>
        sink(id) = ds.collect().toSeq; ()
      }
      .start()
    def key(k: Int) = f"plant_$k%05d"
    def r(k: Int, sec: Int, v: Double) =
      Reading(ts(sec), key(k), v, 0.0, 50.0)
    // phase 1: 54 stationary readings per key (baseline 50 + 4 inside
    // the slack band, ENDING on the 99 so S+ sits at 0 pre-crash),
    // all keys interleaved
    val q1 = start()
    in.addData(for (i <- 0 until 54; k <- 0 until nKeys)
      yield r(k, i, if (i % 2 == 0) 101.0 else 99.0))
    q1.processAllAvailable()
    assert(sink.values.flatten.isEmpty, "stationary phase must not alarm")
    val before = sink.keySet.toSet
    q1.stop()
    // phase 2: restart; three +3 readings per key — alarms ONLY if all
    // 10^4 baselines were recovered (a fresh store is still baselining)
    val q2 = start()
    in.addData(for (i <- 54 until 57; k <- 0 until nKeys)
      yield r(k, i, 103.0))
    q2.processAllAvailable()
    q2.stop()
    val alarms = sink.values.flatten.toSeq
    assert(alarms.length == nKeys,
      s"exactly one alarm per key: got ${alarms.length}")
    assert(alarms.map(_.plant_type).distinct.length == nKeys)
    assert(alarms.forall(a => a.side == "up" && a.stat == 7.5),
      "every alarm must carry the recovered-baseline statistic")
    before.foreach(id => assert(sink(id).isEmpty, s"pre-crash batch $id re-ran"))
  }

  test("st24 snapshot recovery at 10^4 keys: merge resumes from the committed version") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val nKeys = 10000
    val dir = java.nio.file.Files.createTempDirectory("st24snap10k").toString
    val cp = java.nio.file.Files.createTempDirectory("st24cp10k").toString
    val in = MemoryStream[(String, Long, Double, Long)]
    def start() = StreamSnapshot.latestPerKey(
        in.toDF().toDF("event_type", "secs", "value", "event_id"), dir)
      .option("checkpointLocation", cp)
      .start()
    def key(k: Int) = f"k$k%05d"
    // phase 1: one row per key, committed, then crash
    val q1 = start()
    in.addData((0 until nKeys).map(k => (key(k), 100L, 1.0, k.toLong)))
    q1.processAllAvailable()
    q1.stop()
    val v1 = StreamSnapshot.latestVersion(spark, dir)
    assert(v1.nonEmpty, "phase-1 snapshot must have committed")
    // phase 2: restart; newer rows for HALF the keys only
    val q2 = start()
    in.addData((0 until nKeys / 2).map(k =>
      (key(k), 200L, 2.0, (nKeys + k).toLong)))
    q2.processAllAvailable()
    q2.stop()
    val snap = StreamSnapshot.current(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // exactly one row per key — updated half AND the untouched half
    // (the latter only exists if the pre-crash version was read back)
    assert(snap.size == nKeys, s"snapshot must hold all keys: ${snap.size}")
    (0 until nKeys / 2).foreach(k =>
      assert(snap(key(k)) == ((200L, 2.0)), s"key $k not upserted"))
    (nKeys / 2 until nKeys).foreach(k =>
      assert(snap(key(k)) == ((100L, 1.0)), s"key $k lost in recovery"))
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
