package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (point-in-interval) join — Spark plans `t BETWEEN lo AND hi`
  * joins as BroadcastNestedLoop/Cartesian unless one side broadcasts,
  * which is O(|L|·|R|) at scale. The bucketed form makes it an
  * equi-join: points land in one time bucket, intervals explode to the
  * buckets they span, the join runs on (key, bucket), and the exact
  * range predicate filters the residue. Join cost becomes
  * Σ per-bucket products — bounded by bucket width, never |L|·|R|.
  */
object RangeJoin {

  /** @param bucketWidth seconds per bucket; pick ~ the typical interval
    *   length so intervals span O(1) buckets. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      t: String, lo: String, hi: String, bucketWidth: Long): DataFrame = {
    val pb = points.withColumn("__b", floor(col(t) / bucketWidth).cast("long"))
    val ib = intervals.withColumn("__b",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    pb.join(ib, Seq(key, "__b"))
      .filter(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__b")
  }

  /** e12_range_join — every event joined to its session interval (the
    * e4 sessionization, 30-min gap) via the bucketed range join;
    * exactly one session matches per event. */
  def e12RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts").cast("long").as("secs"))
    val sessions = EventOps.e4Sessionize(s, dir)
      .select(col("user_id"), col("sid"), col("start_s"), col("end_s"),
        col("n_events"))
    pointInInterval(ev, sessions, key = "user_id", t = "secs",
      lo = "start_s", hi = "end_s", bucketWidth = 3600L)
      .select(col("event_id"), col("user_id"), col("secs"), col("sid"),
        col("n_events"))
      .orderBy("event_id")
  }

  val oracle: Map[String, String] = Map(
    "e12_range_join" ->
      """WITH g AS (SELECT user_id, event_id, value,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secs FROM events),
        |f AS (SELECT *, CASE WHEN LAG(secs) OVER w IS NULL
        |                       OR secs - LAG(secs) OVER w > 1800 THEN 1 ELSE 0 END AS new_s
        |      FROM g WINDOW w AS (PARTITION BY user_id ORDER BY secs, event_id)),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY secs, event_id
        |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |sess AS (SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(*) AS n_events,
        |           MIN(secs) AS start_s, MAX(secs) AS end_s
        |         FROM s GROUP BY user_id, sid)
        |SELECT e.event_id, e.user_id, e.secs, sess.sid, sess.n_events
        |FROM g e JOIN sess ON e.user_id = sess.user_id
        |  AND e.secs BETWEEN sess.start_s AND sess.end_s
        |ORDER BY event_id""".stripMargin
  )
}
