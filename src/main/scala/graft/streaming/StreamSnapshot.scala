package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** st24_stream_snapshot — the foreachBatch UPSERT sink: maintain a
  * "current state per key" table (latest value/time per event_type)
  * that each micro-batch merges into (SURVEY.md §2.H). This is the
  * reference's own sink idiom (app3_ML.py drives its per-entity
  * windows from foreachBatch) and the one §2.H surface the native
  * stateful ops don't exercise: arbitrary batch-side logic against an
  * external table per micro-batch.
  *
  * The snapshot is VERSIONED: batch k reads version k−1, merges, and
  * writes version k to a fresh directory, then readers follow the max
  * version — a poor-man's MVCC that makes the read-merge-write cycle
  * safe without a transactional table format (at scale, swap the
  * versioned-parquet merge for MERGE INTO on a lakehouse table; the
  * foreachBatch shape is identical). Batch ids are monotonic and
  * foreachBatch re-runs the SAME id on recovery, so a replayed batch
  * overwrites its own version — idempotent, not duplicated.
  *
  * Scale: the merge cost per trigger is O(snapshot keys + batch), the
  * snapshot is one row per key (KBs for any real key space), and the
  * argmax merge is one map-side-combined aggregate.
  */
object StreamSnapshot {

  private def versionOf(dir: java.io.File): Long =
    dir.getName.stripPrefix("v").toLong

  /** Latest committed snapshot version in `path`, if any. */
  private[streaming] def latestVersion(path: String): Option[Long] = {
    val fs = new java.io.File(path).listFiles()
    if (fs == null) None
    else fs.filter(f => f.isDirectory && f.getName.startsWith("v") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(versionOf).sorted.lastOption
  }

  /** Read the current snapshot (empty-safe). */
  def current(s: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    latestVersion(path) match {
      case Some(v) => s.read.parquet(s"$path/v$v")
      case None =>
        import s.implicits._
        Seq.empty[(String, Long, Double, Long)]
          .toDF("event_type", "secs", "value", "event_id")
    }

  /** One batch's merge: union the incoming rows with the standing
    * snapshot and keep each key's row with the greatest (secs,
    * event_id) — the deterministic argmax. */
  private[streaming] def mergeBatch(snapshot: DataFrame,
      batch: DataFrame): DataFrame =
    snapshot.unionByName(batch)
      .groupBy("event_type")
      .agg(max(struct(col("secs"), col("event_id"), col("value"))).as("top"))
      .select(col("event_type"), col("top.secs").as("secs"),
        col("top.value").as("value"), col("top.event_id").as("event_id"))

  /** Wire the snapshot sink over a parsed (event_type, secs, value,
    * event_id) stream. Start + awaitTermination/processAllAvailable is
    * the caller's. */
  def latestPerKey(parsed: DataFrame, path: String): DataStreamWriter[org.apache.spark.sql.Row] =
    parsed.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      val s = batch.sparkSession
      val merged = mergeBatch(
        current(s, path).select("event_type", "secs", "value", "event_id"),
        batch.select("event_type", "secs", "value", "event_id"))
      // same-id re-run after recovery overwrites its own version
      merged.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/v$id")
      ()
    }
}
