package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * The snapshot is VERSIONED: batch k merges against the greatest
  * committed version STRICTLY BELOW k and writes version k to a fresh
  * directory; readers follow the max committed version — a poor-man's
  * MVCC that makes the read-merge-write cycle safe without a
  * transactional table format (at scale, swap the versioned-parquet
  * merge for MERGE INTO on a lakehouse table; the foreachBatch shape
  * is identical). Batch ids are monotonic and foreachBatch re-runs the
  * SAME id on recovery; because the merge source is pinned to versions
  * < id, a replayed batch whose parquet write committed but whose
  * checkpoint commit didn't re-reads the same pre-batch state and
  * overwrites its own version — idempotent, never "overwrite a path
  * that is also being read from".
  *
  * Scale: the merge cost per trigger is O(snapshot keys + batch), the
  * snapshot is one row per key (KBs for any real key space), and the
  * argmax merge is one map-side-combined aggregate. Listing goes
  * through the Hadoop FileSystem API, so the sink works on HDFS/S3
  * paths, not just the local filesystem.
  */
object StreamSnapshot {

  private def versionOf(name: String): Long = name.stripPrefix("v").toLong

  /** Greatest committed snapshot version in `path` below `maxExclusive`
    * (committed = the version directory contains _SUCCESS). */
  private[streaming] def latestVersion(s: SparkSession, path: String,
      maxExclusive: Long = Long.MaxValue): Option[Long] = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else fs.listStatus(p).iterator
      .filter(st => st.isDirectory && st.getPath.getName.matches("v\\d+"))
      .map(st => (versionOf(st.getPath.getName), st.getPath))
      .filter { case (v, dir) =>
        v < maxExclusive && fs.exists(new Path(dir, "_SUCCESS")) }
      .map(_._1).foldLeft(Option.empty[Long]) {
        case (acc, v) => Some(acc.fold(v)(math.max(_, v))) }
  }

  /** Read the current snapshot (empty-safe). Readers pass no bound;
    * the batch-k merge pins `maxExclusive = k` so a recovery re-run
    * never reads the directory it is about to overwrite. */
  def current(s: SparkSession, path: String,
      maxExclusive: Long = Long.MaxValue): DataFrame =
    latestVersion(s, path, maxExclusive) match {
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
        current(s, path, maxExclusive = id)
          .select("event_type", "secs", "value", "event_id"),
        batch.select("event_type", "secs", "value", "event_id"))
      // same-id re-run after recovery merges the same pre-batch state
      // (versions < id) and overwrites its own version — idempotent
      merged.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$path/v$id")
      ()
    }
}
