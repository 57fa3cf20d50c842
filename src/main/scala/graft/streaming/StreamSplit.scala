package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** st22_stream_split — streaming train/val/test admission router:
  * every arriving doc gets its split AT INGEST from the SAME
  * portable-hash assignment as batch i2 (Sampling.splitCols — one
  * definition, so stream == batch is structural), and the stream can
  * fan out by split column to per-split sinks (SURVEY.md §2.H; batch
  * twin i2). Assignment-at-admission is what makes the split
  * CONSISTENT under replays and reprocessing: the hash of a stable id
  * gives the same answer on any engine, any day — a rand()-routed
  * stream cannot be replayed into the same partition twice.
  *
  * Scale: stateless narrow map (one md5 per row), no watermark, no
  * state; per-split sinks are `.filter($"split" === ...)` branches of
  * one parsed stream, each with its own checkpoint.
  */
object StreamSplit {

  /** Route a streaming (doc_id, ...) frame: emits the input plus
    * (bucket, split) columns. */
  def route(docs: DataFrame): DataFrame = {
    val (b, split) = Sampling.splitCols(col("doc_id"))
    docs.withColumn("bucket", b).withColumn("split", split)
  }
}
