package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** st19_stream_quality — streaming quality admission gate: every
  * arriving doc is scored with the SAME shared column arithmetic as
  * the batch t2 operator (TextOps.qualityCols — one definition, so the
  * stream == t2 twin equivalence is structural, the st15/st16
  * discipline) and only docs clearing the quality floor are admitted
  * downstream (SURVEY.md §2.H; batch twin t2). This is the first
  * filter of a streaming ingest pipeline — screen junk BEFORE it costs
  * dedup/contamination state — and the purely STATELESS screen shape
  * §2.H's stateful ops don't exercise: no watermark, no state store,
  * per-row cost only.
  *
  * Scale: a narrow codegen'd map over each micro-batch — throughput
  * tracks arrival rate at any corpus size, zero state to size or
  * evict, and the same columns/threshold semantics whether the corpus
  * is replayed in batch or streamed live.
  */
object StreamQuality {

  /** Score + gate a streaming (doc_id, text, n_chars) frame. Emits the
    * full t2 quality row set for admitted docs; `minQuality` is the
    * admission floor (t2's score is ≈ non-stop-word density ×
    * avg-word-length — junk text scores low on both factors). */
  def screen(docs: DataFrame, minQuality: Double = 3.0): DataFrame =
    TextOps.qualityCols(docs).filter(col("quality") >= minQuality)
}
