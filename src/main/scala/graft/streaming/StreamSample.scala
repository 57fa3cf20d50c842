package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** st23_stream_sample — streaming stratified admission sampling: the
  * SAME salted-hash keep test as batch i1 (Sampling.stratified — one
  * definition, structural twin equivalence) applied at ingest, so the
  * stream is downsampled to the target class balance BEFORE it costs
  * state, storage, or downstream compute (SURVEY.md §2.H; batch twin
  * i1). Hash-threshold admission is what makes the sample coherent
  * under replays and across engines: a record's fate is a pure
  * function of its stable id, so at-least-once delivery re-admits
  * exactly the same rows — rand() gates admit a different sample on
  * every retry.
  *
  * Scale: stateless narrow map (one md5 per row), no watermark, no
  * state store; throughput tracks arrival rate.
  */
object StreamSample {

  /** Admit a streaming (doc_id, lang, ...) frame at i1's dials: 50% of
    * English, 10% of everything else. */
  def admit(docs: DataFrame): DataFrame = admitAt(docs,
    col("lang"), col("doc_id"), Map("en" -> 0.5), 0.1, "i1")

  /** Generic gate: any stratum column / fractions / salt. */
  def admitAt(docs: DataFrame, stratumCol: Column, idCol: Column,
      fracs: Map[String, Double], defaultFrac: Double,
      salt: String): DataFrame =
    Sampling.stratified(docs, stratumCol, idCol, fracs, defaultFrac, salt)
}
