package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Shingles

/** st16_stream_span_screen — streaming sub-document duplication
  * screen: every arriving doc's non-overlapping k-word blocks are
  * probed live against a STATIC duplicated-block index (built
  * batch-side with `Dedup.dupBlocks`), emitting d10's exact per-doc
  * row shape (n_blocks, n_dup, dup_ratio). The admission-control form
  * of the d10 audit — reject or down-weight boilerplate-heavy docs as
  * they arrive instead of auditing the corpus after the fact
  * (SURVEY.md §2.H; batch twin d10, same stream-static join shape as
  * st15).
  *
  * Scale: the dup-block index is a static hashed-long table — the
  * stream-static equi-join shuffle-partitions on the block key, no
  * broadcast, no stream state for the join; each doc's blocks live in
  * one input row so the per-doc aggregate completes within its
  * micro-batch (Update mode). The block convention comes from the
  * SHARED builder (Shingles.docBlocks) — d10 uses the same one, so
  * the st16 == d10 row-for-row equivalence cannot silently break.
  */
object StreamSpanScreen {

  /** Probe a streaming (doc_id, text) frame against a static set of
    * duplicated block hashes (one `g` column). Output per doc:
    * n_blocks block positions, n_dup duplicated ones, dup_ratio —
    * d10's exact row shape. */
  def probe(docs: DataFrame, dupBlocks: DataFrame,
      k: Int = 10): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val blocks = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val bs = Shingles.docBlocks(text, k)
        bs.iterator.map(g => (id, g, bs.length))
      }
      .toDF("doc_id", "g", "n_blocks")
    blocks
      .join(dupBlocks.select(col("g"), lit(1).as("hit")), Seq("g"), "left")
      .groupBy("doc_id", "n_blocks")
      .agg(count(col("hit")).as("n_dup"))
      .select(col("doc_id"), col("n_blocks").cast("long").as("n_blocks"),
        col("n_dup"),
        round(col("n_dup") * lit(1.0) / col("n_blocks"), 6).as("dup_ratio"))
  }
}
