package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Shingles

/** st15_stream_contam — streaming decontamination: every arriving doc
  * is probed live against a STATIC train-side shingle index, emitting
  * its contaminated-shingle count and ratio (SURVEY.md §2.H; batch
  * twin d6). This is the admission-control form of the leakage audit —
  * screen documents as they arrive instead of auditing the corpus
  * after the fact — and it exercises the one streaming join shape the
  * rest of §2.H doesn't: a STREAM-STATIC join, where Spark rescans the
  * static side per micro-batch and no stream state is needed for the
  * join itself.
  *
  * Scale: the train index is a static (hashed-long) table — far too
  * big to broadcast or hold in operator state at 100 TB, which is
  * exactly why the stream-static equi-join (shuffle-partitioned on the
  * shingle key) is the right shape. Each doc's shingles live in one
  * input row, so the per-doc aggregate completes within its
  * micro-batch (Update mode); per-doc state is one counter row,
  * evictable by watermark if doc ids are unbounded.
  */
object StreamContamination {

  /** Probe a streaming (doc_id, text) frame against a static set of
    * train shingle hashes (one `g` column — build it with
    * `Shingles.index(train, k).select("g").distinct`). Output per doc:
    * n_sh distinct shingles, n_hit contaminated ones, hit_ratio —
    * d6's exact row shape. */
  def probe(docs: DataFrame, trainShingles: DataFrame,
      k: Int = 8): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // the shingling convention comes from the SHARED builder
    // (Shingles.docShingleSet) — the batch twin d6 uses the same one,
    // so the st15 == d6 row-for-row equivalence can't silently break
    val sh = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val out = Shingles.docShingleSet(text, k)
        val n = out.size
        out.iterator.map(g => (id, g, n))
      }
      .toDF("doc_id", "g", "n_sh")
    sh.join(trainShingles.select(col("g"), lit(1).as("hit")), Seq("g"), "left")
      .groupBy("doc_id", "n_sh")
      .agg(count(col("hit")).as("n_hit"))
      .select(col("doc_id"), col("n_sh").cast("long").as("n_sh"),
        col("n_hit"),
        round(col("n_hit") * lit(1.0) / col("n_sh"), 6).as("hit_ratio"))
  }
}
