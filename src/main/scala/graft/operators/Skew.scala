package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers (SURVEY.md §5): AQE's skew-join split covers
  * sort-merge joins at runtime, but hot-key *aggregations* and
  * broadcast-incompatible hot-key joins need salting in the plan.
  */
object Skew {

  /** Two-phase salted aggregation: sums/counts for `aggs` are computed
    * per (key, salt) in phase 1 — spreading one hot key over `buckets`
    * reducers — then re-aggregated per key. Correct for any algebraic
    * aggregate expressed as (partial, merge) pairs; callers pass the
    * partial exprs and the matching merge exprs over the phase-1 names.
    *
    * {{{
    * Skew.saltedAgg(df, Seq(col("k")), 32,
    *   Seq(sum("v").as("s"), count(lit(1)).as("n")),
    *   Seq(sum("s").as("s"), sum("n").as("n")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted.groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys: _*).agg(merges.head, merges.tail: _*)
  }

  /** Salted inner equi-join for a skewed left side against a small-ish
    * right side that is still too big to broadcast whole: the right side
    * is replicated `buckets` times (explode), the left side gets a
    * deterministic salt, and the join key becomes (key, salt) — one hot
    * key fans out over `buckets` tasks instead of one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
