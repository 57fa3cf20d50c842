package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sampling for training-data pipelines (SURVEY.md §2.I).
  *
  * Hash-threshold sampling instead of `rand()`: `xxhash64(id, salt)`
  * maps each row to a stable point in [0, 1e6); keeping rows under
  * frac·1e6 gives binomial-exact proportions that are reproducible
  * across runs, retries, and cluster layouts — `rand()`-based sampling
  * is none of those. Narrow map, no shuffle, no state.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform deterministic sample: keep ~frac of rows, keyed by id. */
  def uniform(df: DataFrame, idCol: Column, frac: Double,
      salt: Long = 0L): DataFrame =
    df.filter(pmod(xxhash64(idCol, lit(salt)), lit(Buckets)) <
      lit((frac * Buckets).toLong))

  /** Stratified deterministic sample: per-stratum keep fractions, with
    * a default for unlisted strata. Proportions hold per stratum (the
    * hash is uniform within each), so class rebalancing is exact in
    * expectation and stable in fact. */
  def stratified(df: DataFrame, stratumCol: Column, idCol: Column,
      fracs: Map[String, Double], defaultFrac: Double = 0.0,
      salt: Long = 0L): DataFrame = {
    val threshold = fracs.foldLeft(lit((defaultFrac * Buckets).toLong)) {
      case (acc, (k, f)) =>
        when(stratumCol === k, lit((f * Buckets).toLong)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(idCol, lit(salt)), lit(Buckets)) < threshold)
  }

  /** i1_stratified_sample — rebalance the documents corpus: keep 50% of
    * English, 10% of everything else (the downsample-the-majority-class
    * shape). [rows-only]: xxhash64 has no DuckDB twin. */
  def i1StratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratified(Tables.documents(s, dir).select("doc_id", "lang", "source"),
      col("lang"), col("doc_id"), Map("en" -> 0.5), defaultFrac = 0.1)
      .orderBy("doc_id")
}
