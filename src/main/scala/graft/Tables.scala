package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md). Plain `spark.read.parquet` — column pruning and
  * predicate pushdown are left to Catalyst, so callers should select /
  * filter as early as possible and let the optimizer reach the scan.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame     = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = table(s, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default. Read it as a nanos long (legacy conf) and rebuild a proper
    * TimestampType column with exact integer arithmetic (`div`, never
    * double division — ns epochs exceed double's exact-integer range, and
    * a 256 ns rounding slip could land a row in the wrong second vs the
    * DuckDB oracle, which reads nanos natively). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")

  /** Spread a frame across all cores before a compute-bound per-row
    * transform (shingling, hashing, signature computation). Text/vector
    * rows are KB-sized but cost ms of CPU each, so byte-based input
    * splits under-parallelize them — the round-robin repartition is one
    * tiny shuffle that buys full-cluster fan-out. */
  def spread(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)
}
