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
  /** `events.ts` has shipped in two driver layouts: TIMESTAMP(NANOS)
    * (rounds 1-4), which Spark 4 refuses by default — read as a nanos
    * long (legacy conf) and rebuilt with exact integer arithmetic
    * (`div`, never double division: ns epochs exceed double's
    * exact-integer range, and a 256 ns slip could land a row in the
    * wrong second vs the DuckDB oracle) — and TIMESTAMP(MICROS, NTZ)
    * (round 5+), which Spark reads as TIMESTAMP_NTZ. Normalize both to
    * session-TZ TimestampType (sessions pin UTC, so the NTZ cast is a
    * relabel, not a shift) so every downstream operator and oracle sees
    * identical instants regardless of which layout is on disk. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
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

  /** Cheap identity key for memoized per-dir model fits (a1/a3/s3/s4/
    * a7): dir plus the table's parquet file names, sizes, and mtimes.
    * A long-lived JVM that sees the SAME path regenerated gets a fresh
    * fit instead of silently replaying a stale model (ADVICE r6). */
  def fingerprint(dir: String, name: String): String = {
    val f = new java.io.File(s"$dir/$name.parquet")
    val parts =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName)
          .map(p => s"${p.getName}:${p.length}:${p.lastModified}")
      else Array(s"${f.getName}:${f.length}:${f.lastModified}")
    s"$dir/$name.parquet|${parts.mkString(",")}"
  }
}
