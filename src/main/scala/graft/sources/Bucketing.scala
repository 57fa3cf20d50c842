package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed tables for co-located fact-fact joins (SURVEY.md §5).
  *
  * Both sides written with the same bucket count on the join key hash-
  * place matching keys in matching buckets, so the join needs NO
  * exchange at read time — at 100 TB that removes the dominant shuffle
  * of every recurring fact-fact join (pay the layout cost once at
  * ingest, not on every query). `sortBy` additionally persists the
  * in-bucket order, letting sort-merge join skip its sort.
  */
object Bucketing {

  /** Write as a bucketed+sorted managed table (requires a catalog —
    * tables land in spark.sql.warehouse.dir). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Same, but as an EXTERNAL bucketed table at an explicit path —
    * keeps ad-hoc sessions (Verify/Bench run from the repo checkout)
    * from dropping a spark-warehouse directory into the working tree.
    *
    * The pre-write `repartition(buckets, key)` matters: sortBy order
    * is per FILE, so a bucket scattered across several task files
    * forces a read-time Sort under every downstream merge join.
    * Repartitioning on the bucket hash first puts each bucket in
    * exactly one writer task → one sorted file per bucket → the scan
    * satisfies the join's ordering requirement outright (at 100 TB,
    * bound file size by raising the bucket count, not by splitting
    * buckets across files). */
  def writeBucketedAt(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
