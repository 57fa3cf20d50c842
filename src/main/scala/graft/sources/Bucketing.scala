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
}
