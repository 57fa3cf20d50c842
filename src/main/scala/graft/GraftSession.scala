package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory with graft's scale defaults (SURVEY.md
  * §4/§5). Local test runs get cluster-honest parallelism (split the
  * MB-scale test parquet the way 128 MB splits would on a real cluster);
  * cluster runs keep Spark's defaults where they're already right.
  */
object GraftSession {

  /** Local session: `cores` threads, AQE on, graft SQL functions
    * registered. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Cluster-side builder: graft extensions + AQE/skew handling on; no
    * local-only partition-size overrides. */
  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
}
