package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory with graft's scale defaults (SURVEY.md
  * §4/§5). Local test runs get cluster-honest parallelism (split the
  * MB-scale test parquet the way 128 MB splits would on a real cluster);
  * cluster runs keep Spark's defaults where they're already right.
  */
object GraftSession {

  /** Input size above which shuffle compression switches to zstd —
    * ~2 GB of parquet is the sf10 class, where every measured host
    * becomes exchange-byte-limited before it becomes codec-CPU-limited. */
  val ZstdCutoverBytes: Long = 2L << 30

  /** Shuffle/IO codec by input scale (r11, VERDICT r10 item 2). zstd
    * is measured −35% shuffle bytes vs the lz4 default on the d2
    * family — twice, on different host days AND scales (r9: −35%
    * bytes / −17% wall at sf100; r10: 1807→1178 MB at sf10 via
    * graft.VolumeProbe, identical record counts) — and wall-neutral at
    * gate scale (r9 sf0.1 sum-ratio 0.993). So: lz4 for small-data
    * CPU-bound local runs (the sf≤1 class, where shuffle bytes are
    * MBs and codec CPU is the only term), zstd from ~sf10 up — at
    * fleet scale shuffle is the disk/network cost center and 35%
    * fewer exchange bytes is 35% less of it. `SPARK_GRAFT_IO_CODEC`
    * overrides for A/B probes. */
  def shuffleCodecFor(inputDir: String): String =
    sys.env.getOrElse("SPARK_GRAFT_IO_CODEC",
      if (inputBytes(inputDir) >= ZstdCutoverBytes) "zstd" else "lz4")

  /** Total bytes under `dir` — a RECURSIVE file walk, so nested
    * layouts (partitioned parquet dirs) size correctly; the flat
    * testdata layout just makes it cheap. */
  private[graft] def inputBytes(dir: String): Long = {
    val root = new java.io.File(dir)
    def sz(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(sz).sum).getOrElse(0L)
      else f.length()
    if (root.exists()) sz(root) else 0L
  }

  /** Local session: `cores` threads, AQE on, graft SQL functions
    * registered. `dataDir` (when given) sizes the shuffle codec to the
    * data: zstd at the sf10-and-up class, lz4 below (see
    * [[shuffleCodecFor]]). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors,
      appName: String = "graft", dataDir: String = ""): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.io.compression.codec",
        if (dataDir.nonEmpty) shuffleCodecFor(dataDir) else "lz4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The conf defaults [[builder]] applies — exposed as data so the
    * choices are spec-pinnable without spinning up a session. Shuffle
    * codec defaults to zstd here: a cluster deployment IS the ≥sf10
    * class (the measured −35% exchange bytes, OPERATIONS.md "Shuffle
    * codec at scale"); callers on genuinely tiny data can override
    * back to lz4. */
  val clusterDefaults: Map[String, String] = Map(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.io.compression.codec" -> "zstd")

  /** Cluster-side builder: graft extensions + [[clusterDefaults]]; no
    * local-only partition-size overrides. */
  def builder(appName: String = "graft"): SparkSession.Builder =
    clusterDefaults.foldLeft(
      SparkSession.builder()
        .appName(appName)
        .withExtensions(new GraftExtensions())) {
      case (b, (k, v)) => b.config(k, v)
    }
}
