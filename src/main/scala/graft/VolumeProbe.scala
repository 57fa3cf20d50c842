package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r10): total shuffle bytes written/read + records for one
  * query — the HOST-INDEPENDENT measure of exchange volume (wall time
  * on this box swings 5× with the hypervisor's day; bytes don't).
  * Usage: scripts/run.sh graft.VolumeProbe <sfDir> <query>
  * Env knobs as Bench (SPARK_GRAFT_SHUFFLE_PARTITIONS etc.).
  * Metric accumulation (attempt max-merge, retry flagging, bus drain)
  * lives in [[VolumeListener]], shared with Bench's per-query volume
  * capture since r12.
  */
object VolumeProbe {
  def main(args: Array[String]): Unit = {
    val (sfDir, q) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"))
      .config("spark.io.compression.codec",
        GraftSession.shuffleCodecFor(sfDir))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vol = new VolumeListener
    spark.sparkContext.addSparkListener(vol)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(q)(spark, sfDir)
    df.queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    val t = vol.snapshotAndReset()
    println(f"""{"metric":"volume","q":"$q","sf":"$sfDir","wall_sec":$dt%.1f,"shuffle_write_mb":${t.writeBytes / 1048576},"shuffle_write_records":${t.writeRecords},"shuffle_read_mb":${t.readBytes / 1048576},"disk_spill_mb":${t.spillBytes / 1048576},"peak_exec_mem_mb":${t.peakMemBytes / 1048576},"stage_retries":${t.stageRetries}}""")
    spark.stop()
  }
}
