package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r10): total shuffle bytes written/read + records for one
  * query — the HOST-INDEPENDENT measure of exchange volume (wall time
  * on this box swings 5× with the hypervisor's day; bytes don't).
  * Usage: scripts/run.sh graft.VolumeProbe <sfDir> <query>
  * Env knobs as Bench (SPARK_GRAFT_SHUFFLE_PARTITIONS etc.).
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wBytes = new LongAdder; val wRecs = new LongAdder
    val rBytes = new LongAdder; val spillD = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        wBytes.add(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        wRecs.add(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        rBytes.add(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        spillD.add(s.stageInfo.taskMetrics.diskBytesSpilled)
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    // listener bus drains asynchronously — give the queue a beat
    // (listenerBus.waitUntilEmpty is private[spark]; for a one-shot
    // probe a fixed drain sleep is adequate)
    Thread.sleep(2000)
    println(f"""{"metric":"volume","q":"$q","sf":"$sfDir","wall_sec":$dt%.1f,"shuffle_write_mb":${wBytes.sum / 1048576},"shuffle_write_records":${wRecs.sum},"shuffle_read_mb":${rBytes.sum / 1048576},"disk_spill_mb":${spillD.sum / 1048576}}""")
    spark.stop()
  }
}
