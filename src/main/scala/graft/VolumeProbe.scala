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
      .config("spark.io.compression.codec",
        GraftSession.shuffleCodecFor(sfDir))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-stage metrics keyed by stageId, LAST attempt wins (r11,
    // ADVICE r10): a stage retry fires onStageCompleted once per
    // attempt, and summing attempts double-counts shuffle volume —
    // exactly the "host-independent" number this probe exists to keep
    // honest. Retries are also COUNTED and printed so a nonzero
    // retry run is visibly suspect.
    final case class M(attempt: Int, wB: Long, wR: Long, rB: Long, sp: Long,
      pk: Long)
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, M]()
    val retries = new LongAdder
    val stagesDone = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = M(i.attemptNumber(),
          i.taskMetrics.shuffleWriteMetrics.bytesWritten,
          i.taskMetrics.shuffleWriteMetrics.recordsWritten,
          i.taskMetrics.shuffleReadMetrics.totalBytesRead,
          i.taskMetrics.diskBytesSpilled,
          i.taskMetrics.peakExecutionMemory)
        byStage.merge(i.stageId, m, (old, nw) => {
          retries.increment()
          if (nw.attempt >= old.attempt) nw else old
        })
        stagesDone.increment()
      }
    })
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(q)(spark, sfDir)
    df.queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    // listener bus drains asynchronously (waitUntilEmpty is
    // private[spark]) — poll until the stage-completion count stops
    // moving instead of a fixed sleep that undercounts on a loaded host
    var last = -1L
    var stable = 0
    while (stable < 3) { // three consecutive quiet 200 ms beats
      Thread.sleep(200)
      val now = stagesDone.sum
      if (now == last) stable += 1 else { stable = 0; last = now }
    }
    import scala.jdk.CollectionConverters._
    val ms = byStage.values.asScala.toSeq
    val (wB, wR, rB, sp) =
      (ms.map(_.wB).sum, ms.map(_.wR).sum, ms.map(_.rB).sum, ms.map(_.sp).sum)
    // peak execution memory: stage-level sum over tasks, MAX across
    // stages — the operator-requested memory high-water mark (the r10
    // sf100 OOM forensics' missing per-query number); plan-determined,
    // so comparable across host days like the byte counts
    val pk = if (ms.isEmpty) 0L else ms.map(_.pk).max
    println(f"""{"metric":"volume","q":"$q","sf":"$sfDir","wall_sec":$dt%.1f,"shuffle_write_mb":${wB / 1048576},"shuffle_write_records":$wR,"shuffle_read_mb":${rB / 1048576},"disk_spill_mb":${sp / 1048576},"peak_exec_mem_mb":${pk / 1048576},"stage_retries":${retries.sum}}""")
    spark.stop()
  }
}
