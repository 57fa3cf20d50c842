package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name filter (dev loop —
    // the driver always runs the full map)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    // Defined before the manifest write (r12, ADVICE r11): the manifest
    // embeds a caller-supplied path, which needs the same escaping.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Provenance manifest (r11, VERDICT r10 item 6): /tmp/verify01_r10
    // was an sf0.1 dump under an sf0.01 name and cost the judge a wasted
    // oracle sweep — the dump now records what it was generated from,
    // and check.py cross-checks it against the sfdir it's given.
    // Absolute + normalized + JSON-escaped (r12, ADVICE r11): a relative
    // sfDir recorded from a different cwd makes check.py's realpath
    // comparison misfire, and an unescaped quote/backslash writes
    // invalid JSON that check.py fails open on.
    val sfAbs = Paths.get(sfDir).toAbsolutePath.normalize.toString
    Files.writeString(Paths.get(s"$outDir/MANIFEST.json"),
      s"""{"sfdir":${q(sfAbs)},"generated_utc":"${java.time.Instant.now()}"}""")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // literal-embedding oracles (a1/a3) fit their model against THIS
    // sfDir at dump time — a fit failure must not zero the whole round,
    // so they degrade to absent entries (driver records rows-only)
    // NonFatal only (ADVICE r6): an OutOfMemoryError/LinkageError here
    // must abort the dump loudly, not silently degrade the round to
    // rows-only
    val dynamic =
      try SparkEntry.dynamicOracleSql(spark, sfDir)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] dynamic oracle build failed: ${e.getMessage}")
        Map.empty[String, String]
      }
    val json = (SparkEntry.oracleSql ++ dynamic)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
