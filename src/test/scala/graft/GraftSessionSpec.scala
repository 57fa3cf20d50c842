package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SF-aware shuffle-codec choice (r11, VERDICT r10 item 2):
  * zstd is the shipped default from the sf10 input class up (measured
  * −35% exchange bytes on the d2-family shuffles, twice, two scales,
  * two host days — BASELINE_SELF §r10 scale session), lz4 below it
  * (gate scale is codec-CPU-bound and zstd is wall-neutral there), and
  * the cluster-side builder defaults to zstd outright (a cluster IS
  * the at-scale class). A silent flip of any of these is a perf
  * regression at one scale or the other, so the choice is spec-pinned.
  */
class GraftSessionSpec extends AnyFunSuite {

  private def tmpDirWithBytes(n: Long): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft_codec").toFile
    d.deleteOnExit()
    val f = new java.io.File(d, "documents.parquet")
    // sparse file: size metadata without writing n bytes
    val raf = new java.io.RandomAccessFile(f, "rw")
    try raf.setLength(n) finally raf.close()
    f.deleteOnExit()
    d
  }

  test("small input (gate class) keeps lz4") {
    val d = tmpDirWithBytes(50L << 20) // 50 MB ~ sf0.1
    assert(GraftSession.shuffleCodecFor(d.getAbsolutePath) === "lz4")
  }

  test("sf10-class input (>= 2 GB) switches to zstd") {
    val d = tmpDirWithBytes(GraftSession.ZstdCutoverBytes + 1)
    assert(GraftSession.shuffleCodecFor(d.getAbsolutePath) === "zstd")
  }

  test("missing dir degrades to lz4, never throws") {
    assert(GraftSession.shuffleCodecFor("/nonexistent/graft") === "lz4")
  }

  test("cluster builder defaults the shuffle codec to zstd") {
    // the defaults are data (clusterDefaults) precisely so this pin
    // doesn't need a session: spark.io.compression.codec is a STATIC
    // conf, so reading it off a getOrCreate'd session in the shared
    // test JVM would read some earlier suite's session instead
    assert(GraftSession.clusterDefaults("spark.io.compression.codec")
      === "zstd")
    assert(GraftSession.clusterDefaults("spark.sql.adaptive.enabled")
      === "true")
  }
}
