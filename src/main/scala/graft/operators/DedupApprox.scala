package graft.operators

import scala.util.Random
import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** (doc_id, minhash signature) row for typed ops. */
case class DocSig(doc_id: Long, sig: Array[Long])

/** (doc_id, simhash) row. */
case class DocSim(doc_id: Long, sim: Long)

/** Approximate near-dup detection (SURVEY.md §2.D: d3 MinHash+LSH,
  * d4 SimHash) — the 100 TB-scale path: candidate generation via
  * banding/bucketing so join cost tracks collisions, never n².
  * Deterministic (fixed seeds) but hash-algorithm-defined, hence
  * [rows-only]: verified against exact Jaccard in ScalaTest
  * (DedupSpec), not the SQL oracle.
  */
object DedupApprox {

  private val NumPerm = 100
  private val Bands = 20 // × 5 rows/band
  private val RowsPerBand = NumPerm / Bands
  private val P = 2147483647L // 2^31 − 1; a·h fits in a Long
  /** Deterministic permutation parameters (aᵢ·h + bᵢ) mod P. */
  private lazy val perms: Array[(Long, Long)] = {
    val rng = new Random(1234567L)
    Array.fill(NumPerm)((1L + rng.nextInt((P - 1).toInt).toLong, rng.nextInt(P.toInt).toLong))
  }

  private def shingles(text: String, k: Int = 5): Array[String] = {
    val w = text.split(" ")
    if (w.length <= k) Array(w.mkString(" "))
    else Array.tabulate(w.length - k + 1)(i => w.slice(i, i + k).mkString(" ")).distinct
  }

  private[graft] def minhashSig(text: String): Array[Long] = {
    val hs = shingles(text).map(s => (MurmurHash3.stringHash(s, 42) & 0x7fffffffL))
    perms.map { case (a, b) =>
      var mn = Long.MaxValue
      var i = 0
      while (i < hs.length) { val v = (a * hs(i) + b) % P; if (v < mn) mn = v; i += 1 }
      mn
    }
  }

  private[graft] def estJaccard(x: Array[Long], y: Array[Long]): Double = {
    var eq = 0; var i = 0
    while (i < x.length) { if (x(i) == y(i)) eq += 1; i += 1 }
    eq.toDouble / x.length
  }

  /** d3_minhash_lsh — MinHash (100 perms) + banded LSH (20×5): documents
    * sharing any band bucket become candidates; pairs kept when the
    * signature-estimated Jaccard ≥ 0.5. One narrow map for signatures,
    * one shuffle on (band, bucket), one on candidate pairs. */
  def d3MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cache: signatures feed the bucket explode AND both sides of the
    // candidate verification join — without it the (expensive) minhash
    // map runs 3x. ~100 longs/doc, a bounded materialization at any
    // scale (checkpoint to storage instead when corpus >> memory).
    val sigs = Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => DocSig(id, minhashSig(t)) }
      .cache()
    val buckets = sigs.flatMap { d =>
      (0 until Bands).map { b =>
        val bh = MurmurHash3.arrayHash(d.sig.slice(b * RowsPerBand, (b + 1) * RowsPerBand), 7)
        (d.doc_id, b, bh)
      }
    }.toDF("doc_id", "band", "bh")
    val cands = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sa = sigs.toDF("a", "siga")
    val sb = sigs.toDF("b", "sigb")
    val est = udf((x: Seq[Long], y: Seq[Long]) => estJaccard(x.toArray, y.toArray))
    // materialize the (tiny) pair list, then release the signature
    // cache — caches must not outlive the operator call (ADVICE r1)
    val out = cands.join(sa, "a").join(sb, "b")
      .withColumn("est_jac", est(col("siga"), col("sigb")))
      .filter(col("est_jac") >= 0.5)
      .select(col("a"), col("b"), round(col("est_jac"), 6).as("est_jac"))
      .orderBy("a", "b")
      .localCheckpoint(true)
    sigs.unpersist()
    out
  }

  private[graft] def fnv1a64(sd: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < sd.length) { h ^= sd.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  private[graft] def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    text.split(" ").foreach { w =>
      val h = fnv1a64(w)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) >= 0) out |= (1L << b); b += 1 }
    out
  }

  /** d4_simhash — 64-bit SimHash near-dups: band the fingerprint into
    * 4×16-bit chunks (Hamming ≤ 8 ⇒ some chunk is likely equal),
    * bucket-join, verify with popcount(xor) ≤ 8. */
  def d4Simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // cached for the same reason as d3's sigs: the chunk explode joins
    // against itself, which would recompute the simhash map twice
    val sims = Tables.spread(s, Tables.documents(s, dir))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => DocSim(id, simhash64(t)) }
      .toDF("doc_id", "sim")
      .cache()
    val chunks = sims.select(col("doc_id"), col("sim"),
        explode(expr("transform(sequence(0, 3), i -> named_struct('band', i, 'chunk', (sim >> (i * 16)) & 65535))")).as("c"))
      .select(col("doc_id"), col("sim"), col("c.band"), col("c.chunk"))
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.band") === col("y.band") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("x.sim").as("sa"),
        col("y.doc_id").as("b"), col("y.sim").as("sb"))
      .distinct()
    val out = cand.withColumn("hamming", bit_count(expr("sa ^ sb")))
      .filter(col("hamming") <= 8)
      .select(col("a"), col("b"), col("hamming").cast("int").as("hamming"))
      .orderBy("a", "b")
      .localCheckpoint(true)
    sims.unpersist()
    out
  }
}
