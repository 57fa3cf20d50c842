package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.PortableHash

/** SURVEY.md §2 round-2 pipeline ops — i2/i3/d6/t7 + the portable hash
  * they rest on, verified by full driver-side recomputation (the same
  * math the DuckDB oracle runs). */
class PipelineOpsSpec extends SparkSpec {

  /** Driver-side twin of PortableHash.bucket. */
  private def bucket(v: String, salt: String, buckets: Long): Long = {
    val h = DedupApprox.mdhash64Str(s"$v:$salt")
    ((h % buckets) + buckets) % buckets
  }

  test("portable mdhash64 column matches driver-side recomputation") {
    import spark.implicits._
    val vals = Seq("a", "xyz", "42", "the quick brown fox")
    val got = vals.toDF("v")
      .select(PortableHash.mdhash64(col("v"))).collect().map(_.getLong(0))
    assert(got.toSeq == vals.map(DedupApprox.mdhash64Str))
  }

  test("i2_split_assign: 98/1/1 partition, exhaustive, deterministic") {
    val rows = Sampling.i2SplitAssign(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(rows.length == docs, "every doc gets a split")
    rows.foreach { r =>
      val b = bucket(r.getLong(0).toString, "split", 100L)
      assert(r.getLong(1) == b)
      val expect = if (b < 98) "train" else if (b == 98) "val" else "test"
      assert(r.getString(2) == expect)
    }
  }

  test("i3_mixture: never oversamples, exhausts the binding source") {
    import spark.implicits._
    // synthetic corpus big enough for ratio assertions: 4 sources with
    // skewed sizes, srcA upweighted 3:1
    val df = spark.range(40000L).toDF("doc_id")
      .withColumn("source",
        expr("CASE WHEN doc_id % 10 < 1 THEN 'srcA' WHEN doc_id % 10 < 4 THEN 'srcB' ELSE 'srcC' END"))
    val out = Sampling.mixture(df, "source", col("doc_id"),
      src => if (src == "srcA") 3L else 1L, "spec")
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // srcA is the binding constraint (4000/3 < 12000/1 < 24000/1):
    // it must be kept (almost) fully, and B/C each land near
    // c_A/w_A = 1333 expected keeps
    assert(kept("srcA") > 3900, s"binding source kept ${kept("srcA")}/4000")
    Seq("srcB", "srcC").foreach { s =>
      assert(kept(s) <= full(s))
      assert(math.abs(kept(s) - 4000.0 / 3) < 200,
        s"$s kept ${kept(s)}, want ~1333")
    }
    // deterministic
    assert(out.count() == Sampling.mixture(df, "source", col("doc_id"),
      src => if (src == "srcA") 3L else 1L, "spec").count())
  }

  test("i4_pack_sequences matches a driver-side global prefix sum") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").length.toLong))
    val ordered = docs
      .map { case (id, n) => (id, n, DedupApprox.mdhash64Str(s"$id:pack")) }
      .sortBy { case (id, _, ok) => (ok, id) }
    var off = 0L
    val expect = ordered.map { case (id, n, _) =>
      val o = off; off += n; id -> ((n, o, o / 2048L))
    }.toMap
    val got = Sampling.i4PackSequences(spark, sf).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (n, o, sq) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, o, sq)),
        s"doc ${r.getLong(0)}")
    }
    // packing is tight: max offset+n_tok == total tokens
    assert(off == docs.map(_._2).sum)
  }

  test("d6_contamination matches driver-side recomputation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length <= 8) Set(w.mkString(" "))
      else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val (test_, train) = docs.partition {
      case (id, _) => bucket(id.toString, "contam", 10L) == 0L
    }
    val trainSh = train.values.flatMap(sh).toSet
    val got = Dedup.d6Contamination(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == test_.keySet)
    test_.foreach { case (id, t) =>
      val mine = sh(t)
      val expect = (mine.size.toLong, mine.count(trainSh).toLong)
      assert(got(id) == expect, s"doc $id: got ${got(id)} expect $expect")
    }
  }

  test("t7_vocab_scrub matches driver-side recomputation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val freq = docs.values.flatMap(_.split(" "))
      .groupBy(identity).view.mapValues(_.size).toSeq
    val vocab = freq.sortBy { case (w, n) => (-n, w) }.take(20).map(_._1).toSet
    val got = TextOps.t7VocabScrub(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val words = docs(r.getLong(0)).split(" ")
      val nUnk = words.count(w => !vocab(w))
      assert(r.getLong(1) == nUnk, s"doc ${r.getLong(0)} n_unk")
      val scrub = words.map(w => if (vocab(w)) w else "<unk>").mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(scrub.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      assert(r.getString(2) == md, s"doc ${r.getLong(0)} scrub_md5")
    }
  }

  test("t4_fingerprint matches driver-side recomputation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.t4Fingerprint(spark, sf).collect()
    got.foreach { r =>
      val t = docs(r.getLong(0))
      val grams =
        if (t.length <= 8) Seq(t.take(8))
        else (0 to t.length - 8).map(i => t.substring(i, i + 8))
      val fpMin = grams.map(DedupApprox.mdhash64Str).min
      assert(r.getLong(1) == fpMin, s"doc ${r.getLong(0)} fp_min")
      assert(r.getLong(2) == DedupApprox.mdhash64Str(t), s"doc ${r.getLong(0)} fp64")
    }
  }
}
