package graft.operators

import graft.SparkSpec

/** SURVEY.md §2.D d3/d4 — hash-algorithm ops verified against exact
  * Jaccard (d2, itself DuckDB-oracle-checked) as the self-oracle. */
class DedupApproxSpec extends SparkSpec {

  test("minhash signature estimates Jaccard within tolerance") {
    val a = (1 to 60).map(i => s"tok$i").mkString(" ")
    val b = ((1 to 45).map(i => s"tok$i") ++ (100 to 114).map(i => s"tok$i")).mkString(" ")
    val sa = DedupApprox.minhashSig(a)
    val sb = DedupApprox.minhashSig(b)
    // shingle sets of a sliding 5-window over mostly-shared prefixes:
    // exact Jaccard = |∩|/|∪| computed directly
    def sh(t: String) = t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val (xa, xb) = (sh(a), sh(b))
    val exact = (xa & xb).size.toDouble / (xa | xb).size
    val est = DedupApprox.estJaccard(sa, sb)
    assert(math.abs(est - exact) < 0.15, s"est $est vs exact $exact")
    // identical docs → identical signature, est 1.0
    assert(DedupApprox.estJaccard(sa, DedupApprox.minhashSig(a)) == 1.0)
  }

  test("d3_minhash_lsh finds the high-Jaccard pairs d2 finds, no junk") {
    val exact = Dedup.d2DedupNgram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = DedupApprox.d3MinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val strong = exact.filter(_._2 >= 0.7).keySet
    val found = strong.intersect(lsh.keySet)
    assert(strong.nonEmpty, "fixture should contain strong near-dups")
    assert(found.size.toDouble / strong.size >= 0.8,
      s"LSH recall ${found.size}/${strong.size} on jac>=0.7 pairs")
    // no wild false positives: every LSH pair has real Jaccard >= 0.35
    lsh.keySet.foreach { p =>
      assert(exact.contains(p) || {
        // below d2's 0.5 cut — recompute exact for this pair
        val docs = graft.Tables.documents(spark, sf)
          .select("doc_id", "text").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        def sh(t: String) = t.split(" ").sliding(5).map(_.mkString(" ")).toSet
        val (xa, xb) = (sh(docs(p._1)), sh(docs(p._2)))
        (xa & xb).size.toDouble / (xa | xb).size >= 0.35
      }, s"pair $p looks like a false positive")
    }
  }

  test("d4_simhash pairs match driver-side recomputation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = DedupApprox.d4Simhash(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
      val expected = java.lang.Long.bitCount(
        DedupApprox.simhashPortable(docs(a)) ^ DedupApprox.simhashPortable(docs(b)))
      assert(h == expected && h <= 8, s"pair ($a,$b): got $h expected $expected")
    }
  }

  test("SimHash60 expression == simhashPortable, bit for bit (r8)") {
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the Java split(" ") edge cases the byte-level segmentation must
    // replay: empty doc, all-space doc, leading/double/trailing spaces,
    // multibyte UTF-8 words, single word, single space word boundaries
    val edge = Seq("", " ", "   ", "a", " a", "a ", "a  b", "  a b ",
      "héllo wörld", "日本語 テスト 文書", "mixed ascii ünïcode 中文 ",
      "tab\tis not a separator", "a b c d e f g h")
    val rnd = new scala.util.Random(87)
    val fuzz = (1 to 200).map { _ =>
      val words = (0 to rnd.nextInt(30)).map(_ =>
        rnd.alphanumeric.take(rnd.nextInt(8)).mkString)
      words.mkString(" ") + (" " * rnd.nextInt(3))
    }
    val corpus = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0)).take(200)
    val all = (edge ++ fuzz ++ corpus).zipWithIndex.map(_.swap)
    val got = all.toDF("id", "text").repartition(4)
      .select(col("id"), GraftShim.column(graft.functions.SimHash60(
        GraftShim.expression(col("text")))).as("sim"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    all.foreach { case (id, text) =>
      assert(got(id) == DedupApprox.simhashPortable(text),
        s"mismatch on ${text.take(40).replace(' ', '␣')}…")
    }
  }
}
