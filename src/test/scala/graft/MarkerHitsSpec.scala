package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.MarkerHits

/** Equivalence contract of the fused [[graft.functions.MarkerHits]]
  * scorer: bit-identical to the composed per-language
  * `size(filter(split(text, " "), w -> w.isInCollection(markers)))`
  * column stack it replaced in t1_langid / t15_langid_margin —
  * including multi-space runs (empty tokens), leading/trailing spaces,
  * tokens longer than any marker, multi-byte UTF-8 tokens, markers
  * shared across languages ("de", "le"), and seeded random corpora
  * drawn from markers + noise. */
class MarkerHitsSpec extends SparkSpec {

  /** The pre-fusion composed form, evaluated by Spark itself. */
  private def composed(t: org.apache.spark.sql.Column) = {
    val words = split(t, " ")
    array(MarkerHits.langs.map { case (_, markers) =>
      size(filter(words, w => w.isInCollection(markers)))
    }: _*)
  }

  private def check(texts: Seq[String]): Unit = {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(
        MarkerHits.hitsCol(col("text")).as("fused"),
        composed(col("text")).as("composed"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1),
        s"text=${t.take(60)}: fused=${r.getSeq[Int](0)} composed=${r.getSeq[Int](1)}")
    }
  }

  test("fused == composed on crafted sentences and edge tokens") {
    check(Seq(
      "",
      " ",
      "   ",
      "the and of to in is you that",              // all-en
      "der die das und ist nicht mit ein",         // all-de
      "de de de",                                  // es AND zh marker
      "le la les et un une est dans",              // fr (le also zh)
      "est",                                       // es("es"? no) fr+?
      "the  and   of",                             // multi-space runs
      " the and ",                                 // leading/trailing
      "theand theextra nicht0 xde dex",            // non-token matches
      "thequickbrownfox jumps over a lazy dog",    // overlong tokens
      "the der el le de shi the der el le de shi", // cross-language mix
      "DE The AND Le",                             // case-sensitive: no hits
      "数据 质量 de 分析 the 引擎",                   // unicode + markers
      "é ü ß 中文 😀 the"))
  }

  test("fused == composed on random marker/noise corpora (property)") {
    val allMarkers = MarkerHits.langs.flatMap(_._2)
    val tokenGen = Gen.frequency(
      (5, Gen.oneOf(allMarkers)),
      (2, Gen.alphaNumStr.map(_.take(10))),
      (1, Gen.const("")),
      (1, Gen.oneOf("中文", "émoji", "😀", "derdie", "t h e")))
    val textGen = for {
      n <- Gen.choose(0, 60)
      ts <- Gen.listOfN(n, tokenGen)
    } yield ts.mkString(" ")
    val texts = Gen.listOfN(120, textGen)
      .apply(Gen.Parameters.default, Seed(7L)).get
    check(texts)
  }

  test("t1/t15 langid over the fused scorer matches on the test SF") {
    // end-to-end: t15's rank-1 prediction must equal t1's for every doc
    val t1 = graft.operators.TextOps.t1Langid(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    graft.operators.TextOps.t15LangidMargin(spark, sf).collect().foreach { r =>
      val (lang, sc) = t1(r.getLong(0))
      assert(r.getString(1) == lang && r.getInt(2) == sc)
    }
  }
}
