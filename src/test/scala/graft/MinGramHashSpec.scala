package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.PortableHash

/** Equivalence contract of the fused [[graft.functions.MinGramHash]]
  * expression: bit-identical to the transform+array_min composition it
  * replaced in t4_fingerprint, for every char-length regime (empty,
  * shorter than / equal to / longer than the gram) and for multi-byte
  * UTF-8 (2-byte Latin, 3-byte CJK, 4-byte emoji) where char offsets
  * diverge from byte offsets — the composition's `substr` is
  * CHARACTER-addressed, so the fused scan must segment identically. */
class MinGramHashSpec extends SparkSpec {

  /** The pre-fusion composed form, evaluated by Spark itself. */
  private def composed(t: org.apache.spark.sql.Column, gram: Int) =
    array_min(transform(
      sequence(lit(0), greatest(length(t) - gram, lit(0))),
      i => PortableHash.mdhash64(t.substr(i + lit(1), lit(gram)))))

  private def check(texts: Seq[String], gram: Int): Unit = {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(
        PortableHash.minGramHash(col("text"), gram).as("fused"),
        composed(col("text"), gram).as("composed"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1),
        s"gram=$gram text=${t.take(40).mkString}")
    }
  }

  test("fused == composed on ASCII edge lengths") {
    check(Seq("", "a", "1234567", "12345678", "123456789",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa", "ab ab ab ab ab ab ab"), 8)
    check(Seq("", "ab", "abc", "abcd"), 3)
  }

  test("fused == composed on multi-byte UTF-8") {
    check(Seq(
      "héllo wörld ümlaut àccents ç",   // 2-byte
      "数据质量分析引擎测试文档",          // 3-byte CJK
      "mixed 汉字 and ascii ünd émoji",  // mixed widths
      "é", "中文",          // shorter than gram
      "ééééé"), 8) // combining marks
  }

  test("fused == composed on random unicode strings (property)") {
    val charGen = Gen.frequency(
      (6, Gen.alphaNumChar),
      (1, Gen.const(' ')),
      (1, Gen.oneOf('é', 'ü', 'ß', 'ç')),
      (1, Gen.oneOf('中', '文', '語', '간')),
      (1, Gen.oneOf("😀", "🚀").map(_.charAt(0)))) // lone surrogate half
    val textGen = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val texts = Gen.listOfN(60, textGen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    check(texts, 8)
    check(texts, 3)
  }
}
