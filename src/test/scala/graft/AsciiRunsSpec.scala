package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.AsciiRuns

/** Equivalence contract of the fused [[graft.functions.AsciiRuns]]
  * scan: bit-identical to `regexp_count(text, '[a-z]+|[0-9]+')` —
  * including letter/digit adjacency (one run each), uppercase and
  * unicode run-breakers, and seeded random mixed corpora. */
class AsciiRunsSpec extends SparkSpec {

  private def check(texts: Seq[String]): Unit = {
    import spark.implicits._
    val rows = texts.toDF("text")
      .select(AsciiRuns.col(col("text")).as("fused"),
        expr("regexp_count(text, '[a-z]+|[0-9]+')").as("composed"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getInt(0) == r.getInt(1),
        s"text=<${t.take(50)}> fused=${r.getInt(0)} composed=${r.getInt(1)}")
    }
  }

  test("fused == composed on crafted edges") {
    check(Seq(
      "", " ", "abc", "123", "abc123", "123abc", "a1b2c3",
      "ABC", "aBc", "a b c", "a  1", "the quick brown fox 42",
      "ümlaut é 中文 a1", "😀abc😀123", "a-1_b", "...", "a", "1",
      "Order#0001 part9 XL"))
  }

  test("fused == composed on random mixed corpora (property)") {
    val charGen = Gen.frequency(
      (6, Gen.choose('a', 'z')),
      (3, Gen.choose('0', '9')),
      (2, Gen.const(' ')),
      (1, Gen.choose('A', 'Z')),
      (1, Gen.oneOf('é', '中', '!', '-', '.')))
    val textGen = for {
      n <- Gen.choose(0, 80)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val texts = Gen.listOfN(150, textGen)
      .apply(Gen.Parameters.default, Seed(21L)).get
    check(texts)
  }
}
