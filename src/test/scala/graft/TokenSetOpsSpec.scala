package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TokenSetOps

/** Equivalence contract of the fused [[graft.functions.TokenSetOps]]
  * expressions against the composed HOF stacks they replaced:
  * TokenSetCount vs `size(filter(split(text," "), w -> w ∈ set))` and
  * TokenScrub vs `array_join(transform(split(text," "),
  * w -> when(w ∈ vocab, w).otherwise(unk)), " ")` — including
  * multi-space runs (empty tokens are OOV), leading/trailing spaces,
  * unicode tokens, and seeded random corpora. */
class TokenSetOpsSpec extends SparkSpec {

  private val vocab = Seq("the", "data", "join", "query", "中文", "émoji")

  private def check(texts: Seq[String]): Unit = {
    import spark.implicits._
    val words = split(col("text"), " ")
    val rows = texts.toDF("text")
      .select(
        TokenSetOps.countIn(col("text"), vocab).as("fc"),
        size(filter(words, w => w.isInCollection(vocab))).as("cc"),
        TokenSetOps.scrub(col("text"), vocab, "<unk>").as("fs"),
        array_join(transform(words,
          w => when(w.isInCollection(vocab), w).otherwise("<unk>")), " ")
          .as("cs"),
        graft.functions.SpaceTokens.col(col("text")).as("fn"),
        size(words).as("cn"))
      .collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getInt(0) == r.getInt(1), s"count: <$t>")
      assert(r.getString(2) == r.getString(3),
        s"scrub: <$t> fused=<${r.getString(2)}> composed=<${r.getString(3)}>")
      assert(r.getInt(4) == r.getInt(5), s"ntokens: <$t>")
    }
  }

  test("fused == composed on crafted edges") {
    check(Seq(
      "", " ", "   ",
      "the data join query",
      "unknown words only here",
      "the  data", " the data ", "the data ",
      "thedata data2 the2 xthe",
      "中文 the émoji nope",
      "the the the the"))
  }

  test("fused == composed on random corpora (property)") {
    val tokenGen = Gen.frequency(
      (4, Gen.oneOf(vocab)),
      (3, Gen.alphaNumStr.map(_.take(8))),
      (1, Gen.const("")),
      (1, Gen.oneOf("汉字", "ßü", "😀")))
    val textGen = for {
      n <- Gen.choose(0, 40)
      ts <- Gen.listOfN(n, tokenGen)
    } yield ts.mkString(" ")
    val texts = Gen.listOfN(120, textGen)
      .apply(Gen.Parameters.default, Seed(13L)).get
    check(texts)
  }
}
