package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("uniform sample hits the target fraction and is deterministic") {
    import spark.implicits._
    val df = spark.range(100000L).toDF("id")
    val a = Sampling.uniform(df, col("id"), 0.25).count()
    val b = Sampling.uniform(df, col("id"), 0.25).count()
    assert(a == b, "must be deterministic")
    assert(math.abs(a / 100000.0 - 0.25) < 0.01, s"fraction ${a / 100000.0}")
    // different salt → different (but still sized) sample
    val c = Sampling.uniform(df, col("id"), 0.25, salt = 7L)
      .collect().map(_.getLong(0)).toSet
    val aSet = Sampling.uniform(df, col("id"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(c != aSet)
  }

  test("stratified sample holds per-stratum proportions") {
    val docs = graft.Tables.documents(spark, sf)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.i1StratifiedSample(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = after.getOrElse("en", 0L).toDouble / before("en")
    assert(math.abs(enRate - 0.5) < 0.15, s"en rate $enRate")
    (before.keySet - "en").foreach { l =>
      val rate = after.getOrElse(l, 0L).toDouble / before(l)
      assert(rate < 0.30, s"$l rate $rate should be ~0.1")
    }
  }
}
