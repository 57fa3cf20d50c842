package graft.operators

import graft.SparkSpec

/** Bucketed range join semantics: boundary inclusion, multi-bucket
  * intervals, no-match points, no duplicate matches. */
class RangeJoinSpec extends SparkSpec {

  test("point-in-interval matches exactly, inclusive on both ends") {
    import spark.implicits._
    val points = Seq((1L, "a", 100L), (2L, "a", 250L), (3L, "a", 999L),
      (4L, "b", 100L)).toDF("id", "k", "t")
    // interval spanning several 100-wide buckets + boundary cases
    val intervals = Seq(("a", 100L, 250L, "s1"), ("a", 900L, 950L, "s2"))
      .toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi",
      bucketWidth = 100L)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "s1"), (2L, "s1"))) // 999 outside s2; user b no intervals
  }

  test("an interval spanning many buckets matches each contained point once") {
    import spark.implicits._
    val points = (0L until 50L).map(i => (i, "k", i * 37L)).toDF("id", "k", "t")
    val intervals = Seq(("k", 100L, 1500L, "big")).toDF("k", "lo", "hi", "name")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "lo", "hi",
      bucketWidth = 64L).collect()
    val expected = (0L until 50L).count(i => i * 37 >= 100 && i * 37 <= 1500)
    assert(got.length == expected, s"${got.length} vs $expected")
    assert(got.map(_.getAs[Long]("id")).distinct.length == got.length, "duplicates")
  }
}
