package graft.operators

import graft.SparkSpec

/** As-of join semantics on crafted frames: <= matching, no-prior-row
  * nulls, per-key isolation, same-ts tie resolution. */
class AsOfSpec extends SparkSpec {

  test("attaches latest right row <= ts per key; null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 31L),
      (4L, "b", 15L), (5L, "c", 99L))
      .toDF("id", "k", "t")
    val right = Seq(
      ("a", 5L, 1.0, 100L), ("a", 20L, 2.0, 101L), ("a", 30L, 3.0, 102L),
      ("b", 16L, 9.0, 103L))
      .toDF("k", "t", "v", "rid")
    val got = AsOf.join(left, right, "k", "t", Seq("v", "rid"), "rid")
      .select("id", "asof_v", "asof_rid").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == (Some(1.0), Some(100L)))  // 5 <= 10
    assert(got(2L) == (Some(2.0), Some(101L)))  // equal ts counts
    assert(got(3L) == (Some(3.0), Some(102L)))
    assert(got(4L) == (None, None))             // right at 16 > 15
    assert(got(5L) == (None, None))             // key with no right rows
  }

  test("same-ts right duplicates resolve to the largest tie-break") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L)).toDF("id", "k", "t")
    val right = Seq(("a", 10L, 1.0, 7L), ("a", 10L, 2.0, 9L), ("a", 10L, 3.0, 8L))
      .toDF("k", "t", "v", "rid")
    val got = AsOf.join(left, right, "k", "t", Seq("v", "rid"), "rid").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Double]("asof_v") == 2.0)
    assert(got.head.getAs[Long]("asof_rid") == 9L)
  }
}
