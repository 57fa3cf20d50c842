package graft.operators

import graft.SparkSpec

/** Round-4 continuation batch (SURVEY.md §2) — self-oracles for the
  * session's new operators; DuckDB hash oracles cover the rest. */
class Round4cOpsSpec extends SparkSpec {

  test("s8_range_search agrees with s1 on the qualifying top-k set and respects the threshold") {
    val range = Similarity.s8RangeSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every emitted pair clears the threshold
    range.values.foreach(c => assert(c >= 0.25, s"cos $c below threshold"))
    // no duplicate pairs (map size == row count)
    assert(range.size == Similarity.s8RangeSearch(spark, sf).count())
    // s1's top-10 pairs that clear the threshold are exactly the
    // qualifying head of the range result, with identical cosines
    Similarity.s1AnnBrute(spark, sf).collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val cos = r.getDouble(2)
      if (cos >= 0.25)
        assert(range.get(k).contains(cos), s"missing/mismatched $k: ${range.get(k)} vs $cos")
    }
    // and s8 returns MORE than any top-10 could where many qualify
    val perQuery = range.keys.groupBy(_._1).view.mapValues(_.size)
    assert(perQuery.values.sum > 0, "empty range result")
  }
}
