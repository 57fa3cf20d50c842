package graft.operators

import graft.SparkSpec

/** SURVEY.md §2.E s2 — LSH ANN recall against the oracle-checked
  * brute-force s1 as the self-oracle. */
class SimilaritySpec extends SparkSpec {

  test("s2_ann_lsh recall vs s1 brute force >= 0.6 in the weak-cosine regime") {
    val truth = Similarity.s1AnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.s2AnnLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(approx).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall $recall (|truth|=${truth.size}, |lsh|=${approx.size})")
  }

  test("s4_ann_pq recall vs s1 and exact refined cosines") {
    val truth = Similarity.s1AnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pqRows = Similarity.s4AnnPq(spark, sf).collect()
    val pq = pqRows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.keySet.intersect(pq).size.toDouble / truth.size
    // PQ top-50 shortlist + exact refine: high recall even in the
    // weak-cosine regime (50-deep shortlist over a small corpus)
    assert(recall >= 0.7, s"recall $recall (|truth|=${truth.size}, |pq|=${pq.size})")
    // refined cosines are EXACT — must equal s1's on shared pairs
    pqRows.foreach { r =>
      truth.get((r.getLong(0), r.getLong(1)))
        .foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
    // each query returns a full ranked top-10
    pqRows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.length == 10)
      assert(g.map(_.getInt(3)).sorted.sameElements(1 to 10))
    }
  }

  test("s2 cosines agree with s1 where pairs overlap") {
    val truth = Similarity.s1AnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.s2AnnLsh(spark, sf).collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      truth.get(k).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
  }
}
