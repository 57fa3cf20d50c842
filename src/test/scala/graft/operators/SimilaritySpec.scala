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

  test("s2 cosines agree with s1 where pairs overlap") {
    val truth = Similarity.s1AnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    Similarity.s2AnnLsh(spark, sf).collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      truth.get(k).foreach(c => assert(math.abs(c - r.getDouble(2)) < 1e-9))
    }
  }
}
