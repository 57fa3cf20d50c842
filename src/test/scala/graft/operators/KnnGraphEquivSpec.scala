package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The rewritten [[Similarity.scoredPairs]] (cosine computed INSIDE the
  * bucket self-join, vectors carried on bucket rows) must reproduce the
  * original candidates-then-join-embeddings pipeline row for row — same
  * candidate set, same cosine doubles, same top-k graph. */
class KnnGraphEquivSpec extends SparkSpec {

  test("in-join scoring == candidates-then-join pipeline (bit-equal)") {
    val k = 5
    val targetBucket = 64
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))

    // the pre-rewrite pipeline, spelled out as the oracle
    val bits = Similarity.adaptiveBits(e.count(), targetBucket)
    val s = spark
    import s.implicits._
    val b = e.as[(Long, Seq[Float])]
      .flatMap { case (id, v) =>
        Similarity.buckets(v, bits).map { case (t, bk) => (id, t, bk) } }
      .toDF("id", "t", "bk")
    val cand = b.select(col("id").as("qid"), col("t"), col("bk"))
      .join(b.select(col("id").as("cid"), col("t"), col("bk")), Seq("t", "bk"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("eq"),
      sqrt(graft.functions.VectorOps.normSq(col("embedding"))).as("qn"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("ec"),
      sqrt(graft.functions.VectorOps.normSq(col("embedding"))).as("cn"))
    val cos = graft.functions.VectorOps.dot(col("eq"), col("ec")) /
      (col("qn") * col("cn"))
    val want = graft.plans.TopKPerGroup.perKey(
        cand.join(q, "qid").join(c, "cid").withColumn("cos", cos),
        Seq(col("qid")), Seq(col("cos").desc, col("cid")), k)
      .select(col("qid"), col("cid"), round(col("cos"), 6).as("cos"),
        col("rank").as("rn"))
      .orderBy("qid", "rn").collect()

    val got = Similarity.knnGraph(e, k, targetBucket).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"got=$g want=$w") }

    // and the scored pair SET itself matches candidates exactly
    val gotPairs = Similarity.scoredPairs(e, targetBucket)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantPairs = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == wantPairs)
  }
}
