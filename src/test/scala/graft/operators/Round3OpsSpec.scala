package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2 round-3 additions — t8 (redaction), t9 (TF-IDF top-k),
  * e13 (forward-fill), i5 (deterministic global shuffle). All four are
  * DuckDB-oracled in Verify; these specs pin the semantic invariants
  * the hash compare can't articulate. */
class Round3OpsSpec extends SparkSpec {

  test("t8_redact counts real matches and the scrub is idempotent") {
    val out = TextOps.t8Redact(spark, sf).collect()
    assert(out.length == 500)
    // the term class occurs in the corpus — redaction did real work
    assert(out.map(_.getLong(1)).sum > 0)
    // docs without a match keep their original digest; docs with one don't
    val orig = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val changed = r.getString(2) != orig(r.getLong(0))
      assert(changed == (r.getLong(1) > 0))
    }
  }

  test("t9_tfidf_topk ranks rare-in-corpus terms above common ones") {
    val out = TextOps.t9TfidfTopk(spark, sf).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.forall(_._2.length <= 5))
    // ranks are 1..k and scores non-increasing within a doc
    byDoc.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // 'dup' is ~30x rarer than every other corpus word: any doc that
    // contains it must surface it in the top-5
    val dupDocs = graft.Tables.documents(spark, sf)
      .filter(col("text").rlike("\\bdup\\b")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(dupDocs.nonEmpty)
    val dupTop = out.filter(_.getString(1) == "dup").map(_.getLong(0)).toSet
    assert(dupDocs.subsetOf(dupTop),
      s"${(dupDocs -- dupTop).size} docs hide their rarest term")
  }

  test("e13_gap_fill carries each key's last valid value across gaps") {
    val out = EventOps.e13GapFill(spark, sf)
      .collect().groupBy(_.getLong(1)) // per user
    assert(out.nonEmpty)
    var gaps = 0
    out.values.foreach { rows =>
      var lastValid: Option[Double] = None
      rows.sortBy(r => (r.getLong(2), r.getLong(0))).foreach { r =>
        val v = if (r.isNullAt(3)) None else Some(r.getDouble(3))
        val filled = if (r.isNullAt(4)) None else Some(r.getDouble(4))
        if (v.isDefined) { lastValid = v; assert(filled == v) }
        else { gaps += 1; assert(filled == lastValid) }
        assert(r.getBoolean(5) == v.isEmpty)
      }
    }
    assert(gaps > 0, "corpus must exercise the fill path")
  }

  test("i5_global_shuffle is a stable permutation matching the hash order") {
    val out = Sampling.i5GlobalShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // a permutation: positions are exactly 0..n-1
    assert(out.map(_._2).sorted.toSeq == (0L until out.length.toLong))
    // matches the driver-side recomputation of the portable hash order
    val expected = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.PortableHash.mdhash64(
        concat(col("doc_id").cast("string"), lit(":shuffle"))).as("ok"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, ok) => (ok, id) }
      .zipWithIndex.map { case ((id, _), i) => (id, i.toLong) }.toMap
    out.foreach { case (id, pos) => assert(expected(id) == pos) }
    // deterministic across runs
    val again = Sampling.i5GlobalShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq == out.toSeq)
  }
}
