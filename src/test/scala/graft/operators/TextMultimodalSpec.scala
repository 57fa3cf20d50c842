package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SURVEY.md §2.F t1/t4 + §2.G m1 — heuristic/hash ops with
  * crafted-input and recomputation self-oracles. */
class TextMultimodalSpec extends SparkSpec {

  test("t1_langid classifies crafted per-language sentences") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "der hund und die katze ist nicht mit ein haus"),
      (2L, "the cat and the dog is in you that house of"),
      (3L, "el perro y los gatos que en es una casa de"),
      (4L, "le chat et la les chiens est dans un une maison"))
      .toDF("doc_id", "text")
    val got = TextOps.langidOver(crafted).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "de", 2L -> "en", 3L -> "es", 4L -> "fr"))
  }

  test("t1_langid on the corpus is deterministic and total") {
    val out = TextOps.t1Langid(spark, sf).collect()
    assert(out.length == graft.Tables.documents(spark, sf).count())
    assert(out.forall(r => Set("de", "en", "es", "fr", "zh")(r.getString(1))))
  }

  test("t4_fingerprint: identical texts share fingerprints, distinct differ") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fp = TextOps.t4Fingerprint(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.get(1), r.getLong(2))).toMap
    val byText = docs.groupBy(_._2).values
    byText.foreach { g =>
      val fps = g.map(kv => fp(kv._1)).toSet
      assert(fps.size == 1, "same text must fingerprint identically")
    }
    // xxhash64 collisions across distinct texts: none expected here
    val distinctTexts = byText.size
    assert(fp.values.map(_._2).toSet.size == distinctTexts)
  }

  test("m3_frame_sample: even-stride offsets, first at 0, last flush with tail") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    val frames = Multimodal.m3FrameSample(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(frames.keySet == docs.keySet)
    frames.foreach { case (id, fs) =>
      val payload = docs(id)
      val n = math.min(4, math.max(1, payload.length / 64))
      assert(fs.length == n, s"doc $id frame count")
      val byIdx = fs.sortBy(_.getInt(1))
      assert(byIdx.head.getInt(2) == 0, "first frame at byte 0")
      if (n > 1)
        assert(byIdx.last.getInt(2) == payload.length - 64,
          s"doc $id last frame flush with tail")
      byIdx.foreach { f =>
        val off = f.getInt(2)
        val frame = payload.slice(off, math.min(off + 64, payload.length))
        val (mean, _, h) = Multimodal.decodeStub(frame)
        assert(f.getDouble(3) == mean && f.getLong(4) == h, s"doc $id frame $off")
      }
    }
  }

  test("m1_binary_meta: stub features match driver-side recomputation") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.m1BinaryMeta(spark, sf).collect()
    assert(rows.length == docs.size)
    rows.take(50).foreach { r =>
      val payload = docs(r.getLong(0)).getBytes("UTF-8")
      val (mean, mx, h) = Multimodal.decodeStub(payload)
      assert(r.getInt(1) == payload.length)
      assert(r.getDouble(2) == mean)
      assert(r.getInt(3) == mx)
      assert(r.getLong(4) == h)
    }
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
