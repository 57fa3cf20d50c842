package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Custom top-k operator vs the window-rank idiom: identical rows and
  * ranks on real data, including k > group size and tie-breaking. */
class TopKPerGroupSpec extends SparkSpec {

  private def windowForm(k: Int) = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    graft.Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def topkForm(k: Int) =
    TopKPerGroup.perKey(
      graft.Tables.events(spark, sf).select("event_id", "event_type", "value"),
      Seq(col("event_type")), Seq(col("value").desc, col("event_id")), k)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("event_type", "event_id", "value", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("matches window row_number for k=5") {
    assert(asSet(topkForm(5)) == asSet(windowForm(5)))
  }

  test("matches window row_number when k exceeds every group size") {
    assert(asSet(topkForm(100000)) == asSet(windowForm(100000)))
  }

  test("shuffles only the partial winners (plan shape)") {
    val plan = topkForm(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    // partial phase must sit below the exchange, final above it
    val lines = plan.linesIterator.toSeq
    val partialIdx = lines.indexWhere(_.contains("TopKPerGroupPartial"))
    val finalIdx = lines.indexWhere(l =>
      l.contains("TopKPerGroup") && !l.contains("Partial"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    assert(finalIdx >= 0 && partialIdx >= 0 && exchangeIdx >= 0)
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"expected final < exchange < partial in:\n$plan")
  }

  test("empty group = single global top-k, not per-partition top-ks") {
    val k = 7
    val out = TopKPerGroup.perKey(
        graft.Tables.events(spark, sf).select("event_id", "event_type", "value"),
        Seq.empty, Seq(col("value").desc, col("event_id")), k)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    val expect = graft.Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
      .orderBy(col("value").desc, col("event_id")).limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getLong(0), r.getDouble(2), i + 1) }
    assert(out.sortBy(_._3).toSeq == expect.toSeq)
  }

  test("composes with downstream DataFrame ops") {
    val out = topkForm(2).filter(col("rank") === 1)
      .groupBy("event_type").agg(max("value").as("v")).collect()
    assert(out.nonEmpty)
  }

  test("randomized differential: equals window-rank on tie-heavy skewed frames") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 6) {
      val nGroups = 1 + rnd.nextInt(40)
      val k = 1 + rnd.nextInt(8)
      val n = 500 + rnd.nextInt(2000)
      // skewed group sizes (zipf-ish via squaring) + tiny value range
      // to force heavy ties; id is the unique tie-break
      val rows = (0 until n).map { i =>
        val g = (math.pow(rnd.nextDouble(), 2) * nGroups).toInt
        (s"g$g", i.toLong, rnd.nextInt(5).toDouble, rnd.nextInt(3))
      }
      val df = rows.toDF("g", "id", "v", "u")
      // mixed-direction, multi-column order with a computed expression
      val order = Seq(col("v").desc, (col("u") + col("id") % 7).asc, col("id"))
      val got = TopKPerGroup.perKey(df, Seq(col("g")), order, k)
        .select("g", "id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val w = Window.partitionBy("g").orderBy(order: _*)
      val want = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("g", "id", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want,
        s"trial $trial (groups=$nGroups k=$k n=$n): " +
          s"${(got -- want).size} extra, ${(want -- got).size} missing")
    }
  }

  test("perKeyDistinct == distinct().perKey on duplicate-heavy pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // LSH-candidate shape: the same (q, c, score) row emitted 1-4
    // times (different tables), scores tie-heavy across pairs
    val rows = for {
      q <- 0 until 40; c <- 0 until 30 if rnd.nextDouble() < 0.5
      copies = 1 + rnd.nextInt(4)
      score = rnd.nextInt(6).toDouble / 10
      _ <- 0 until copies
    } yield (q.toLong, c.toLong, score)
    val df = rows.toDF("qid", "cid", "cos").repartition(7)
    val order = Seq(col("cos").desc, col("cid"))
    def keyed(d: org.apache.spark.sql.DataFrame) =
      d.select("qid", "cid", "cos", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    val want = keyed(TopKPerGroup.perKey(df.distinct(), Seq(col("qid")), order, 5))
    val got = keyed(TopKPerGroup.perKeyDistinct(df, Seq(col("qid")), order, 5))
    assert(got == want)
    // and the plain form really does keep duplicates (guards vacuity)
    val dup = keyed(TopKPerGroup.perKey(df, Seq(col("qid")), order, 5))
    assert(dup != want)
  }

  test("perKeyDistinct fails loudly on a non-determining order") {
    import spark.implicits._
    // adversarial: two rows ord-equal under (cos, cid) but differing
    // in a payload column the order does not cover — the r6-era code
    // silently dropped the second row; the guard must throw instead
    val df = Seq(
      (1L, 10L, 0.5, "a"),
      (1L, 10L, 0.5, "b"),
      (1L, 11L, 0.4, "c")
    ).toDF("qid", "cid", "cos", "payload").repartition(1)
    val ex = intercept[Exception] {
      TopKPerGroup.perKeyDistinct(df, Seq(col("qid")),
        Seq(col("cos").desc, col("cid")), 5).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("ordering does not determine")),
      s"unexpected failure: $ex")
    // the same rows pass once the payload column joins the order
    val ok = TopKPerGroup.perKeyDistinct(df, Seq(col("qid")),
      Seq(col("cos").desc, col("cid"), col("payload")), 5).collect()
    assert(ok.length == 3)
  }
}
