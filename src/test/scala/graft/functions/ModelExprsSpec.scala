package graft.functions

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ml.{DriverKMeans, GraftIsolationForest, ProductQuantizer}

/** The r7 UDF→Expression conversions must be BIT-IDENTICAL to the UDF
  * formulations they replaced (same loops, same widening, same
  * tie-breaks) — compared here element-for-element on seeded random
  * frames, plus the loud-failure contracts on corrupt input. */
class ModelExprsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(421)
  private def vec(dim: Int): Array[Float] =
    Array.fill(dim)(rnd.nextFloat() * 2f - 1f)
  private lazy val vectors: Seq[(Long, Seq[Float])] =
    (0L until 400L).map(i => i -> vec(64).toSeq)
  private lazy val centers: Array[Array[Double]] =
    Array.fill(10)(vec(64).map(_.toDouble))

  test("NearestCentroid == the a3 scoring UDF, bit for bit") {
    val df = vectors.toDF("vec_id", "embedding").repartition(3)
    val ctrs = centers
    val udfForm = udf((v: Seq[Float]) => {
      var best = Double.MaxValue
      var bi = -1
      var c = 0
      while (c < ctrs.length) {
        val ctr = ctrs(c)
        var d = 0.0
        var i = 0
        while (i < ctr.length) { val diff = v(i) - ctr(i); d += diff * diff; i += 1 }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      (bi, math.sqrt(best))
    })
    val want = df.withColumn("dc", udfForm(col("embedding")))
      .select(col("vec_id"), col("dc._1"), col("dc._2"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val got = df.withColumn("dc", GraftShim.column(
        NearestCentroid(GraftShim.expression(col("embedding")), centers)))
      .select(col("vec_id"), col("dc.cluster"), col("dc.dist"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("NearestCentroidIdx == DriverKMeans.nearest; Hier == two-level compose") {
    val df = vectors.toDF("vec_id", "embedding").repartition(3)
    val wantFlat = vectors.map { case (id, v) =>
      id -> DriverKMeans.nearest(v.toArray, centers) }.toMap
    val gotFlat = df.withColumn("cl", GraftShim.column(
        NearestCentroidIdx(GraftShim.expression(col("embedding")), centers)))
      .select("vec_id", "cl").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotFlat == wantFlat)
    val fine = Array.tabulate(centers.length)(c =>
      Array.fill(3)(vec(64).map(_.toDouble)))
    val k2 = 3
    val wantHier = vectors.map { case (id, v) =>
      val a = v.toArray
      val c = DriverKMeans.nearest(a, centers)
      id -> (c * k2 + DriverKMeans.nearest(a, fine(c)))
    }.toMap
    val gotHier = df.withColumn("cl", GraftShim.column(
        HierNearestIdx(GraftShim.expression(col("embedding")), centers,
          fine, k2)))
      .select("vec_id", "cl").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotHier == wantHier)
  }

  test("NearestCellsIdx == the s3 probe UDF (stable-sort take-n), ties included") {
    // duplicate centroids plant exact distance ties: the UDF's
    // sortBy(_._1) is stable, so the lower cell index must come first
    val tieCenters = centers ++ Array(centers(2).clone(), centers(7).clone())
    val udfForm = udf((v: Seq[Float], n: Int) =>
      tieCenters.zipWithIndex.map { case (ctr, ci) =>
        var d = 0.0
        var i = 0
        while (i < ctr.length) { val df = v(i) - ctr(i); d += df * df; i += 1 }
        (d, ci)
      }.sortBy(_._1).take(n).map(_._2))
    val df = vectors.toDF("vec_id", "embedding").repartition(3)
    for (n <- Seq(1, 6, 12, 99)) { // 99 > k: take caps at k
      val want = df.select(col("vec_id"), udfForm(col("embedding"), lit(n)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      val got = df.select(col("vec_id"), GraftShim.column(NearestCellsIdx(
          GraftShim.expression(col("embedding")), tieCenters, n)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      assert(got == want, s"n=$n")
    }
    // the planted ties actually surface in the ordering: for a vector
    // nearest cell 2, the duplicate (index 10) must rank directly after
    val full = df.select(GraftShim.column(NearestCellsIdx(
        GraftShim.expression(col("embedding")), tieCenters, 12)).as("c"))
      .collect().map(_.getSeq[Int](0).toList)
    assert(full.forall(l => l.indexOf(2) < l.indexOf(10) &&
      l.indexOf(7) < l.indexOf(11)), "stable tie-break violated")
  }

  test("ForestStepScore == the a1 scoring UDF on a fitted model") {
    val keys = Seq("alpha", "beta", "gamma")
    val forests = keys.map { k =>
      val pool = Array.fill(300)(Array(rnd.nextDouble() * 10))
      k -> GraftIsolationForest.compile1(
        GraftIsolationForest.fit(pool, numTrees = 20, sampleSize = 64, seed = 5L))
    }.toMap
    val rows = (0 until 500).map { i =>
      (i.toLong, if (i % 7 == 0) "unmodeled" else keys(i % 3),
        rnd.nextDouble() * 12 - 1)
    }
    val df = rows.toDF("id", "key", "v").repartition(3)
    val bc = spark.sparkContext.broadcast(forests)
    val udfForm = udf { (t: String, v: Double) =>
      val st = bc.value.getOrElse(t, null)
      if (st == null) 0.5 else st.score(v)
    }
    val want = df.withColumn("s", udfForm(col("key"), col("v")))
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val models = new StepModels(spark.sparkContext.broadcast(forests))
    val got = df.withColumn("s", GraftShim.column(ForestStepScore(
        GraftShim.expression(col("key")), GraftShim.expression(col("v")),
        models)))
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want)
    assert(want.exists(_._2 == 0.5), "unmodeled-key fallback not exercised")
  }

  test("PqEncode/PqCodeNorm/PqAdcDot == the s4 UDF trio, bit for bit") {
    val sample = Array.fill(600)(vec(64))
    val pq = ProductQuantizer.fit(sample, m = 8, k = 16, iters = 5, seed = 11L)
    val df = vectors.toDF("vec_id", "embedding").repartition(3)
    val queries = vectors.take(4)
    val kk = pq.k
    val qtabFlat: Map[Long, Array[Double]] = queries.map { case (id, v) =>
      val tab = pq.dotTable(v)
      val flat = new Array[Double](pq.m * kk)
      var si = 0
      while (si < pq.m) {
        System.arraycopy(tab(si), 0, flat, si * kk, kk); si += 1
      }
      id -> flat
    }.toMap
    // UDF reference forms (the r5/r6 code verbatim)
    val bc = spark.sparkContext.broadcast(pq)
    val bcTabs = spark.sparkContext.broadcast(qtabFlat)
    val encodeUdf = udf((v: Seq[Float]) => bc.value.encode(v))
    val cnUdf = udf((code: Array[Byte]) => math.sqrt(bc.value.normSq(code)))
    val adcUdf = udf { (qid: Long, code: Array[Byte]) =>
      val t = bcTabs.value(qid)
      var d = 0.0
      var i = 0
      while (i < code.length) { d += t(i * kk + (code(i) & 0xff)); i += 1 }
      d
    }
    val qids = queries.map(_._1).toDF("qid")
    val want = df.select(col("vec_id"), encodeUdf(col("embedding")).as("code"))
      .withColumn("cn", cnUdf(col("code")))
      .crossJoin(qids)
      .withColumn("adc", adcUdf(col("qid"), col("code")))
      .select("vec_id", "qid", "code", "cn", "adc").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Array[Byte]](2).toSeq, r.getDouble(3), r.getDouble(4)))).toMap
    def expr(c: org.apache.spark.sql.Column) = GraftShim.expression(c)
    val tabs = new AdcTables(qtabFlat, kk)
    val got = df.select(col("vec_id"),
        GraftShim.column(PqEncode(expr(col("embedding")), pq)).as("code"))
      .withColumn("cn", GraftShim.column(PqCodeNorm(expr(col("code")), pq)))
      .crossJoin(qids)
      .withColumn("adc", GraftShim.column(
        PqAdcDot(expr(col("qid")), expr(col("code")), tabs)))
      .select("vec_id", "qid", "code", "cn", "adc").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getAs[Array[Byte]](2).toSeq, r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == want)
  }

  test("PcaResidual == the a7 scoring UDF, bit for bit (r8)") {
    val df = vectors.toDF("vec_id", "embedding").repartition(3)
    val d = 64
    val mean = vec(d).map(_.toDouble)
    val pc = vec(d * 8).map(_.toDouble) // 8 axes, column-major like MLlib
    val udfForm = udf((v: Seq[Float]) => {
      val xc = new Array[Double](d)
      var i = 0
      while (i < d) { xc(i) = v(i) - mean(i); i += 1 }
      var tot = 0.0
      i = 0
      while (i < d) { tot += xc(i) * xc(i); i += 1 }
      var proj = 0.0
      var j = 0
      while (j * d < pc.length) {
        var p = 0.0
        i = 0
        while (i < d) { p += pc(j * d + i) * xc(i); i += 1 }
        proj += p * p
        j += 1
      }
      math.max(tot - proj, 0.0)
    })
    val want = df.withColumn("err", udfForm(col("embedding")))
      .select("vec_id", "err")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = df.withColumn("err", GraftShim.column(
        PcaResidual(GraftShim.expression(col("embedding")), mean, pc)))
      .select("vec_id", "err")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bit-identical, not approximately equal: same loops, same order
    vectors.foreach { case (id, _) =>
      assert(java.lang.Double.doubleToLongBits(got(id)) ==
        java.lang.Double.doubleToLongBits(want(id)), s"vec $id")
    }
    // interpreted (non-codegen) path agrees with codegen
    val expr = PcaResidual(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType), nullable = false),
      mean, pc)
    val v0 = vectors.head._2.toArray
    val row = org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v0))
    assert(expr.eval(row) == want(vectors.head._1))
  }

  test("MinHashEstJaccard == estJaccard, bit for bit (r8)") {
    val sigs = (0L until 200L).map { i =>
      val base = Array.fill(100)(rnd.nextLong() & 0xffffL)
      val other = base.clone()
      (0 until rnd.nextInt(100)).foreach(_ =>
        other(rnd.nextInt(100)) = rnd.nextLong() & 0xffffL)
      (i, base.toSeq, other.toSeq)
    }
    val df = sigs.toDF("id", "x", "y").repartition(3)
    val got = df.select(col("id"), GraftShim.column(MinHashEstJaccard(
        GraftShim.expression(col("x")), GraftShim.expression(col("y")))))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sigs.foreach { case (id, x, y) =>
      assert(got(id) ==
        graft.operators.DedupApprox.estJaccard(x.toArray, y.toArray), s"sig $id")
    }
    // length mismatch fails loudly
    val bad = Seq((1L, Seq(1L, 2L), Seq(1L))).toDF("id", "x", "y")
    val ex = intercept[Exception] {
      bad.select(GraftShim.column(MinHashEstJaccard(
        GraftShim.expression(col("x")), GraftShim.expression(col("y")))))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("signature lengths")))
  }

  test("corrupt input fails loudly (null embedding, short vector)") {
    val bad = Seq((1L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val exShort = intercept[Exception] {
      bad.withColumn("dc", GraftShim.column(
        NearestCentroid(GraftShim.expression(col("embedding")), centers)))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(exShort).exists(_.contains("malformed input vector")))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(1L, null))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType), nullable = true))))
    val exNull = intercept[Exception] {
      withNull.withColumn("cl", GraftShim.column(
        NearestCentroidIdx(GraftShim.expression(col("embedding")), centers)))
        .collect()
    }
    assert(msgs(exNull).exists(_.contains("null embedding")))
  }

  test("BloomMightContainLong == BloomFilter.mightContainLong, codegen and interpreted") {
    val keys = (0L until 5000L).filter(_ % 3 == 0)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(keys.size, 0.01)
    keys.foreach(bloom.putLong)
    val bc = spark.sparkContext.broadcast(bloom)
    val df = (0L until 5000L).toDF("k").repartition(3)
    val probe = GraftShim.column(
      BloomMightContainLong(GraftShim.expression(col("k")), bc))
    val got = df.withColumn("hit", probe)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // codegen path vs the library call directly
    (0L until 5000L).foreach { k =>
      assert(got(k) == bloom.mightContainLong(k), s"codegen mismatch at $k")
    }
    // no false negatives ever; false positives bounded well under 10x fpp
    assert(keys.forall(got(_)))
    val fp = (0L until 5000L).filterNot(_ % 3 == 0).count(got(_))
    assert(fp <= 500, s"implausible false-positive count $fp")
    // interpreted (non-codegen) path agrees
    val row = org.apache.spark.sql.catalyst.InternalRow(42L)
    val expr = BloomMightContainLong(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = false), bc)
    assert(expr.eval(row) == bloom.mightContainLong(42L))
    // null child -> null out (UnaryExpression default null intolerance)
    val nrow = org.apache.spark.sql.catalyst.InternalRow(null)
    val nexpr = BloomMightContainLong(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.LongType, nullable = true), bc)
    assert(nexpr.eval(nrow) == null)
  }
}
