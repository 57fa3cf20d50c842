package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ml.{GraftIsolationForest, ProductQuantizer}

/** Broadcast-model scoring as native codegen expressions (r7, VERDICT
  * r5 item 5 / r6 item 4): the model-fit operators' hot scans (a1 step
  * lookup, a3/d11/s3 nearest-centroid, s4 PQ encode/ADC) previously
  * scored through Scala UDFs, whose converter layer deserializes every
  * `array<float>` embedding into a boxed Seq (64 Float boxes + a
  * builder per row) before the arithmetic even starts. These
  * expressions run the SAME loops (same float→double widening, same
  * accumulation order, same tie-breaks — bit-identical outputs, pinned
  * by ModelExprsSpec) directly over the columnar ArrayData, inside
  * whole-stage codegen, with zero per-row allocation beyond the
  * result. Small models (centroids, codebooks, ADC tables — KBs) ride
  * the plan via `ctx.addReferenceObj`; a1's per-key step functions
  * (MBs) stay a broadcast, handed over as a serializable wrapper. */
object ModelExprs

/** struct(cluster, dist) of the squared-L2-nearest centroid — the a3
  * scoring kernel (first-wins argmin, `bi` seeded −1 exactly like the
  * UDF it replaces; dist = √best). Fails loudly on null or
  * dimension-short embeddings (FailLoud discipline). */
case class NearestCentroid(child: Expression,
    centers: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist", DoubleType, nullable = false)))
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw NearestCentroid.nullInput()
    NearestCentroid.compute(a.asInstanceOf[ArrayData], centers)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.NearestCentroid.nullInput();
           |InternalRow ${ev.value} =
           |  graft.functions.NearestCentroid.compute(${c.value}, $ref);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def nullInput(): RuntimeException =
    new IllegalArgumentException(
      "NearestCentroid: null embedding — corrupt input row")

  def compute(x: ArrayData, centers: Array[Array[Double]]): InternalRow = {
    var best = Double.MaxValue
    var bi = -1
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      if (x.numElements() < ctr.length) throw new IllegalArgumentException(
        s"NearestCentroid: embedding dim ${x.numElements()} < centroid " +
          s"dim ${ctr.length} — malformed input vector")
      var d = 0.0
      var i = 0
      while (i < ctr.length) {
        val diff = x.getFloat(i) - ctr(i); d += diff * diff; i += 1
      }
      if (d < best) { best = d; bi = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](bi, math.sqrt(best)))
  }
}

/** Index of the squared-L2-nearest centroid — DriverKMeans.nearest's
  * exact loop (`best` seeded 0) over ArrayData; the d11 flat-assign
  * and s3 corpus-cell kernel. */
case class NearestCentroidIdx(child: Expression,
    centers: Array[Array[Double]]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw NearestCentroid.nullInput()
    NearestCentroidIdx.compute(a.asInstanceOf[ArrayData], centers)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.NearestCentroid.nullInput();
           |int ${ev.value} =
           |  graft.functions.NearestCentroidIdx.compute(${c.value}, $ref);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroidIdx {
  /** Mirrors graft.ml.DriverKMeans.nearest (same arithmetic, same
    * tie-break, same loud dim-mismatch failure) over ArrayData. */
  def compute(x: ArrayData, centers: Array[Array[Double]]): Int = {
    var best = 0
    var bd = Double.MaxValue
    var ci = 0
    while (ci < centers.length) {
      val ctr = centers(ci)
      if (x.numElements() < ctr.length) throw new IllegalArgumentException(
        s"NearestCentroidIdx: embedding dim ${x.numElements()} < centroid " +
          s"dim ${ctr.length} — malformed input vector")
      var d = 0.0
      var i = 0
      while (i < ctr.length) {
        val df = x.getFloat(i) - ctr(i); d += df * df; i += 1
      }
      if (d < bd) { bd = d; best = ci }
      ci += 1
    }
    best
  }
}

/** Indices of the n squared-L2-nearest centroids in ascending distance
  * order — s3's probe-side cell selection, replaying the UDF it
  * replaces EXACTLY: `zipWithIndex.map(dist).sortBy(_._1).take(n)
  * .map(_._2)` (a stable sort, so distance ties keep the lower cell
  * index first; n > k caps at k). The probe side is ≤k rows, so the
  * win is not time — it is the invariant this conversion completes
  * (VERDICT r8 item 4): zero Scala UDFs anywhere in main, which
  * PlanAuditSpec now asserts as a source-tree grep. Bit-equivalence vs
  * the old lambda (ties included) is pinned by ModelExprsSpec. */
case class NearestCellsIdx(child: Expression,
    centers: Array[Array[Double]], n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw NearestCentroid.nullInput()
    NearestCellsIdx.compute(a.asInstanceOf[ArrayData], centers, n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("centers", centers, "double[][]")
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.NearestCentroid.nullInput();
           |ArrayData ${ev.value} =
           |  graft.functions.NearestCellsIdx.compute(${c.value}, $ref, $n);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCellsIdx {
  /** Distances for all k cells, then repeated first-wins strict-min
    * selection — identical ordering to a stable sort by (distance,
    * index), without allocating tuples. */
  def compute(x: ArrayData, centers: Array[Array[Double]], n: Int): ArrayData = {
    val k = centers.length
    val dists = new Array[Double](k)
    var ci = 0
    while (ci < k) {
      val ctr = centers(ci)
      if (x.numElements() < ctr.length) throw new IllegalArgumentException(
        s"NearestCellsIdx: embedding dim ${x.numElements()} < centroid " +
          s"dim ${ctr.length} — malformed input vector")
      var d = 0.0
      var i = 0
      while (i < ctr.length) {
        val df = x.getFloat(i) - ctr(i); d += df * df; i += 1
      }
      dists(ci) = d
      ci += 1
    }
    val take = math.min(n, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      var bi = -1
      var bd = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        if (!used(c) && dists(c) < bd) { bd = dists(c); bi = c }
        c += 1
      }
      // strict '<' vs +Inf start: every remaining distance being +Inf
      // (overflowing embedding) or NaN (corrupt value) leaves bi at -1.
      // The stable-sort this loop replays total-orders those LAST, so a
      // selected non-finite means the input itself is bad — fail loud
      // with the cause, not an opaque ArrayIndexOutOfBounds.
      if (bi < 0) throw new IllegalArgumentException(
        s"NearestCellsIdx: rank-$r nearest cell has non-finite distance " +
          "(NaN/Inf) — embedding contains non-finite or overflowing values")
      used(bi) = true
      out(r) = bi
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** Two-level (coarse×fine) nearest-centroid index — d11's hierarchical
  * √k×√k assignment: coarse cell c, then `c·k2 + nearest(fine(c))`,
  * both levels DriverKMeans.nearest's loop. */
case class HierNearestIdx(child: Expression,
    coarse: Array[Array[Double]], fine: Array[Array[Array[Double]]],
    k2: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw NearestCentroid.nullInput()
    val x = a.asInstanceOf[ArrayData]
    val c = NearestCentroidIdx.compute(x, coarse)
    c * k2 + NearestCentroidIdx.compute(x, fine(c))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val co = ctx.addReferenceObj("coarse", coarse, "double[][]")
    val fi = ctx.addReferenceObj("fine", fine, "double[][][]")
    val cell = ctx.freshName("cell")
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.NearestCentroid.nullInput();
           |int $cell =
           |  graft.functions.NearestCentroidIdx.compute(${c.value}, $co);
           |int ${ev.value} = $cell * $k2 +
           |  graft.functions.NearestCentroidIdx.compute(${c.value}, $fi[$cell]);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Executor-side view of a1's broadcast per-key step functions: the
  * broadcast handle serializes as bytes; the UTF8String-keyed hash map
  * builds once per task from the broadcast value, so the per-row
  * lookup allocates nothing (no UTF8String→String decode). */
final class StepModels(
    bc: Broadcast[Map[String, GraftIsolationForest.Step1]])
    extends Serializable {
  @transient private lazy val m
      : java.util.HashMap[UTF8String, GraftIsolationForest.Step1] = {
    val h = new java.util.HashMap[UTF8String, GraftIsolationForest.Step1]()
    bc.value.foreach { case (k, v) => h.put(UTF8String.fromString(k), v) }
    h
  }
  def score(key: UTF8String, v: Double): Double = {
    val st = m.get(key)
    if (st == null) 0.5 else st.score(v)
  }
}

/** a1's compiled isolation-forest step lookup: score = one binary
  * search in the key's boundary table (0.5 for an unmodeled key — the
  * UDF's contract). */
case class ForestStepScore(left: Expression, right: Expression,
    models: StepModels) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(k: Any, v: Any): Any =
    models.score(k.asInstanceOf[UTF8String], v.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("models", models,
      classOf[StepModels].getName)
    nullSafeCodeGen(ctx, ev, (k, v) => s"${ev.value} = $ref.score($k, $v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** s4's PQ encode: nearest sub-centroid code per subspace
  * (ProductQuantizer.encode's loop) over ArrayData → m code bytes. */
case class PqEncode(child: Expression, pq: ProductQuantizer)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw NearestCentroid.nullInput()
    PqEncode.compute(a.asInstanceOf[ArrayData], pq)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("pq", pq, classOf[ProductQuantizer].getName)
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.NearestCentroid.nullInput();
           |byte[] ${ev.value} =
           |  graft.functions.PqEncode.compute(${c.value}, $ref);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** ProductQuantizer.encode's exact loop over ArrayData. */
  def compute(x: ArrayData, pq: ProductQuantizer): Array[Byte] = {
    if (x.numElements() < pq.m * pq.subDim)
      throw new IllegalArgumentException(
        s"PqEncode: embedding dim ${x.numElements()} < ${pq.m * pq.subDim}")
    val out = new Array[Byte](pq.m)
    var s = 0
    while (s < pq.m) {
      var best = Double.MaxValue
      var bi = 0
      var c = 0
      while (c < pq.k) {
        val ctr = pq.codebooks(s)(c)
        var d = 0.0
        var i = 0
        while (i < pq.subDim) {
          val diff = x.getFloat(s * pq.subDim + i) - ctr(i); d += diff * diff
          i += 1
        }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      out(s) = bi.toByte
      s += 1
    }
    out
  }
}

/** √(PQ-approximate squared norm) of a code — s4's cached corpus-side
  * norm (ProductQuantizer.normSq's per-subspace fold). */
case class PqCodeNorm(child: Expression, pq: ProductQuantizer)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any =
    math.sqrt(pq.normSq(a.asInstanceOf[Array[Byte]]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pq", pq, classOf[ProductQuantizer].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = java.lang.Math.sqrt($ref.normSq($a));")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-row serializable view of s4's per-query ADC tables (qid → flat
  * m×k dot table); `dot` is the adcUdf loop. */
final class AdcTables(tabs: Map[Long, Array[Double]], val kk: Int)
    extends Serializable {
  def dot(qid: Long, code: Array[Byte]): Double = {
    val t = tabs(qid)
    var d = 0.0
    var i = 0
    while (i < code.length) { d += t(i * kk + (code(i) & 0xff)); i += 1 }
    d
  }
}

/** s4's asymmetric-distance scan: 8 table lookups per (query, code)
  * pair against the per-query broadcast-free ADC tables. */
case class PqAdcDot(left: Expression, right: Expression,
    tabs: AdcTables) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(q: Any, c: Any): Any =
    tabs.dot(q.asInstanceOf[Long], c.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tabs", tabs, classOf[AdcTables].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.dot($q, $c);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Broadcast Bloom-membership probe over a long key — the semi-join
  * reduction filter (q3/q15): prune the fact's shuffle volume to the
  * keys that might match the filtered dimension BEFORE the exchange.
  * False positives just ride through to the real join (lossless);
  * negatives never lie. The filter rides the plan as a broadcast (at
  * sf100 the q3 key set is ~23M keys → ~27 MB — executor-shared, not
  * per-task), unwrapped ONCE per codegen instance into a mutable
  * field, so the per-row cost is the two hash probes alone. */
case class BloomMightContainLong(child: Expression,
    bloom: Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends UnaryExpression {
  override def dataType: DataType = BooleanType

  @transient private lazy val bf = bloom.value

  override def nullSafeEval(k: Any): Any =
    bf.mightContainLong(k.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfCls = classOf[org.apache.spark.util.sketch.BloomFilter].getName
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val bfTerm = ctx.addMutableState(bfCls, "graftBloom",
      v => s"$v = ($bfCls) $ref.value();")
    nullSafeCodeGen(ctx, ev,
      k => s"${ev.value} = $bfTerm.mightContainLong($k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** a7's PCA reconstruction error — err = ‖x−μ‖² − ‖Vᵀ(x−μ)‖²,
  * clamped at 0 (V orthonormal, so the subspace projection norm is all
  * that's needed; no reconstruction materialized). Runs the SAME loops
  * as the `errUdf` it replaces (same float→double widening via
  * `getFloat`, same center-then-total-then-project accumulation order,
  * same `math.max(·, 0.0)` clamp — bit-identical, pinned by
  * ModelExprsSpec) directly over columnar ArrayData inside whole-stage
  * codegen. The fitted model (d + d·k doubles — ~4 KB at d=64, k=8)
  * rides the plan via `ctx.addReferenceObj`. */
case class PcaResidual(child: Expression,
    mean: Array[Double], pc: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw NearestCentroid.nullInput()
    PcaResidual.compute(a.asInstanceOf[ArrayData], mean, pc)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val mRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val vRef = ctx.addReferenceObj("pcaPc", pc, "double[]")
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.NearestCentroid.nullInput();
           |double ${ev.value} =
           |  graft.functions.PcaResidual.compute(${c.value}, $mRef, $vRef);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcaResidual {
  /** The errUdf loop verbatim over ArrayData: center, total squared
    * norm, per-axis projection accumulation — identical fp order. */
  def compute(x: ArrayData, m: Array[Double], pv: Array[Double]): Double = {
    val d = m.length
    if (x.numElements() < d) throw new IllegalArgumentException(
      s"PcaResidual: embedding dim ${x.numElements()} < mean dim $d")
    val xc = new Array[Double](d)
    var i = 0
    while (i < d) { xc(i) = x.getFloat(i) - m(i); i += 1 }
    var tot = 0.0
    i = 0
    while (i < d) { tot += xc(i) * xc(i); i += 1 }
    var proj = 0.0
    var j = 0
    while (j * d < pv.length) {
      var p = 0.0
      i = 0
      while (i < d) { p += pv(j * d + i) * xc(i); i += 1 }
      proj += p * p
      j += 1
    }
    math.max(tot - proj, 0.0)
  }
}

/** d3's signature-estimated Jaccard — the fraction of equal positions
  * in two equal-length MinHash signatures (`DedupApprox.estJaccard`'s
  * exact loop over columnar ArrayData, same int-count / x.length
  * division). Runs per CANDIDATE pair (post-banding, volume bounded by
  * the LSH buckets), converted from a Scala UDF (r8) so the verify
  * stage joins the rest of the pair pipeline inside whole-stage
  * codegen instead of deserializing two 100-element Seq[Long] per
  * pair. */
case class MinHashEstJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(x: Any, y: Any): Any =
    MinHashEstJaccard.compute(
      x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.MinHashEstJaccard.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinHashEstJaccard {
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (y.numElements() != n) throw new IllegalArgumentException(
      s"MinHashEstJaccard: signature lengths $n vs ${y.numElements()}")
    var eq = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }
}
