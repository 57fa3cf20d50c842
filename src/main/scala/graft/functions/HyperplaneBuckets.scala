package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All 16 random-hyperplane LSH bucket ids of an `array<float>`
  * embedding in one codegen pass — `result[t]` is table t's bucket
  * (Charikar STOC 2002 SimHash for cosine; same plane family s2/s6
  * always used, seeded per (table, bit) so the plane set is
  * independent of the bits dial).
  *
  * This replaces the typed `flatMap`+encoder bucket explode, which was
  * the REAL cost of s2/s6 at scale: `.as[(Long, Seq[Float], Double)]`
  * deserializes every embedding into a boxed Seq and the flatMap's
  * SerializeFromObject re-encodes the 64-float payload per EMITTED
  * bucket row through per-element `mapobjects` — at sf10 that is
  * 1.28M interpreted 64-element round-trips, measured 39.8 s of the
  * old s2's 41.8 s total (the hash join itself was ~2 s). As a native
  * expression + posexplode the bucketing stays columnar end-to-end
  * (the vector payload is copied as raw UnsafeArrayData bytes, never
  * element-walked): s2 42 → 1.7 s at sf10; s6 (which reuses this via
  * scoredPairs, where the ~50M-triple distinct also weighs) read
  * 17.5 → 11.0 s for this change alone; the standing re-based s6
  * figure after the full r5 rework is 13.7 s at sf10.
  * Bit-identical buckets (same double arithmetic, pinned by
  * KnnGraphEquivSpec + the s2/s6 recall and equivalence suites). */
case class HyperplaneBuckets(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // A null embedding is CORRUPTION, not data: the downstream
  // posexplode would silently drop the row from s2/s6/d11 results
  // (the old typed-flatMap path failed loudly on null). Fail loudly
  // instead of propagating null. Pinned by HyperplaneBucketsNullSpec.
  override def nullable: Boolean = false

  override def nullSafeEval(a: Any): Any =
    HyperplaneBuckets.compute(a.asInstanceOf[ArrayData], bits)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw HyperplaneBuckets.nullInput()
    HyperplaneBuckets.compute(a.asInstanceOf[ArrayData], bits)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.HyperplaneBuckets.nullInput();
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  graft.functions.HyperplaneBuckets.compute(${c.value}, $bits);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  val Tables8 = 16
  // plane budget: adaptiveBits caps here, so this bounds the corpus
  // size the bucket geometry stays linear at (bits = log2(n/64) ⇒
  // 12 bits saturated at ~262k vectors — the sf100 sweep measured s6's
  // decade exponent drift to ~1.3 from exactly that; 20 bits holds the
  // 64-target bucket size to ~67M vectors per partition-of-corpus).
  // Safe to raise: each (table, bit) plane has its own seeded stream,
  // so existing signatures never re-deal (see `planes`), and bits only
  // change where adaptiveBits already exceeded the old cap (n > 262k —
  // beyond every oracle scale point).
  val MaxBits = 20
  val Dim = 64

  /** Called from generated code too — keep it a plain static factory. */
  def nullInput(): RuntimeException = new IllegalStateException(
    "HyperplaneBuckets: null embedding — corrupt input row (a null here " +
      "would be silently dropped by the downstream posexplode)")

  /** Each (table, bit) plane draws from its OWN seeded stream, so the
    * plane set is independent of MaxBits — growing the plane budget
    * can never silently re-deal the hyperplanes an existing signature
    * / recall floor was validated against (it did once, when a shared
    * sequential RNG was re-shaped; this fixes the class). */
  private[graft] lazy val planes: Array[Array[Array[Double]]] =
    Array.tabulate(Tables8, MaxBits) { (t, b) =>
      val rng = new scala.util.Random(99L + t * 1000L + b)
      Array.fill(Dim)(rng.nextGaussian())
    }

  def col(embedding: Column, bits: Int): Column =
    GraftShim.column(HyperplaneBuckets(GraftShim.expression(embedding), bits))

  /** Bucket ids for all 16 tables — the double arithmetic is exactly
    * the original Seq-based fold (Σ plane(i)·v(i) left to right,
    * bucket bit set when dp ≥ 0). */
  def compute(v: ArrayData, bits: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](Tables8)
    var t = 0
    while (t < Tables8) {
      var bucket = 0
      var b = 0
      while (b < bits) {
        val p = planes(t)(b)
        var dp = 0.0
        var i = 0
        while (i < Dim && i < n) { dp += p(i) * v.getFloat(i); i += 1 }
        if (dp >= 0) bucket |= (1 << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
