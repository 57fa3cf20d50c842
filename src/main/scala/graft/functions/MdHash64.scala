package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of graft's portable hash (PortableHash: the first 15 hex
  * chars of md5 as a 60-bit int64, bit-identical to DuckDB's
  * `('0x'||substr(md5(x),1,15))::BIGINT`).
  *
  * The SQL-composable chain `conv(substr(md5(x),1,15),16,10)` allocates
  * three strings per row (hex, substring, decimal) and re-parses what
  * the digest already produced as bytes; this expression digests the
  * UTF-8 bytes once and folds the first 7.5 bytes straight into the
  * long — same value, zero intermediate strings, and it participates in
  * whole-stage codegen via a static call. Equivalence is pinned by the
  * PipelineOpsSpec driver recomputation and every portable-hash DuckDB
  * oracle.
  *
  * Input typing: constructed only by PortableHash over string columns
  * (see VecExprs.scala on why ExpectsInputTypes is unavailable here).
  */
case class MdHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    MdHash64.hash(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MdHash64.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MdHash64 {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** md5(utf8 bytes), first 8 bytes big-endian, >>> 4 — equals parsing
    * the first 15 hex chars of the lowercase digest in base 16. */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }
}

/** Fused min-over-gram-hashes: the value of
  * `array_min(transform(sequence(0, greatest(length(t)-gram, 0)),
  *            i -> MdHash64(substr(t, i+1, gram))))`
  * as a single pass over the string's UTF-8 bytes.
  *
  * The composed HOF form materializes one UTF8String substring copy,
  * one `getBytes` copy, and one fresh 16-byte digest array PER GRAM,
  * plus the full hash array that `array_min` then re-scans — on a
  * document of c characters that is ~4c allocations to produce one
  * long. This expression digests each gram window in place
  * (`MessageDigest.update(bytes, off, len)` into a thread-local output
  * buffer) and folds the running min, so the only per-document
  * allocation is the one `getBytes` copy (plus a char-offset table on
  * non-ASCII input). Gram boundaries are CHARACTER-based exactly like
  * `substr`, using the same `UTF8String.numBytesForFirstByte`
  * segmentation, so values are bit-identical to the composed form —
  * pinned by the MinGramHashSpec unicode equivalence suite and the t4
  * DuckDB oracle, which is unchanged. */
case class MinGramHash(child: Expression, gram: Int) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    MinGramHash.hashMin(a.asInstanceOf[UTF8String], gram)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinGramHash.hashMin($c, $gram);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinGramHash {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val outBufs = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](16))

  /** Hash of bytes[off, off+len) — same fold as [[MdHash64.hash]]. */
  private def hashRange(md: MessageDigest, out: Array[Byte],
      bytes: Array[Byte], off: Int, len: Int): Long = {
    md.reset()
    md.update(bytes, off, len)
    md.digest(out, 0, 16)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (out(i) & 0xffL); i += 1 }
    h >>> 4
  }

  def hashMin(s: UTF8String, gram: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = digests.get()
    val out = outBufs.get()
    var ascii = true
    var j = 0
    while (ascii && j < n) { if (bytes(j) < 0) ascii = false; j += 1 }
    if (ascii) {
      // byte offsets == char offsets
      if (n <= gram) return hashRange(md, out, bytes, 0, n)
      var min = Long.MaxValue
      var i = 0
      val last = n - gram
      while (i <= last) {
        val h = hashRange(md, out, bytes, i, gram)
        if (h < min) min = h
        i += 1
      }
      min
    } else {
      // char-start byte offsets via the same segmentation substr uses
      val offsets = new Array[Int](n + 1)
      var numChars = 0
      var off = 0
      while (off < n) {
        offsets(numChars) = off
        off += UTF8String.numBytesForFirstByte(bytes(off))
        numChars += 1
      }
      offsets(numChars) = n
      if (numChars <= gram) return hashRange(md, out, bytes, 0, n)
      var min = Long.MaxValue
      var i = 0
      val last = numChars - gram
      while (i <= last) {
        val a = offsets(i)
        val h = hashRange(md, out, bytes, a, math.min(offsets(i + gram), n) - a)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }
}

/** d4's 60-bit portable SimHash as a single in-place digest pass (r8,
  * VERDICT r7 item 3 — the last full-corpus UDF scan): bit b of the
  * signature is the sign of Σ over word occurrences of ±1 by bit b of
  * the word's portable MD5 hash. The per-doc Scala UDF it replaces
  * (`DedupApprox.simhashPortable`, kept as the spec's self-oracle) paid
  * a UTF8String→String conversion, a regex `split(" ")`, and one
  * String + byte[] allocation per word; this expression walks the
  * document's UTF-8 bytes once, digesting each word window in place
  * (`MessageDigest.update(bytes, off, len)` — the [[MinGramHash]]
  * machinery) inside whole-stage codegen.
  *
  * Word segmentation replays Java `String.split(" ")` EXACTLY — empty
  * segments between consecutive/leading separators are kept and
  * digested, trailing empty segments are dropped, and the empty string
  * yields one empty word. A space is a single ASCII byte that never
  * occurs inside a UTF-8 multibyte sequence, so byte-level splitting is
  * identical to char-level. Bit-equivalence vs the Scala twin is pinned
  * by DedupApproxSpec (ASCII + unicode + degenerate-whitespace cases)
  * and the d4 DuckDB oracle, which is unchanged. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // Fail loudly on null text (ADVICE r8): the UDF this replaced NPE'd in
  // simhashPortable(null); a null-propagating expression would instead
  // yield a null signature that the band explode silently drops —
  // losing the document from the dedup. Same FailLoud discipline as
  // PcaResidual / NearestCentroid.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) throw SimHash60.nullInput()
    SimHash60.compute(a.asInstanceOf[UTF8String])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
           |if (${c.isNull}) throw graft.functions.SimHash60.nullInput();
           |long ${ev.value} = graft.functions.SimHash60.compute(${c.value});
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def nullInput(): RuntimeException =
    new IllegalArgumentException(
      "SimHash60: null text — corrupt input row")

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val outBufs = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](16))

  /** ±1-vote a word window's 60-bit portable hash into acc. */
  private def vote(md: MessageDigest, out: Array[Byte],
      bytes: Array[Byte], off: Int, len: Int, acc: Array[Int]): Unit = {
    md.reset()
    md.update(bytes, off, len)
    md.digest(out, 0, 16)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (out(i) & 0xffL); i += 1 }
    h = h >>> 4
    var b = 0
    while (b < 60) {
      if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
      b += 1
    }
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = digests.get()
    val out = outBufs.get()
    val acc = new Array[Int](60)
    if (n == 0) {
      // "".split(" ") == Array("") — one empty word
      vote(md, out, bytes, 0, 0, acc)
    } else {
      // drop trailing empty segments: scan only up to the last
      // non-space byte (all-space input → zero words)
      var end = n
      while (end > 0 && bytes(end - 1) == ' ') end -= 1
      if (end > 0) {
        var start = 0
        var i = 0
        while (i < end) {
          if (bytes(i) == ' ') {
            vote(md, out, bytes, start, i - start, acc)
            start = i + 1
          }
          i += 1
        }
        vote(md, out, bytes, start, end - start, acc)
      }
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (acc(b) >= 0) sig |= (1L << b); b += 1 }
    sig
  }
}
