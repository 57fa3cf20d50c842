package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused token∈set operators over space-tokenized text — the codegen
  * replacements for the interpreted `filter`/`transform` array-HOF
  * stacks (Spark's higher-order functions are CodegenFallback: every
  * element pays a boxed lambda evaluation, and `split` materializes a
  * words array per row first).
  *
  * Tokenization is the byte-level twin of `split(text, " ")`: split on
  * the single byte 0x20, which is exact for UTF-8 (a continuation byte
  * can never equal an ASCII space), empty tokens included — so member
  * counts and rewrites are bit-identical to the HOF forms (pinned by
  * TokenSetOpsSpec on crafted/unicode/property inputs and by the
  * unchanged t2/t7 DuckDB oracles). Set membership probes a transient
  * HashSet of UTF8String token views (`fromBytes(bytes, start, len)`
  * wraps without copying); the set object rides into generated code
  * via `addReferenceObj`, so both expressions stay inside whole-stage
  * codegen. */
object TokenSetOps {

  def countIn(text: Column, tokens: Seq[String]): Column =
    GraftShim.column(TokenSetCount(GraftShim.expression(text), tokens))

  def scrub(text: Column, vocab: Seq[String], unk: String): Column =
    GraftShim.column(TokenScrub(GraftShim.expression(text), vocab, unk))

  private[functions] def buildSet(tokens: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](tokens.size * 2)
    tokens.foreach(t => s.add(UTF8String.fromString(t)))
    s
  }
}

/** Number of space-delimited tokens of `child` that are members of
  * `tokens` — the value of
  * `size(filter(split(text, " "), w -> w.isInCollection(tokens)))`.
  * (t2's stopword count — also riding under i8/i9/st19 via
  * qualityCols — and, subtracted from `size(split(...))`, t7's OOV
  * count.) */
case class TokenSetCount(child: Expression, tokens: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType

  @transient private lazy val set = TokenSetOps.buildSet(tokens)

  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var c = 0
    var start = 0
    while (start <= n) {
      var end = start
      while (end < n && bytes(end) != 0x20) end += 1
      if (set.contains(UTF8String.fromBytes(bytes, start, end - start))) c += 1
      start = end + 1
    }
    c
  }

  override def nullSafeEval(a: Any): Any = count(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetCount", this,
      classOf[TokenSetCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The scrubbed text of `child` against `vocab` — the value of
  * `array_join(transform(split(text, " "),
  *             w -> when(w.isInCollection(vocab), w).otherwise(unk)), " ")`
  * (t7's OOV rewrite): every token not in the vocabulary — including
  * empty tokens from space runs, exactly like the HOF form — is
  * replaced by `unk`, and tokens are re-joined with single spaces. */
case class TokenScrub(child: Expression, vocab: Seq[String], unk: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  @transient private lazy val set = TokenSetOps.buildSet(vocab)
  @transient private lazy val unkBytes =
    unk.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def scrub(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(n + 16)
    var start = 0
    while (start <= n) {
      var end = start
      while (end < n && bytes(end) != 0x20) end += 1
      if (start > 0) out.write(0x20)
      if (set.contains(UTF8String.fromBytes(bytes, start, end - start)))
        out.write(bytes, start, end - start)
      else out.write(unkBytes)
      start = end + 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  override def nullSafeEval(a: Any): Any = scrub(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenScrub", this,
      classOf[TokenScrub].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.scrub($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Number of space-delimited tokens — the value of
  * `size(split(text, " "))`. A literal single-char split makes every
  * 0x20 byte a separator (empty tokens included, trailing ones kept
  * by Spark's limit=-1), so the token count is exactly
  * spaces + 1 — one byte scan instead of the regex engine + array
  * allocation `split` pays. Bit-identical (TokenSetOpsSpec). */
case class SpaceTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any =
    SpaceTokens.count(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpaceTokens.count($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpaceTokens {
  def col(text: Column): Column =
    GraftShim.column(SpaceTokens(GraftShim.expression(text)))

  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    var c = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) c += 1; i += 1 }
    c
  }
}
