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
