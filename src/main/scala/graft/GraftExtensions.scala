package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types.StringType

import graft.functions.{MdHash64, VecCosine, VecDot, VecNormSq}

/** `SparkSessionExtensions` hook exposing graft's native expressions to
  * SQL users:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * // or: spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  */
object GraftExtensions {
  /** Register graft's SQL functions on an already-built session (for
    * sessions not constructed through GraftSession/withExtensions). */
  def registerInto(s: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftShim.registerFunction(s, "vec_dot",
      args => VecDot(args(0), args(1)))
    org.apache.spark.sql.GraftShim.registerFunction(s, "vec_norm_sq",
      args => VecNormSq(args(0)))
    org.apache.spark.sql.GraftShim.registerFunction(s, "vec_cosine",
      args => VecCosine(args(0), args(1)))
    org.apache.spark.sql.GraftShim.registerFunction(s, "graft_mdhash64",
      args => MdHash64(Cast(args(0), StringType)))
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VecDot].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm_sq"),
      info("vec_norm_sq", "vec_norm_sq(a) - squared L2 norm of a float array"),
      (args: Seq[Expression]) => VecNormSq(args(0))))
    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity, one fused pass"),
      (args: Seq[Expression]) => VecCosine(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_mdhash64"),
      info("graft_mdhash64",
        "graft_mdhash64(x) - portable 60-bit md5-prefix hash (DuckDB-reproducible)"),
      (args: Seq[Expression]) => MdHash64(Cast(args(0), StringType))))
  }
}
