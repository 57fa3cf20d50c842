package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr

/** The exact→approx percentile switch (VERDICT r3 item 7).
  *
  * Every percentile aggregate in the operator library (e6/e7/e17
  * robust stats, q9, a1/a3 contamination cuts) routes through
  * [[of]]: by default it plans Spark's exact `percentile` — the
  * DuckDB-oracle bit-exactness contract, which buffers a group's
  * values in the aggregation buffer — and with
  * `spark.graft.approxPercentile=true` it plans `approx_percentile`
  * (Greenwald–Khanna, mergeable, bounded memory) instead: the 100 TB
  * path every call site's scaladoc promises, as a session flag rather
  * than a code edit. `spark.graft.approxPercentileAccuracy` (default
  * 10000 → rank error ≤ n/10000) is the precision/memory dial.
  *
  * The flag is read at PLAN time from the session, so oracle runs
  * (Verify) stay exact by default while a scale deployment sets one
  * conf. Both paths share the identical plan shape (one map-side-
  * combined aggregate); the spec pins their agreement on planted and
  * real data.
  */
object Pct {

  val FlagKey = "spark.graft.approxPercentile"
  val AccuracyKey = "spark.graft.approxPercentileAccuracy"

  /** Tolerant flag read: only the canonical "true" (any case) enables
    * approx — a malformed value must not make every percentile
    * operator throw at plan time. */
  def approxEnabled(s: SparkSession): Boolean =
    s.conf.getOption(FlagKey).exists(_.trim.equalsIgnoreCase("true"))

  /** Accuracy dial, validated: positive integer or the 10000 default —
    * never interpolated unparsed into SQL. */
  private def accuracy(s: SparkSession): Int =
    s.conf.getOption(AccuracyKey)
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .filter(_ > 0)
      .getOrElse(10000)

  /** percentile(valueExpr, p) — exact by default, approx under the
    * session flag. `valueExpr` is a SQL expression string (a column
    * name or arithmetic over columns). */
  def of(s: SparkSession, valueExpr: String, p: Double): Column =
    if (approxEnabled(s))
      expr(s"approx_percentile($valueExpr, $p, ${accuracy(s)})")
    else expr(s"percentile($valueExpr, $p)")

  /** Array form — percentile(valueExpr, array(ps)) under the same
    * exact/approx switch (both builtins accept percentage arrays). */
  def ofArray(s: SparkSession, valueExpr: String, ps: Seq[Double]): Column = {
    val arr = ps.mkString("array(", ", ", ")")
    if (approxEnabled(s))
      expr(s"approx_percentile($valueExpr, $arr, ${accuracy(s)})")
    else expr(s"percentile($valueExpr, $arr)")
  }
}
