package graft

import org.apache.spark.sql.{Column, DataFrame, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Add, Ascending,
  AttributeReference, CreateNamedStruct, Expression, If, Literal, Multiply,
  SortOrder, Subtract, UnspecifiedFrame, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.AggregateWindowFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType,
  StructField, StructType}

/** Dev A/B behind the a2 recurrence-form decision (r13, VERDICT r12
  * item 3) — measured NO-WIN, the typed `mapPartitions` pipeline
  * stays. Hypothesis was that a2's encoder round-trip (deserialize
  * EventRow / serialize EwmaRow per event) is what the host's
  * memory-contention class amplifies, so re-expressing the recurrence
  * as a declarative running-window aggregate ([[A2Probe.EwmaRun]] —
  * all-UnsafeRow, generated projections, zero object churn) should be
  * faster and contention-robust. Measured at sf0.1 (two interleaved
  * min-of-6 same-JVM runs, 2026-08-16, hiS ~1.5 window):
  * map 0.970 / win 1.165 (1.20×), then map 0.686 / win 0.780 (1.14×);
  * re-measured r13 on an IDLE box (load 0.10, min-of-6): map 0.559 /
  * win 0.558 (1.00×) — dead even when quiet, so the window form buys
  * nothing at best and loses 14–20% under the exact contention class
  * it was meant to dodge. The window form is never faster:
  * WindowExec's per-group
  * spill-backed row buffering + running-frame AggregateProcessor +
  * per-row struct result costs more than the 4-primitive-field
  * encoder it replaces, and it also gives up the O(1)-state hot-key
  * streaming the imperative form has. Bit-exactness of the rejected
  * arm WAS proven (100k rows, 0 mismatches vs the oracle-pinned
  * recurrence) — the rejection is purely on measured cost.
  * Usage: scripts/run.sh graft.A2Probe [sfDir] [passes]
  */
object A2Probe {

  /** The REJECTED window-aggregate arm: the a2 state machine — seed on
    * the key's first row, then ew' = α·v + (1−α)·ew — as declarative
    * `AggregateWindowFunction` update expressions over the running
    * frame. Bit-compatibility with the imperative twin: same runtime
    * doubles (`1 - alpha` computed exactly as the twin computes it,
    * NOT a 0.7 source literal — different double at the last ulp) and
    * same op order, so the emitted float sequence is identical. */
  final case class EwmaRun(value: Expression, alpha: Double)
      extends AggregateWindowFunction {

    private val beta = 1 - alpha

    override def children: Seq[Expression] = Seq(value)
    override def dataType: DataType = StructType(Seq(
      StructField("ew", DoubleType, nullable = false),
      StructField("resid", DoubleType, nullable = false)))

    private lazy val seen =
      AttributeReference("seen", BooleanType, nullable = false)()
    private lazy val ew =
      AttributeReference("ew", DoubleType, nullable = false)()
    private lazy val resid =
      AttributeReference("resid", DoubleType, nullable = false)()

    override def aggBufferAttributes: Seq[AttributeReference] =
      Seq(seen, ew, resid)

    override lazy val initialValues: Seq[Expression] =
      Seq(Literal(false), Literal(0.0), Literal(0.0))

    // MutableProjection evaluates every update expression against the
    // OLD buffer before writing any slot back, so ew/seen here are the
    // previous row's state — the recurrence reads cleanly
    override lazy val updateExpressions: Seq[Expression] = {
      val ewPre = If(seen, ew, value) // key's first row seeds ew := v
      Seq(
        Literal(true),
        Add(Multiply(Literal(alpha), value), Multiply(Literal(beta), ewPre)),
        Subtract(value, ewPre))
    }

    override lazy val evaluateExpression: Expression =
      CreateNamedStruct(Seq(Literal("ew"), ew, Literal("resid"), resid))

    override def prettyName: String = "ewma_run"

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(value = newChildren.head)
  }

  /** `struct(ew, resid)` of the running EWMA partitioned by `partBy`
    * in `orderBy` order. The `WindowExpression` is built directly
    * (the public `Column.over` path only wraps function-registry
    * columns, not raw library expressions — it hands the analyzer a
    * bare window function and fails WINDOW_FUNCTION_WITHOUT_OVER). */
  private def ewmaOver(value: Column, alpha: Double,
      partBy: Seq[Column], orderBy: Seq[Column]): Column =
    GraftShim.column(WindowExpression(
      EwmaRun(GraftShim.expression(value), alpha),
      WindowSpecDefinition(
        partBy.map(GraftShim.expression),
        orderBy.map(c => GraftShim.expression(c) match {
          case so: SortOrder => so
          case e => SortOrder(e, Ascending)
        }),
        UnspecifiedFrame)))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def winForm(): DataFrame = {
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"),
          col("ts").cast("long").as("secs"))
        .withColumn("st", ewmaOver(col("value"), 0.3,
          Seq(col("user_id")), Seq(col("secs"), col("event_id"))))
        .select(col("event_id"), col("user_id"), col("value"),
          (expr("rint(st.ew * 1e6)") / 1e6).as("ew"),
          (expr("rint(st.resid * 1e6)") / 1e6).as("resid"))
        .orderBy("event_id")
    }
    def mapForm(): DataFrame =
      graft.operators.AnomalyML.a2Ewma(spark, sfDir)

    // bit-exactness first: the window form is only a candidate at all
    // if it reproduces the imperative recurrence double-for-double
    val a = mapForm().collect()
    val b = winForm().collect()
    require(a.length == b.length, s"row counts differ: ${a.length} vs ${b.length}")
    val bad = a.zip(b).filterNot { case (x, y) => x == y }
    println(s"exactness: ${a.length} rows, ${bad.length} mismatches")
    bad.take(5).foreach { case (x, y) => println(s"  map=$x win=$y") }
    require(bad.isEmpty, "window form is NOT bit-identical — ineligible")

    val t = Map("map" -> mapForm _, "win" -> winForm _)
    val mins = collection.mutable.Map[String, Double]().withDefaultValue(1e9)
    for (p <- 1 to passes; (n, f) <- t.toSeq.sortBy(_._1)) {
      val t0 = System.nanoTime()
      f().queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      mins(n) = math.min(mins(n), dt)
      println(f"[$p] $n ${dt}%.3f s")
    }
    println(f"min map=${mins("map")}%.3f win=${mins("win")}%.3f " +
      f"ratio=${mins("win") / mins("map")}%.2f")
    spark.stop()
  }
}
