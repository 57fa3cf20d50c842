package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Pct

/** Round-4 additions: the exact→approx percentile session switch
  * (VERDICT r3 item 7). The exact path is the DuckDB-oracle contract;
  * the approx path is the bounded-memory 100 TB form — these specs pin
  * that flipping the flag changes memory shape, not answers (within
  * the documented rank-accuracy bound).
  */
class Round4OpsSpec extends SparkSpec {

  private def withApprox[T](body: => T): T = {
    spark.conf.set(Pct.FlagKey, "true")
    try body finally spark.conf.set(Pct.FlagKey, "false")
  }

  test("Pct.of plans exact percentile by default and approx under the session flag") {
    import spark.implicits._
    val vals = (1 to 1000).map(i => ("g", i.toDouble)).toDF("k", "v")
    def run() = vals.groupBy("k").agg(
        Pct.of(spark, "v", 0.25).as("q1"),
        Pct.of(spark, "v", 0.5).as("med"),
        Pct.of(spark, "v", 0.95).as("p95"))
      .collect().head
    val exact = run()
    // exact = interpolated order statistics of 1..1000
    assert(exact.getDouble(1) == 250.75 && exact.getDouble(2) == 500.5 &&
      exact.getDouble(3) == 950.05)
    val approx = withApprox(run())
    // approx_percentile returns a member of the data with rank error
    // ≤ n/accuracy < 1 here — within one neighbor gap of the
    // interpolated exact value
    Seq(1, 2, 3).foreach { i =>
      assert(math.abs(approx.getDouble(i) - exact.getDouble(i)) <= 1.0,
        s"col $i: approx ${approx.getDouble(i)} vs exact ${exact.getDouble(i)}")
    }
    // flag restored: the default plan is exact again (oracle contract)
    assert(run() == exact)
  }

  test("q9 and e6 under the approx flag agree with the exact path within the bound") {
    val exactQ9 = Analytics.q9Percentile(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val approxQ9 = withApprox(Analytics.q9Percentile(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap)
    assert(approxQ9.keySet == exactQ9.keySet)
    approxQ9.foreach { case (k, (a1, a2, a3)) =>
      val (e1, e2, e3) = exactQ9(k)
      Seq((a1, e1), (a2, e2), (a3, e3)).foreach { case (a, e) =>
        assert(math.abs(a - e) / math.max(math.abs(e), 1.0) <= 0.02,
          s"group $k: approx $a vs exact $e")
      }
    }
    // e6's robust flags: the two paths may disagree only on boundary
    // events (rz within noise of the 3.5 cut) — the flag sets must
    // substantially overlap
    val exactIds = EventOps.e6Robust(spark, sf).select("event_id")
      .collect().map(_.getLong(0)).toSet
    val approxIds = withApprox(EventOps.e6Robust(spark, sf).select("event_id")
      .collect().map(_.getLong(0)).toSet)
    assert(exactIds.nonEmpty)
    val overlap = (exactIds & approxIds).size.toDouble /
      math.max((exactIds | approxIds).size, 1)
    assert(overlap >= 0.8, f"exact/approx flag overlap $overlap%.2f too low")
  }
}
