package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ml.GraftIsolationForest

/** Event row for typed per-key processing (encoder-friendly). */
case class EventRow(event_id: Long, user_id: Long, value: Double, secs: Long)

/** Keyed value with per-key baseline stats (CUSUM input). */
case class KeyedVal(key: String, event_id: Long, secs: Long, value: Double,
    mean: Double, sd: Double)

/** CUSUM drift alarm. */
case class CusumAlarm(event_id: Long, key: String, value: Double,
    side: String, stat: Double)

/** Scored EWMA output row. */
case class EwmaRow(event_id: Long, user_id: Long, value: Double,
    ewma: Double, resid: Double)

/** ML anomaly operators (SURVEY.md §2.C) — the reference's Isolation
  * Forest surface (app3_ML.py:143-182) rebuilt for Spark's execution
  * model: bounded deterministic per-entity sample → driver fit →
  * broadcast model → shuffle-free distributed scoring.
  */
object AnomalyML {

  /** a1_isoforest — per-event_type Isolation Forest scores over `value`,
    * flagging each key's contamination-quantile outliers (the
    * reference's IsolationForest(contamination=0.05) regime,
    * app3_ML.py:164-166): the cut is the per-key 95th percentile of the
    * key's own scores, self-calibrating as composition shifts — never a
    * fixed score constant. The quantile is one map-side-combined agg
    * broadcast back; `percentile` is the oracle-exactness choice — at
    * real scale swap `approx_percentile`, same plan shape.
    *
    * The training pool is a deterministic pseudo-random sample per key:
    * a cheap per-key count picks a hash-filter rate that leaves ≥ ~4k
    * rows/key, the filtered sliver is rank-limited to 1024/key, and only
    * that sliver ever shuffles — the full table never moves through the
    * low-cardinality key partitioning (which would funnel 100 TB into
    * #keys tasks), and the driver collect stays bounded at any scale. */
  def a1Isoforest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("event_type"), col("value"))
    val minCount = ev.groupBy("event_type").count()
      .agg(min("count")).collect()(0).getLong(0)
    val keep = math.max(1L, minCount / 4096)
    val w = Window.partitionBy("event_type").orderBy(xxhash64(col("event_id")), col("event_id"))
    val pool = ev.filter(pmod(xxhash64(col("event_id")), lit(keep)) === 0)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1024)
      .select(col("event_type"), col("value"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(r => Array(r.getDouble(1))) }
    val forests = pool.map { case (k, xs) =>
      k -> GraftIsolationForest.fit(xs.toArray, numTrees = 100, sampleSize = 256, seed = 42L)
    }
    val bc = s.sparkContext.broadcast(forests)
    val scoreUdf = udf((t: String, v: Double) =>
      bc.value.get(t).map(_.score(Array(v))).getOrElse(0.5))
    val scored = ev.withColumn("score", scoreUdf(col("event_type"), col("value")))
    val cuts = scored.groupBy("event_type")
      .agg(expr("percentile(score, 0.95)").as("if_cut"))
    scored.join(broadcast(cuts), "event_type")
      .filter(col("score") > col("if_cut"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("score"), 6).as("score"))
      .orderBy("event_id")
  }

  /** a3_kmeans_outlier — KMeans distance-to-centroid outliers over the
    * embeddings table (MLlib, k=10, fixed seed). A vector is flagged
    * when its distance to the nearest centroid exceeds mean + 2σ of all
    * such distances (computed distributively).
    *
    * Scale: MLlib KMeans is the distributed fit (k·dim-sized model),
    * centroids broadcast for scoring, and the fence aggregate is one
    * map-side-combined pass — no per-row driver work anywhere. */
  def a3KmeansOutlier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.spread(s, Tables.embeddings(s, dir))
      .select(col("vec_id"), col("embedding"),
        array_to_vector(col("embedding")).as("features"))
      .cache()
    // fit on a bounded deterministic sample, few partitions, random
    // init: centroid quality needs ~10⁴–10⁵ vectors regardless of
    // corpus size, and k-means|| init alone costs ~2 passes (several
    // jobs) over the input — random init + coalesce keeps the fit at
    // a handful of tiny jobs while scoring stays full-corpus
    val n = e.count()
    val trainFrac = math.min(1.0, 100000.0 / math.max(n, 1L))
    val train = Sampling.uniform(e, col("vec_id"), trainFrac)
      .select(col("features")).coalesce(8).cache()
    val model = new KMeans().setK(10).setSeed(42L).setMaxIter(10)
      .setInitMode("random").fit(train)
    train.unpersist()
    val centers = s.sparkContext.broadcast(model.clusterCenters.map(_.toArray))
    val distUdf = udf((v: Seq[Float]) => {
      var best = Double.MaxValue
      var bi = -1
      var c = 0
      while (c < centers.value.length) {
        val ctr = centers.value(c)
        var d = 0.0
        var i = 0
        while (i < ctr.length) {
          val diff = v(i) - ctr(i); d += diff * diff; i += 1
        }
        if (d < best) { best = d; bi = c }
        c += 1
      }
      (bi, math.sqrt(best))
    })
    val scored = e.withColumn("dc", distUdf(col("embedding")))
      .select(col("vec_id"), col("dc._1").as("cluster"), col("dc._2").as("dist"))
      .cache()
    // fence at the exact 98th percentile of centroid distance (the
    // synthetic clusters are tight enough that mean+2σ flags nothing);
    // at real scale swap percentile → approx_percentile, same plan shape
    val fence = scored.agg(expr("percentile(dist, 0.98)"))
      .collect()(0).getDouble(0)
    // materialize the (bounded: 2% of rows) result off the cache, then
    // drop both caches — they must not outlive the operator call in a
    // long-lived session (ADVICE r1). localCheckpoint blocks are freed
    // by the ContextCleaner once the result frame is unreferenced.
    val out = scored.filter(col("dist") > fence)
      .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
      .orderBy("vec_id")
      .localCheckpoint(true)
    scored.unpersist()
    e.unpersist()
    out
  }

  /** Two-sided CUSUM drift detection (Page, "Continuous inspection
    * schemes", Biometrika 1954) over any keyed value stream: per key,
    * S⁺ accumulates above-baseline deviation beyond a slack of k·σ and
    * alarms past h·σ (S⁻ symmetric below), resetting after each alarm.
    * CUSUM fires on sustained small shifts — the concept-drift signal
    * the reference's producer injects but its per-window Isolation
    * Forest silently adapts to instead of reporting.
    *
    * Baselines (per-key mean/σ) are one map-side-combined agg joined
    * back broadcast; the sequential scan is the same secondary-sort +
    * O(1)-state mapPartitions shape as a2 — no per-key materialization,
    * a hot key streams through. */
  def cusum(df: DataFrame, keyCol: Column, idCol: Column, tsCol: Column,
      valCol: Column, slackK: Double = 0.5, alarmH: Double = 5.0): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val base = df.select(keyCol.cast("string").as("key"), idCol.as("event_id"),
      tsCol.cast("long").as("secs"), valCol.cast("double").as("value"))
    val stats = base.groupBy("key")
      .agg(avg("value").as("mean"), stddev_pop(col("value")).as("sd"))
    base.join(broadcast(stats), "key")
      .select(col("key"), col("event_id"), col("secs"), col("value"),
        col("mean"), col("sd"))
      .repartition(col("key"))
      .sortWithinPartitions("key", "secs", "event_id")
      .as[KeyedVal]
      .mapPartitions { it =>
        var cur: String = null
        var pos = 0.0
        var neg = 0.0
        it.flatMap { r =>
          if (r.key != cur) { cur = r.key; pos = 0.0; neg = 0.0 }
          val slack = slackK * r.sd
          val h = alarmH * r.sd
          pos = math.max(0.0, pos + (r.value - r.mean - slack))
          neg = math.min(0.0, neg + (r.value - r.mean + slack))
          val out = Vector.newBuilder[CusumAlarm]
          if (r.sd > 0 && pos > h) {
            out += CusumAlarm(r.event_id, r.key, r.value, "up",
              math.rint(pos / r.sd * 1e6) / 1e6)
            pos = 0.0
          }
          if (r.sd > 0 && neg < -h) {
            out += CusumAlarm(r.event_id, r.key, r.value, "down",
              math.rint(-neg / r.sd * 1e6) / 1e6)
            neg = 0.0
          }
          out.result()
        }
      }
      .toDF()
      .orderBy("event_id", "side")
  }

  /** a4_cusum_drift — [[cusum]] bound to events.value per event_type.
    * [rows-only]: recursion-defined, spec-tested on planted drift. */
  def a4CusumDrift(s: SparkSession, dir: String): DataFrame =
    cusum(Tables.events(s, dir), col("event_type"), col("event_id"),
      col("ts"), col("value"))

  /** a2_ewma — EWMA smoothing (α=0.3) + residuals per user; the batch
    * twin of st3's streaming state.
    *
    * Scale shape: repartition on the key, secondary-sort within
    * partitions, then stream through rows with O(1) carried state —
    * never `flatMapGroups`+`toArray`, which materializes a whole key's
    * history in one task's heap (a hot key at 100 TB is an OOM, not a
    * skew statistic). Each task holds one row and one running mean. */
  def a2Ewma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val alpha = 0.3
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts").cast("long").as("secs"))
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "secs", "event_id")
      .as[EventRow]
      .mapPartitions { it =>
        var cur = Long.MinValue
        var ew = 0.0
        it.map { r =>
          if (r.user_id != cur) { cur = r.user_id; ew = r.value }
          val resid = r.value - ew
          ew = alpha * r.value + (1 - alpha) * ew
          EwmaRow(r.event_id, r.user_id, r.value, math.rint(ew * 1e6) / 1e6,
            math.rint(resid * 1e6) / 1e6)
        }
      }
      .toDF()
      .orderBy("event_id")
  }
}
