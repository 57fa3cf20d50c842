package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev A/B behind the d16 blocking-stage decision (r13 session 3).
  *
  * The editPairs blocking stage (Dedup.editCandidates) was the one
  * candidate generator in the engine still paying BOTH of the costs
  * its siblings had already engineered away:
  *
  *  - its word-bigram explode ran as a TYPED Scala `flatMap` (object
  *    pipeline: deserialize (Long, String), split/sliding/Set per
  *    row, re-serialize) — and that flatMap subtree is referenced by
  *    the df-cap aggregate AND both self-join sides, so the object
  *    pass executes up to 3× per query (exchange reuse cannot
  *    deduplicate the aggregate branch);
  *  - its df-cap applied as groupBy().count() + join-back, which
  *    broadcasts the kept-bigram list (~hundreds of thousands of
  *    strings) where d13's window-over-one-exchange idiom needs no
  *    broadcast and no second pass.
  *
  * Arm A (OLD): typed flatMap + groupBy/join-back df-cap (the shipped
  * form through r13 session 2).
  * Arm B (WIN): the SAME typed flatMap, df-cap as a COUNT window over
  * the single hashpartitioning(g) exchange the self-join needs anyway
  * — the kept broadcast disappears. (MEASURED CAVEAT: exchange reuse
  * does NOT fire across these object-pipeline subtrees — the
  * flatMap + window still execute once per UNCACHED consumer, which
  * is what the cached arm exists to fix; at sf10 the uncached forms
  * read 2–5× the old peak execution memory.)
  * Arm C (EXPR): window df-cap + bigrams via native expressions
  * (split/zip_with/array_distinct/explode). Included to re-test the
  * Shingles.index lesson on this shape: array HOFs run INTERPRETED,
  * and the declarative shingle form measured 6× SLOWER there — if
  * that transfers, arm B wins and C is the recorded no-go.
  *
  * All arms read the SAME cached (doc_id, p) prefix frame, exactly
  * as the shipped operator does, so the A/B isolates the blocking
  * stage itself.
  *
  * Bit-exactness gate (run first, every invocation): the bigram
  * frames and the candidate-pair frames of both arms are compared by
  * two-sided EXCEPT ALL — 0 rows in all four diffs or the probe
  * aborts. The expression twin must replicate Scala `p.split(" ")`
  * (= Java split limit 0: trailing empties dropped, interior kept)
  * and Iterator.sliding(2)'s partial group on sub-2-word prefixes
  * (the whole prefix emitted as its own gram); Spark's 3-arg
  * split(p, " ", 0) delegates to Java regex split, so the semantics
  * match by construction and the EXCEPT gate proves it on data.
  *
  * Usage: scripts/run.sh graft.D16Probe [sfDir] [passes]
  */
object D16Probe {

  private val MaxDf = 20

  /** Arm A's bigram frame over the cached prefix frame, verbatim from
    * the pre-change operator. */
  private def oldBg(pfx: DataFrame): DataFrame = {
    val s = pfx.sparkSession
    import s.implicits._
    pfx.as[(Long, String)].flatMap { case (id, p) =>
        p.split(" ").iterator.sliding(2).map(_.mkString(" "))
          .toSet.iterator.map((g: String) => (id, g))
      }.toDF("doc_id", "g")
  }

  /** Arm C's bigram frame (native expressions). Spark's 3-arg split
    * does NOT implement Java's limit-0 trailing-empty trim (the first
    * probe run's gate caught grams with trailing spaces), so the trim
    * is replicated explicitly: trailing empties in the split are
    * exactly p's trailing spaces, except the all-spaces prefix (Java
    * drops ALL empties → no tokens) and the empty prefix (Java
    * special-cases to [""]). */
  private def newBg(pfx: DataFrame): DataFrame = {
    val wf = split(col("p"), " ", -1)
    val kTrail = length(col("p")) - length(rtrim(col("p"), " "))
    val n = when(col("p") === "", lit(1))
      .when(rtrim(col("p"), " ") === "", lit(0))
      .otherwise(size(wf) - kTrail)
    val ws = slice(wf, lit(1), n)
    val grams = when(n === 0, slice(wf, lit(1), lit(0)))
      .when(n === 1, array(element_at(ws, 1)))
      .otherwise(zip_with(
        slice(ws, lit(1), n - 1), slice(ws, lit(2), n - 1),
        (x, y) => concat(x, lit(" "), y)))
    pfx.select(col("doc_id"), explode(array_distinct(grams)).as("g"))
  }

  /** Arm A: groupBy/join-back df-cap + self-join (pre-change form). */
  private def oldCand(pfx: DataFrame): DataFrame = {
    val bg = oldBg(pfx)
    val kept = bg.groupBy("g").count()
      .filter(col("count") <= MaxDf).select("g")
    val bgk = bg.join(kept, "g")
    bgk.select(col("doc_id").as("a"), col("g"))
      .join(bgk.select(col("doc_id").as("b"), col("g")), "g")
      .filter(col("a") < col("b")).select("a", "b").distinct()
  }

  /** Window df-cap + self-join over any bigram frame. `joinHint`
    * (merge / shuffle_hash / "" = planner's choice) controls the
    * self-join strategy: the planner broadcasts one whole window
    * subtree at gate scale (recomputing the flatMap), while a shuffle
    * join keeps both sides as Exchange(g) subtrees. (Measured: the
    * ReuseExchange rule does NOT deduplicate them — canonical
    * equality fails across the object-pipeline subtrees — so every
    * UNCACHED arm executes the flatMap + window once per side; the
    * cached arm is the only single-execution form.) */
  private def winCandOf(bg: DataFrame, joinHint: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bgk0 = bg
      .withColumn("df_g", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("df_g") <= MaxDf)
      .select("doc_id", "g")
    val bgk = if (joinHint.isEmpty) bgk0 else bgk0.hint(joinHint)
    bgk.select(col("doc_id").as("a"), col("g"))
      .join(bgk.select(col("doc_id").as("b"), col("g")), "g")
      .filter(col("a") < col("b")).select("a", "b").distinct()
  }

  /** Arm B: typed flatMap bigrams + window df-cap. */
  private def winCand(pfx: DataFrame): DataFrame = winCandOf(oldBg(pfx))

  /** Arm C: expression bigrams + window df-cap. */
  private def exprCand(pfx: DataFrame): DataFrame = winCandOf(newBg(pfx))

  /** Arm D: arm B with the self-join forced to sort-merge. */
  private def smjCand(pfx: DataFrame): DataFrame =
    winCandOf(oldBg(pfx), "merge")

  /** Arm E: arm B with the self-join forced to shuffled-hash. */
  private def shjCand(pfx: DataFrame): DataFrame =
    winCandOf(oldBg(pfx), "shuffle_hash")

  /** Arm F: cache the windowed df-capped frame — the cache preserves
    * its hashpartitioning(g) output partitioning, so the hinted
    * self-join runs with ZERO further exchanges and the flatMap +
    * exchange execute exactly once. Returns (cached frame, cand);
    * caller unpersists. */
  private def cachedCand(pfx: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val bgkC = oldBg(pfx)
      .withColumn("df_g", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("df_g") <= MaxDf)
      .select("doc_id", "g")
      .cache()
    val bgk = bgkC.hint("shuffle_hash")
    val cand = bgk.select(col("doc_id").as("a"), col("g"))
      .join(bgk.select(col("doc_id").as("b"), col("g")), "g")
      .filter(col("a") < col("b")).select("a", "b").distinct()
    (bgkC, cand)
  }

  /** Arm G (r14, VERDICT r13 item 3): df-cap as a partial-agg groupBy
    * count + shuffle_hash LEFT SEMI join, over a CACHED uncapped
    * bigram frame. Fixes arm F's latent skew hazard: F's COUNT window
    * buffers each bigram's FULL posting list in one WindowExec task
    * BEFORE the df filter discards hot keys — a straggler whose size
    * grows with the corpus under Zipf bigram skew. Here the hot keys
    * are reduced MAP-SIDE by the partial aggregation (≤ P partial
    * rows each), the semi build side is the kept set (≤ 1 row per
    * bigram, partitioned — not broadcast), and the probe side streams
    * with no per-key buffering; no WindowExec touches an unfiltered
    * posting list. The cache moves from the capped index to the
    * uncapped bigram frame so the typed flatMap still runs once
    * (uncached, the agg branch and the semi branch would each compute
    * it — the r12 double-flatMap regression). Returns (cached frame,
    * cand); caller unpersists. */
  private def semiCand(pfx: DataFrame): (DataFrame, DataFrame) = {
    val bgC = oldBg(pfx).cache()
    val kept = bgC.groupBy("g").agg(count(lit(1)).as("df_g"))
      .filter(col("df_g") <= MaxDf).select("g")
    val bgk = bgC.join(kept.hint("shuffle_hash"), Seq("g"), "left_semi")
      .hint("shuffle_hash")
    val cand = bgk.select(col("doc_id").as("a"), col("g"))
      .join(bgk.select(col("doc_id").as("b"), col("g")), "g")
      .filter(col("a") < col("b")).select("a", "b").distinct()
    (bgC, cand)
  }

  /** Arm G2 (r14, the shipped candidate): arm G plus a SECOND cache on
    * the capped semi output, so the self-join sides read the tiny
    * capped index instead of re-running the 3M-row semi probe each
    * (arm G measured 1.8x of old at sf10 from exactly that). Cache
    * roles: bgC makes the typed flatMap run once across the agg and
    * probe branches (exchange reuse cannot dedupe object pipelines —
    * r13 measurement); bgkC makes the semi probe run once across the
    * two self-join sides. Returns (bg cache, capped cache, cand);
    * caller unpersists both. */
  private def semi2Cand(pfx: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val bgC = oldBg(pfx).cache()
    val kept = bgC.groupBy("g").agg(count(lit(1)).as("df_g"))
      .filter(col("df_g") <= MaxDf).select("g")
    val bgkC = bgC.join(kept.hint("shuffle_hash"), Seq("g"), "left_semi")
      .cache()
    val bgk = bgkC.hint("shuffle_hash")
    val cand = bgk.select(col("doc_id").as("a"), col("g"))
      .join(bgk.select(col("doc_id").as("b"), col("g")), "g")
      .filter(col("a") < col("b")).select("a", "b").distinct()
    (bgC, bgkC, cand)
  }

  /** Arm G3 (r14): no bigram cache at all — the typed flatMap runs
    * TWICE (once under the partial-agg count branch, once under the
    * probe branch), and only the capped semi output is cached for the
    * self-join sides. Rationale: the duplicated work is just
    * scan+flatMap (the agg branch exchanges map-side PARTIALS, not
    * rows — unlike the r12 join-back form, whose duplicate included
    * the full-row exchange), while arm G2's uncapped-bigram cache
    * build costs more than the flatMap it saves. Returns (capped
    * cache, cand); caller unpersists. */
  private def semi3Cand(pfx: DataFrame): (DataFrame, DataFrame) = {
    val bg = oldBg(pfx)
    val kept = bg.groupBy("g").agg(count(lit(1)).as("df_g"))
      .filter(col("df_g") <= MaxDf).select("g")
    val bgkC = bg.join(kept.hint("shuffle_hash"), Seq("g"), "left_semi")
      .cache()
    val bgk = bgkC.hint("shuffle_hash")
    val cand = bgk.select(col("doc_id").as("a"), col("g"))
      .join(bgk.select(col("doc_id").as("b"), col("g")), "g")
      .filter(col("a") < col("b")).select("a", "b").distinct()
    (bgkC, cand)
  }

  private def mustBeEmpty(name: String, df: DataFrame): Unit = {
    val n = df.limit(20).collect()
    if (n.nonEmpty) {
      n.foreach(r => System.err.println(s"[d16probe] DIFF $name: $r"))
      sys.error(s"d16probe: $name has ${n.length}+ rows — arms differ")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 6
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "1m"))
      .config("spark.io.compression.codec",
        GraftSession.shuffleCodecFor(sfDir))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = Tables.spread(spark, Tables.documents(spark, sfDir))
    // the shipped operator's cached prefix frame, shared by both arms
    val pfx = docs
      .select(col("doc_id"), substring(col("text"), 1, 40).as("p"))
      .cache()
    pfx.count()

    // ---- bit-exactness gate ------------------------------------------
    spark.sparkContext.setJobDescription("d16probe: bit-exactness gate")
    mustBeEmpty("old-bg minus expr-bg", oldBg(pfx).exceptAll(newBg(pfx)))
    mustBeEmpty("expr-bg minus old-bg", newBg(pfx).exceptAll(oldBg(pfx)))
    mustBeEmpty("old-cand minus win-cand",
      oldCand(pfx).exceptAll(winCand(pfx)))
    mustBeEmpty("win-cand minus old-cand",
      winCand(pfx).exceptAll(oldCand(pfx)))
    mustBeEmpty("old-cand minus expr-cand",
      oldCand(pfx).exceptAll(exprCand(pfx)))
    mustBeEmpty("expr-cand minus old-cand",
      exprCand(pfx).exceptAll(oldCand(pfx)))
    println("[d16probe] bit-exactness gate PASSED (bg and cand identical)")

    // ---- interleaved timing (same JVM, full blocking stage) ----------
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // arm F gate: cached form must match too
    val (g0, c0) = cachedCand(pfx)
    mustBeEmpty("old-cand minus cached-cand", oldCand(pfx).exceptAll(c0))
    mustBeEmpty("cached-cand minus old-cand", c0.exceptAll(oldCand(pfx)))
    g0.unpersist()
    println("[d16probe] cached-arm gate PASSED")
    // arm G gate: the semi-join df-cap must match too
    val (g1, c1) = semiCand(pfx)
    mustBeEmpty("old-cand minus semi-cand", oldCand(pfx).exceptAll(c1))
    mustBeEmpty("semi-cand minus old-cand", c1.exceptAll(oldCand(pfx)))
    g1.unpersist()
    println("[d16probe] semi-arm gate PASSED")
    // arm G2 gate
    val (g2a, g2b, c2) = semi2Cand(pfx)
    mustBeEmpty("old-cand minus semi2-cand", oldCand(pfx).exceptAll(c2))
    mustBeEmpty("semi2-cand minus old-cand", c2.exceptAll(oldCand(pfx)))
    g2b.unpersist(); g2a.unpersist()
    println("[d16probe] semi2-arm gate PASSED")
    // arm G3 gate
    val (g3, c3) = semi3Cand(pfx)
    mustBeEmpty("old-cand minus semi3-cand", oldCand(pfx).exceptAll(c3))
    mustBeEmpty("semi3-cand minus old-cand", c3.exceptAll(oldCand(pfx)))
    g3.unpersist()
    println("[d16probe] semi3-arm gate PASSED")
    // the skew exposure arm F's window carries: the largest single
    // bigram posting list a WindowExec task would buffer pre-filter
    val maxDf = oldBg(pfx).groupBy("g").count()
      .agg(max("count"), count(lit(1))).collect()(0)
    println(s"[d16probe] max single-bigram df = ${maxDf.getLong(0)} " +
      s"over ${maxDf.getLong(1)} distinct bigrams (cap $MaxDf)")

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "old" -> (() => oldCand(pfx)),
      "win" -> (() => winCand(pfx)),
      "expr" -> (() => exprCand(pfx)),
      "smj" -> (() => smjCand(pfx)),
      "shj" -> (() => shjCand(pfx)))
    val mins = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    (1 to passes).foreach { i =>
      val row = arms.map { case (name, f) =>
        spark.sparkContext.setJobDescription(s"d16probe: $name pass $i")
        val t = time(f())
        mins(name) = math.min(mins(name), t)
        f"$name $t%.3f s"
      } :+ {
        // arm F: cache build is part of the timed region; unpersist
        // between passes so each pass pays the full operator cost
        spark.sparkContext.setJobDescription(s"d16probe: cached pass $i")
        val (g, c) = cachedCand(pfx)
        val t = time(c)
        g.unpersist()
        mins("cached") = math.min(mins("cached"), t)
        f"cached $t%.3f s"
      } :+ {
        // arm G: same lifecycle discipline as arm F
        spark.sparkContext.setJobDescription(s"d16probe: semi pass $i")
        val (g, c) = semiCand(pfx)
        val t = time(c)
        g.unpersist()
        mins("semi") = math.min(mins("semi"), t)
        f"semi $t%.3f s"
      } :+ {
        // arm G2
        spark.sparkContext.setJobDescription(s"d16probe: semi2 pass $i")
        val (ga, gb, c) = semi2Cand(pfx)
        val t = time(c)
        gb.unpersist(); ga.unpersist()
        mins("semi2") = math.min(mins("semi2"), t)
        f"semi2 $t%.3f s"
      } :+ {
        // arm G3
        spark.sparkContext.setJobDescription(s"d16probe: semi3 pass $i")
        val (g, c) = semi3Cand(pfx)
        val t = time(c)
        g.unpersist()
        mins("semi3") = math.min(mins("semi3"), t)
        f"semi3 $t%.3f s"
      }
      println(s"[d16probe] pass $i  " + row.mkString("  "))
    }
    val base = mins("old")
    println(s"[d16probe] min-of-$passes  " +
      (arms.map(_._1) :+ "cached" :+ "semi" :+ "semi2" :+ "semi3").map { name =>
        f"$name ${mins(name)}%.3f s (${mins(name) / base}%.2f×)"
      }.mkString("  "))
    spark.stop()
  }
}
