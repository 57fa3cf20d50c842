package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** As-of (temporal) join — an operator Spark has no native form of:
  * for each left row, attach the payload of the latest right row with
  * `right.ts <= left.ts` in the same key group.
  *
  * Spark-first shape (SURVEY.md §4 ladder (a): composition): tag both
  * sides, union by name, one per-key time-ordered window pass with
  * `last(payload, ignoreNulls)`, keep left rows. ONE shuffle on the
  * key — no range join explosion, no per-row lookup; at 100 TB this is
  * a single sort-within-partitions of the unioned stream. (A backward
  * range join would be O(|L|·matches); the window form is linear.)
  *
  * Determinism: right-side ties on (key, ts) resolve to the largest
  * `tieBreak` value; right rows sort before left at equal ts so
  * equal-timestamp payloads are visible (<=, not <).
  */
object AsOf {

  /** @param payload right-side columns to carry (emitted as asof_<name>)
    * @param tieBreak right-side column ordering same-ts right rows */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tieBreak: String): DataFrame = {
    val l = left.withColumn("__side", lit(0))
      .withColumn("__tb", lit(null).cast("long"))
    val r = right.select((key +: ts +: payload).map(col): _*)
      .withColumnRenamed2(payload)
      .withColumn("__side", lit(1))
      .withColumn("__tb", col(s"asof_$tieBreak"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows first at equal ts (__side desc), then tie-break order so
    // `last` picks the winning right row
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side").desc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"__v_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    val out = payload.foldLeft(withAsof) { (df, c) =>
      df.withColumn(s"asof_$c", col(s"__v_$c")).drop(s"__v_$c")
    }
    out.filter(col("__side") === 0)
      .drop("__side", "__tb")
  }

  private implicit class Renamer(df: DataFrame) {
    def withColumnRenamed2(cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"asof_$c"))
  }

  /** e11_asof — each event annotated with the most recent prior-or-equal
    * 'click' event (value + id) of the same user. */
  def e11Asof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("secs"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("secs"), col("value"), col("event_id"))
    join(ev, clicks, key = "user_id", ts = "secs",
      payload = Seq("value", "event_id"), tieBreak = "event_id")
      .select(col("event_id"), col("user_id"), col("secs"), col("value"),
        round(col("asof_value"), 6).as("click_value"),
        col("asof_event_id").as("click_id"))
      .orderBy("event_id")
  }

  val oracle: Map[String, String] = Map(
    "e11_asof" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS secs, value FROM events),
        |u AS (
        |  SELECT event_id, user_id, secs, value, 0 AS side,
        |         NULL::BIGINT AS tb, NULL::DOUBLE AS pv, NULL::BIGINT AS pid
        |  FROM ev
        |  UNION ALL
        |  SELECT NULL, user_id, secs, NULL, 1, event_id, value, event_id
        |  FROM ev WHERE event_type = 'click'),
        |f AS (SELECT *,
        |  LAST_VALUE(pv IGNORE NULLS) OVER w AS click_value,
        |  LAST_VALUE(pid IGNORE NULLS) OVER w AS click_id
        |  FROM u WINDOW w AS (PARTITION BY user_id
        |    ORDER BY secs, side DESC, tb ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, secs, value,
        |  COALESCE(CAST(TRY_CAST(CAST(click_value AS VARCHAR) AS DECIMAL(28,6)) AS DOUBLE), click_value) AS click_value, click_id
        |FROM f WHERE side = 0 ORDER BY event_id""".stripMargin
  )
}
