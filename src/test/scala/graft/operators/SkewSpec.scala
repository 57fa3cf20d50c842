package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedAgg equals plain aggregation on a skewed frame") {
    import spark.implicits._
    // 90% of rows on one hot key
    val df = spark.range(10000L)
      .select(when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7)).as("k"),
        (col("id") % 100).cast("double").as("v"))
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, Seq(col("k")), 16,
      Seq(sum("v").as("s"), count(lit(1)).as("n")),
      Seq(sum("s").as("s"), sum("n").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join on a skewed key") {
    import spark.implicits._
    val left = spark.range(5000L)
      .select(when(col("id") % 5 < 4, 1L).otherwise(col("id") % 50).as("k"),
        col("id").as("lv"))
    val right = spark.range(50L).select(col("id").as("k"), (col("id") * 10).as("rv"))
    val plain = left.join(right, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", 8)
      .select("k", "lv", "rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
