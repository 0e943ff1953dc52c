package graft.operators

import graft.SparkSpec
import graft.functions.ExactAgg
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the shape AQE can't split for groupBy
  private lazy val skewed = spark.range(10000)
    .select(
      when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id"))
        .as("k"),
      ($"id" % 100).cast("double").as("v"))

  test("saltedAggregate == plain aggregate (sum/count, exact fixed-point)") {
    val salted = Skew.saltedAggregate(skewed, Seq("k"), salts = 8,
      partialAggs = Seq(sum(ExactAgg.ints($"v")).as("s"),
        count(lit(1)).as("n")),
      finalAggs = Seq((sum($"s").cast("double") / 100.0).as("sum_v"),
        sum($"n").as("n")))
    val plain = skewed.groupBy($"k")
      .agg(ExactAgg.sumFx($"v").as("sum_v"), count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin == plain join") {
    val dim = Seq(("hot", "H"), ("k10", "T")).toDF("k", "label")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), salts = 8)
      .groupBy($"label").agg(count(lit(1)).as("n"))
    val plain = skewed.join(dim, Seq("k"))
      .groupBy($"label").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
