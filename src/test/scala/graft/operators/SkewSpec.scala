package graft.operators

import graft.SparkSpec
import graft.functions.ExactAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one key — the shape AQE can't split for groupBy
  private lazy val skewed = spark.range(10000)
    .select(
      $"id",
      when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id"))
        .as("k"),
      ($"id" % 100).cast("double").as("v"))

  private def saltedAgg: DataFrame =
    Skew.saltedAggregate(skewed, Seq("k"), saltBy = Seq($"id"), salts = 8,
      partialAggs = Seq(sum(ExactAgg.ints($"v")).as("s"),
        count(lit(1)).as("n")),
      finalAggs = Seq((sum($"s").cast("double") / 100.0).as("sum_v"),
        sum($"n").as("n")))

  test("saltedAggregate == plain aggregate (sum/count, exact fixed-point)") {
    val salted = saltedAgg.select($"k", $"sum_v", $"n")
    val plain = skewed.groupBy($"k")
      .agg(ExactAgg.sumFx($"v").as("sum_v"), count(lit(1)).as("n"))
      .select($"k", $"sum_v", $"n")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("saltedJoin == plain join") {
    val dim = Seq(("hot", "H"), ("k10", "T")).toDF("k", "label")
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"),
        saltBy = Seq($"id"), salts = 8)
      .groupBy($"label").agg(count(lit(1)).as("n"))
    val plain = skewed.join(dim, Seq("k"))
      .groupBy($"label").agg(count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads the hot key across buckets") {
    val buckets = skewed.filter($"k" === "hot")
      .select(Skew.saltColumn(Seq($"id"), 8).as("salt"))
      .distinct().count()
    assert(buckets === 8)
  }

  // The 100 TB contract: nothing nondeterministic may feed an exchange,
  // or a single fetch failure rolls back the whole indeterminate stage.
  // Assert over EVERY expression in both salted plans.
  test("salted plans contain no nondeterministic expression") {
    def nondet(df: DataFrame) =
      df.queryExecution.optimizedPlan.collect { case p =>
        p.expressions.flatMap(_.collect { case e if !e.deterministic => e })
      }.flatten
    val dim = Seq(("hot", "H")).toDF("k", "label")
    val joinDf = Skew.saltedJoin(skewed, dim, Seq("k"),
      saltBy = Seq($"id"), salts = 8)
    assert(nondet(saltedAgg).isEmpty, s"agg plan: ${nondet(saltedAgg)}")
    assert(nondet(joinDf).isEmpty, s"join plan: ${nondet(joinDf)}")
  }

  test("same input → same salt (retry reproducibility)") {
    val a = skewed.select($"id", Skew.saltColumn(Seq($"id"), 8).as("s"))
    val b = skewed.repartition(13)
      .select($"id", Skew.saltColumn(Seq($"id"), 8).as("s"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
