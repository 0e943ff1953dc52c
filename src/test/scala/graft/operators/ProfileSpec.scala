package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("approx quantiles track the exact rank-based answers") {
    // exact discrete quantiles per source (q47's definition: value at
    // rank ceil(q*n) in (n_tok, doc_id) order)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n_tok", $"doc_id")
    val exact = docs
      .select($"source", $"doc_id",
        graft.functions.TextFunctions.tokenCount($"text").as("n_tok"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")))
      .groupBy($"source")
      .agg(max(when($"rn" === ceil($"n" * 0.5).cast("long"), $"n_tok"))
        .as("p50"))
      .as[(String, Long)].collect().toMap
    val approx = Profile.tokenQuantilesApprox(docs, "source", "text")
      .select($"source", $"p50").as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    // GK sketch at accuracy 10k on ~25-doc groups is exact up to the
    // discrete-definition off-by-one (ceil vs interpolation-free pick)
    approx.foreach { case (src, v) =>
      assert(math.abs(v - exact(src)) <= math.max(1L, exact(src) / 10),
        s"$src: approx $v vs exact ${exact(src)}")
    }
  }

  test("plan: one aggregation exchange, no window, no per-group sort") {
    val plan = Profile.tokenQuantilesApprox(docs, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange:\n$plan")
    // partial sketches combine map-side (ObjectHashAggregate partial)
    assert(plan.contains("partial_percentile_approx"), plan)
  }
}
