package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val goodText = (("the quality of the data is good and " * 8) +
    "it works with that for this test run").trim // >50 words, stopwords, alpha

  test("measures: known values on crafted docs") {
    val df = Seq(
      (1L, goodText),
      (2L, "short doc"),                       // fails word count
      (3L, "#### #### #### " + goodText),      // symbol-heavy prefix
      (4L, "12 34 56 78 90 " + goodText),      // numeric tokens dilute alpha
      (5L, "")).toDF("doc_id", "text")
    val out = QualityRules.annotate(df, "text").orderBy($"doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(byId(1L).getAs[Long]("keep") == 1L)
    assert(byId(2L).getAs[Long]("r_word_count") == 0L)
    assert(byId(2L).getAs[Long]("keep") == 0L)
    assert(byId(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(byId(3L).getAs[Long]("r_symbol_ratio") == 0L)
    assert(byId(4L).getAs[Double]("alpha_word_frac") < 1.0)
    assert(byId(5L).getAs[Long]("n_words") == 0L)
    assert(byId(5L).getAs[Long]("keep") == 0L)
  }

  test("hoistFilter gate: tokenizes ONCE per row, same rows as naive filter") {
    import graft.plans.PlanShape
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val gated = PlanShape.hoistFilter(docs,
      Seq("__nrm" -> TextFunctions.normalizeText($"text"),
        "__toks" -> TextFunctions.tokens($"text")),
      QualityRules.keepOf($"text", $"__nrm", $"__toks"))
      .drop("__nrm", "__toks")
    // the barrier keeps the keep-predicate above the hoist projection:
    // one graft_norm_tokens in the whole plan, not one per measure
    val plan = gated.queryExecution.executedPlan.toString
    assert("graft_norm_tokens".r.findAllIn(plan).size == 1, plan)
    val naive = docs.filter(QualityRules.keep($"text"))
    assert(gated.count() == naive.count())
    assert(gated.exceptAll(naive).count() == 0)
  }

  test("keep == conjunction of all rule flags over real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = QualityRules.annotate(docs, "text")
    val bad = out.filter(
      (col("keep") === 1L) =!= (col("r_word_count") === 1L &&
        col("r_mean_word_len") === 1L && col("r_symbol_ratio") === 1L &&
        col("r_alpha_words") === 1L && col("r_stopwords") === 1L)).count()
    assert(bad == 0)
    // the rule set genuinely discriminates on this corpus
    val keeps = out.agg(sum("keep")).head().getLong(0)
    assert(keeps > 0 && keeps < docs.count())
  }
}
