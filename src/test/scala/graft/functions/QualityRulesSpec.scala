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

  test("funnel == driver-side reference from annotate flags") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = QualityRules.funnel(docs, "text")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    val names = Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_alpha_words", "r_stopwords")
    val flags = QualityRules.annotate(docs, "text")
      .select(names.map(col): _*).collect()
      .map(r => names.indices.map(i => r.getLong(i) == 1L))
    val total = flags.length
    assert(got.length == names.size)
    names.zipWithIndex.foreach { case (n, i) =>
      val (stage, rule, nf, na, nu, ns) = got(i)
      assert(stage == i + 1 && rule == n)
      assert(nf == flags.count(f => !f(i)), s"$n n_fail")
      assert(na == flags.count(f => f.take(i).forall(identity) && !f(i)),
        s"$n n_attrition")
      assert(nu == flags.count(f =>
        !f(i) && names.indices.forall(j => j == i || f(j))), s"$n n_unique_fail")
      assert(ns == flags.count(f => f.take(i + 1).forall(identity)),
        s"$n n_survive")
    }
    // conservation: total - total attrition == final survivors
    assert(total - got.map(_._4).sum == got.last._6)
    // the funnel genuinely discriminates on this corpus
    assert(got.last._6 > 0 && got.last._6 < total)
  }

  test("funnelOf: degenerate inputs (empty df, NULL flags, one rule)") {
    val empty = Seq.empty[(Long, Boolean)].toDF("id", "ok")
    val e = QualityRules.funnelOf(empty, Seq("r" -> col("ok")))
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(e.toSeq == Seq((1L, "r", 0L, 0L, 0L, 0L)))
    // NULL flag counts as FAIL
    val nulls = Seq((1L, Some(true)), (2L, None), (3L, Some(false)))
      .toDF("id", "ok")
    val n = QualityRules.funnelOf(nulls, Seq("r" -> col("ok")))
      .as[(Long, String, Long, Long, Long, Long)].collect().head
    assert(n == ((1L, "r", 2L, 2L, 2L, 1L)))
    intercept[IllegalArgumentException] {
      QualityRules.funnelOf(nulls, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      QualityRules.funnelOf(nulls, Seq("r" -> col("ok"), "r" -> col("ok")))
    }
  }

  test("funnel plan: one global agg exchange, no window/join/doc shuffle") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = QualityRules.funnel(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert("hashpartitioning\\(".r.findAllIn(plan).size == 0,
      s"no keyed shuffle — only the SinglePartition agg exchange:\n$plan")
    assert("Exchange SinglePartition".r.findAllIn(plan).size == 1, plan)
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
