package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepetitionRulesSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String,
                  cfg: RepetitionRules.Config = RepetitionRules.Config()) =
    RepetitionRules.measures(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", cfg)
      .collect().head

  test("known repetition: fracs computed exactly") {
    // bigrams: "a b"×3 (6 chars), "b a"×2 (4 chars) → top 6/10
    // trigrams: "a b a"×2, "b a b"×2 → every gram duplicated → 1.0
    val r = one("a b a b a b")
    assert(r.getAs[String]("top_gram") == "a b")
    assert(r.getAs[Double]("top_gram_char_frac") == 0.6)
    assert(r.getAs[Double]("dup_gram_char_frac") == 1.0)
    assert(r.getAs[Long]("r_top_gram") == 0L)
    assert(r.getAs[Long]("r_dup_gram") == 0L)
    assert(r.getAs[Long]("keep") == 0L)
  }

  test("no repetition: dup frac 0, keep under default thresholds") {
    // all bigrams and trigrams unique; top bigram is the
    // lexicographically largest among count-1 grams ("e f", 2 of 10
    // chars = 0.2 > 0.10 default, so r_top_gram fails by threshold)
    val r = one("a b c d e f")
    assert(r.getAs[String]("top_gram") == "e f")
    assert(r.getAs[Double]("dup_gram_char_frac") == 0.0)
    assert(r.getAs[Long]("r_dup_gram") == 1L)
  }

  test("empty and sub-n docs take the sentinel / truncated-tail path") {
    val empty = one("")
    assert(empty.getAs[String]("top_gram") == "")
    assert(empty.getAs[Double]("top_gram_char_frac") == 0.0)
    assert(empty.getAs[Double]("dup_gram_char_frac") == 0.0)
    assert(empty.getAs[Long]("keep") == 1L)
    // one token: the truncated tail gram IS the token (same slice
    // semantics as TextFunctions.shingles) → the whole mass is one gram
    val single = one("hello")
    assert(single.getAs[String]("top_gram") == "hello")
    assert(single.getAs[Double]("top_gram_char_frac") == 1.0)
  }

  test("one row per input row over real data; flags are 0/1") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val m = RepetitionRules.measures(docs, "doc_id", "text")
    assert(m.count() == docs.count())
    val bad = m.filter(!col("keep").isin(0L, 1L) ||
      !col("r_top_gram").isin(0L, 1L) || !col("r_dup_gram").isin(0L, 1L))
    assert(bad.count() == 0)
  }

  test("plan: two aggregation exchanges, no join-back of the id universe") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = RepetitionRules.measures(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // repartition + (id, n, gram) agg + (id) agg — nothing else moves
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 hash exchanges, plan:\n$plan")
    assert(!plan.contains("Join"), s"sentinel should replace the join-back:\n$plan")
  }
}
