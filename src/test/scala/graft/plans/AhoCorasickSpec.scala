package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Aho–Corasick blocklist kernel: the automaton's matched-id set must
  * equal plain per-pattern `contains` over every fixture — including
  * the nested-pattern shapes (prefix, suffix, two-word phrase,
  * overlapping occurrences) that exercise fail links and output
  * inheritance — and the expression must stay inside codegen.
  */
class AhoCorasickSpec extends SparkSpec {
  import spark.implicits._

  private def viaContains(text: String, pats: Seq[String]): Seq[Int] =
    if (text == null) null
    else pats.indices.filter(i => text.contains(pats(i)))

  private def run(rows: Seq[String], pats: Seq[String]): Seq[Seq[Int]] =
    rows.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), TextFunctions.blocklistMatches(col("t"), pats)
        .as("ids"))
      .orderBy(col("i"))
      .as[(Int, Seq[Int])].collect().map(_._2).toSeq

  test("differential vs contains on the documents fixture (q115 pattern set)") {
    val pats = Seq("merge join", "window", "spark", "scan", "art",
      "part", "zzznope")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = docs
      .select(col("doc_id"),
        TextFunctions.blocklistMatches(col("text"), pats).as("ids"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> viaContains(t, pats) }.toMap
    assert(got.size == want.size)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id: got ${got(id)}, want $w")
    }
    // the fixture must discriminate: some docs flag, some don't, and
    // the absent pattern never matches
    assert(want.values.exists(_.nonEmpty) && want.values.exists(_.isEmpty))
    assert(!want.values.exists(_.contains(6)))
  }

  test("nested patterns: suffixes report through fail links, overlaps all count") {
    // "art" is a suffix of "part"; "a"/"aa"/"aaa" nest; "ab" shares a
    // prefix chain with them
    val pats = Seq("a", "aa", "aaa", "ab", "art", "part")
    val rows = Seq("aaab", "part", "artful", "xyz", "paaart", "")
    assert(run(rows, pats) == rows.map(viaContains(_, pats)))
  }

  test("phrase spanning token boundary; unicode text; NULL text") {
    val pats = Seq("big deal", "deal", "é", "日本")
    val rows = Seq("a big deal here", "no de al", "café time",
      "日本語 text", null)
    val got = rows.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), TextFunctions.blocklistMatches(col("t"), pats)
        .as("ids"))
      .orderBy(col("i"))
      .as[(Int, Option[Seq[Int]])].collect().map(_._2).toSeq
    val want = rows.map(t => Option(viaContains(t, pats)))
    assert(got == want)
  }

  test("empty pattern and empty pattern LIST reject loudly at plan time") {
    val df = Seq("x").toDF("t")
    val e1 = intercept[Exception] {
      df.select(TextFunctions.blocklistMatches(col("t"), Seq("a", "")))
        .collect()
    }
    assert(e1.getMessage.contains("non-empty"), e1.getMessage)
    val e2 = intercept[Exception] {
      df.select(TextFunctions.blocklistMatches(col("t"), Seq.empty))
        .collect()
    }
    assert(e2.getMessage.contains("empty pattern list"), e2.getMessage)
  }

  test("non-foldable pattern argument rejects (automaton is plan-time)") {
    val df = Seq(("x", Seq("a"))).toDF("t", "p")
    val e = intercept[Exception] {
      df.select(call_function("graft_ac_match", col("t"), col("p")))
        .collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("kernel stays inside WholeStageCodegen") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(
      size(TextFunctions.blocklistMatches(col("text"),
        Seq("spark", "scan"))).as("n"))
    val stars = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stars.nonEmpty,
      out.queryExecution.executedPlan.toString)
    assert(stars.exists(_.toString.contains("graft_ac_match")),
      "the AC projection must sit INSIDE a codegen stage")
    // and the generated path computes the same as the interpreted one
    val n = out.agg(sum(col("n"))).head().getLong(0)
    assert(n > 0)
  }
}
