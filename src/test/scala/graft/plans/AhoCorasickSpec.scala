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
    // an empty literal list types as ARRAY<VOID> and now fails the
    // ANALYSIS type check (BinaryExpression modeling), before the
    // automaton's own non-empty require could even run
    val e2 = intercept[Exception] {
      df.select(TextFunctions.blocklistMatches(col("t"), Seq.empty))
        .collect()
    }
    assert(e2.getMessage.contains("ARRAY<STRING>") ||
      e2.getMessage.contains("empty pattern list"), e2.getMessage)
  }

  test("non-foldable pattern argument rejects (automaton is plan-time)") {
    val df = Seq(("x", Seq("a"))).toDF("t", "p")
    val e = intercept[Exception] {
      df.select(call_function("graft_ac_match", col("t"), col("p")))
        .collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  // ---- span output (graft_ac_spans) ----

  /** Reference: per-pattern position scan, sorted (start, end, id) —
    * the semantics the automaton's one-pass span emission must equal.
    */
  private def spansRef(text: String, pats: Seq[String])
      : Seq[(Int, Int, Int)] =
    pats.indices.flatMap { id =>
      val p = pats(id)
      Iterator.unfold(text.indexOf(p)) { i =>
        if (i < 0) None else Some((i, text.indexOf(p, i + 1)))
      }.map(st => (st, st + p.length, id)).toSeq
    }.sorted.map { case (st, en, id) => (id, st, en) }

  test("spans: differential vs position scan incl. nested/overlapping") {
    val pats = Seq("a", "aa", "aaa", "ab", "art", "part")
    val rows = Seq("aaab", "part", "artful art", "xyz", "paaart", "",
      "aaaa")
    val got = rows.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), TextFunctions.blocklistSpans(col("t"), pats)
        .as("sp"))
      .orderBy(col("i"))
      .as[(Int, Seq[(Int, Int, Int)])].collect().map(_._2).toSeq
    val want = rows.map(spansRef(_, pats))
    assert(got == want, s"\ngot  $got\nwant $want")
    // nesting really exercised: "part" emits "a", its suffix "art",
    // and "part" itself over the same window
    assert(want(1).map(_._1).toSet == Set(0, 4, 5))
  }

  test("spans: documents fixture matches the scan reference") {
    val pats = Seq("spark", "park", "art", "part", "scan", "an")
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = docs
      .select(col("doc_id"),
        TextFunctions.blocklistSpans(col("text"), pats).as("sp"))
      .as[(Long, Seq[(Int, Int, Int)])].collect().toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> spansRef(t, pats) }.toMap
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id: got ${got(id)}, want $w") }
    assert(want.values.exists(_.size >= 2)) // fixture discriminates
  }

  // ---- multi-term redaction (graft_ac_redact) ----

  /** Reference: union of match intervals (overlap/adjacent merge),
    * each maximal interval replaced once.
    */
  private def redactRef(text: String, pats: Seq[String],
                        rep: String): String = {
    val iv = pats.flatMap { p =>
      Iterator.unfold(text.indexOf(p)) { i =>
        if (i < 0) None else Some((i, text.indexOf(p, i + 1)))
      }.map(st => (st, st + p.length)).toSeq
    }.sorted
    if (iv.isEmpty) text
    else {
      val sb = new java.lang.StringBuilder
      var pos = 0
      var (curS, curE) = iv.head
      (iv.tail :+ (Int.MaxValue, Int.MaxValue)).foreach { case (st, en) =>
        if (st <= curE) curE = math.max(curE, en)
        else {
          sb.append(text.substring(pos, curS)).append(rep)
          pos = curE; curS = st; curE = en
        }
      }
      sb.append(text.substring(pos)).toString
    }
  }

  test("redact: union-of-intervals semantics vs reference") {
    val pats = Seq("art", "part", "aa", "ab")
    val rows = Seq(
      "party artists depart",    // nested part/art at several sites
      "aaab",                    // aa@0, aa@1, ab@2 → one merged cut
      "clean text",              // no match: text unchanged
      "artart",                  // adjacent matches merge to ONE marker
      "")
    val got = rows.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"),
        TextFunctions.redactTerms(col("t"), pats, "[X]").as("r"))
      .orderBy(col("i"))
      .as[(Int, String)].collect().map(_._2).toSeq
    val want = rows.map(redactRef(_, pats, "[X]"))
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got(3) == "[X]") // adjacency: one marker, not "[X][X]"
    assert(got(2) == "clean text")
  }

  test("redact: never re-exposes a partial term (vs sequential regex)") {
    // sequential per-pattern replace of "ab" then "ba" on "aba" yields
    // "[X]a" — fine — but on "abab" replacing "aba" first would leave
    // "b"; interval union cuts the whole overlap region
    val got = Seq("abab").toDF("t")
      .select(TextFunctions.redactTerms(col("t"), Seq("aba", "bab"),
        "#").as("r")).as[String].head()
    assert(got == "#")
  }

  // ---- normalized blocklist (case/NFC-blind) ----

  test("normalized blocklist: case- and canonical-form-blind matching") {
    val pats = Seq("CAFÉ", "Spark SQL", "plain")
    // "café" decomposed (e + combining acute) must match the
    // precomposed uppercase pattern after nfc(lower(...))
    val rows = Seq("visit the café now", "spark sql engine",
      "PLAIN", "nothing here")
    val got = rows.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"),
        TextFunctions.blocklistMatchesNormalized(col("t"), pats)
          .as("ids"))
      .orderBy(col("i"))
      .as[(Int, Seq[Int])].collect().map(_._2).toSeq
    assert(got == Seq(Seq(0), Seq(1), Seq(2), Seq.empty),
      got.toString)
  }

  // ---- analysis-time type checking (BinaryExpression modeling) ----

  test("wrong-typed pattern argument fails ANALYSIS, not runtime") {
    val df = Seq("x").toDF("t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_ac_match", col("t"),
        array(lit(1), lit(2)))).collect()
    }
    assert(e.getMessage.contains("ARRAY<STRING>"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_ac_spans", lit(3),
        array(lit("a")))).collect()
    }
    assert(e2.getMessage.contains("STRING"), e2.getMessage)
  }

  test("patterns are visible in the plan string (canonicalization)") {
    val df = Seq("x").toDF("t")
      .select(TextFunctions.blocklistMatches(col("t"),
        Seq("needle_zq")).as("ids"))
    assert(df.queryExecution.analyzed.toString.contains("needle_zq"),
      "pattern literal must appear as a real child in the plan")
  }

  test("spans + redact kernels stay inside WholeStageCodegen") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(
      size(TextFunctions.blocklistSpans(col("text"),
        Seq("spark", "art"))).as("n"),
      length(TextFunctions.redactTerms(col("text"),
        Seq("spark", "art"), "[X]")).as("m"))
    val stars = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stars.exists(s => s.toString.contains("graft_ac_spans") &&
      s.toString.contains("graft_ac_redact")),
      out.queryExecution.executedPlan.toString)
    assert(out.agg(sum(col("n")), sum(col("m"))).head().getLong(0) > 0)
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
