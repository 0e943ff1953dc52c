package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // segWords = 2 keeps fixtures readable: "a b c d" → ["a b", "c d"]
  private def run(rows: Seq[(Long, String)], minDf: Long = 2) =
    Boilerplate.removeSegments(rows.toDF("doc_id", "text"),
      "doc_id", "text", segWords = 2, minDf = minDf)
      .orderBy("doc_id").collect()

  test("a segment repeated across docs is dropped from every carrier") {
    val out = run(Seq(
      (1L, "foo bar u1 v1"),   // "foo bar" appears in docs 1,2,3
      (2L, "foo bar u2 v2"),
      (3L, "u3 v3 foo bar"),
      (4L, "u4 v4 w4 x4")))    // untouched
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("u1 v1", "u2 v2", "u3 v3", "u4 v4 w4 x4"))
    assert(out.map(_.getAs[Long]("n_dropped")).toSeq == Seq(1L, 1L, 1L, 0L))
    assert(out.map(_.getAs[Long]("n_segments")).toSeq == Seq(2L, 2L, 2L, 2L))
  }

  test("document order is restored around a dropped middle segment") {
    val out = run(Seq(
      (1L, "a1 a2 foo bar z1 z2"),
      (2L, "b1 b2 foo bar y1 y2")))
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("a1 a2 z1 z2", "b1 b2 y1 y2"))
  }

  test("repeats WITHIN one doc count toward the occurrence count; all-dropped doc → empty") {
    val out = run(Seq((1L, "foo bar foo bar"), (2L, "u v")))
    assert(out.head.getAs[String]("clean_text") == "")
    assert(out.head.getAs[Long]("n_dropped") == 2L)
    assert(out(1).getAs[String]("clean_text") == "u v")
  }

  test("tail segment shorter than segWords participates like any other") {
    val out = run(Seq((1L, "a b c"), (2L, "x y c")))
    // tail segment "c" is shared → dropped from both
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("a b", "x y"))
  }

  test("minDf above every occurrence count is the identity on text") {
    val out = run(Seq((1L, "foo bar u1"), (2L, "foo bar u2")), minDf = 3)
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("foo bar u1", "foo bar u2"))
    assert(out.forall(_.getAs[Long]("n_dropped") == 0L))
  }

  test("NULL text rows are omitted (documented contract)") {
    val df = Seq((1L, Some("a b")), (2L, None))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeSegments(df, "doc_id", "text",
      segWords = 2, minDf = 2).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
  }

  test("plan: drop-list broadcasts; corpus never shuffles on the segment") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Boilerplate.removeSegments(docs, "doc_id", "text")
    out.collect() // AQE picks the broadcast at runtime: read the FINAL plan
    // the adaptive toString appends the initial plan too — scope the
    // exchange count to the executed (final) section
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the occurrence-count aggregate is the ONLY segment-keyed exchange, and it
    // is map-side partial (hot boilerplate collapses per partition
    // before the wire); the join-back side moves on doc_id alone
    val hExchanges = "hashpartitioning\\(__h".r.findAllIn(plan).size
    assert(hExchanges == 1,
      s"corpus must not be redistributed by segment:\n$plan")
    assert(plan.contains("partial_count"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan)
  }

  // ---- sourceOverlapMatrix ----

  private def matrix(rows: Seq[(String, String)], maxSources: Int = 64) =
    Boilerplate.sourceOverlapMatrix(rows.toDF("source", "text"),
        "source", "text", segWords = 2, maxSources = maxSources)
      .orderBy("src_a", "src_b")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq

  test("overlap matrix: known shares, totals, and containment fraction") {
    val out = matrix(Seq(
      ("a", "x y u1 v1"),     // a: {"x y", "u1 v1"}
      ("a", "p q r1 s1"),     // a: +{"p q", "r1 s1"} → 4 distinct
      ("b", "x y u2 v2"),     // b: {"x y", "u2 v2"}
      ("b", "p q u2 v2"),     // b: +{"p q"} → 3 distinct
      ("c", "c1 d1 c2 d2")))  // no overlap with anyone
    // a∩b = {"x y", "p q"} = 2; containment = 2 / min(4, 3)
    assert(out == Seq(("a", "b", 2L, 4L, 3L, 2.0 / 3.0)))
  }

  test("overlap matrix: maxSources cap drops global chrome from the matrix") {
    val base = Seq(
      ("a", "g g a1 a2"), ("b", "g g b1 b2"), ("c", "g g c1 c2"),
      // "a1 a2" also shared by a and b only
      ("b", "a1 a2 b3 b4"))
    // cap 64: "g g" (3 sources) and "a1 a2" (2 sources) both count
    val loose = matrix(base)
    assert(loose.map(r => (r._1, r._2, r._3)) ==
      Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
    // cap 2: "g g" is global chrome → only the a-b "a1 a2" share remains
    val capped = matrix(base, maxSources = 2)
    assert(capped.map(r => (r._1, r._2, r._3)) == Seq(("a", "b", 1L)))
  }

  test("overlap matrix == driver-side reference on real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Boilerplate.sourceOverlapMatrix(docs, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val segsBySrc = docs.select("source", "text").as[(String, String)]
      .collect().groupBy(_._1).map { case (s, rs) =>
        s -> rs.flatMap { case (_, t) =>
          val w = t.split(" ", -1)
          w.grouped(8).map(_.mkString(" ")).toSeq
        }.toSet
      }
    val srcs = segsBySrc.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      shared = (segsBySrc(srcs(i)) intersect segsBySrc(srcs(j))).size
      if shared > 0
    } yield (srcs(i), srcs(j)) ->
      (shared.toLong, segsBySrc(srcs(i)).size.toLong,
        segsBySrc(srcs(j)).size.toLong)).toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture should produce cross-source overlap")
  }

  test("overlap matrix plan: segment distinct computed once (ReuseExchange), broadcasts only") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Boilerplate.sourceOverlapMatrix(docs, "source", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin") &&
      !plan.contains("CartesianProduct"), plan)
    // the (src, h) distinct exchange feeds three consumers but ships once
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage") || plan.contains("TableCacheQueryStage"),
      s"the segment distinct must be reused, not recomputed:\n$plan")
  }

  test("dupNgramCoverage: hand-computed windows, unions, caps, within-doc repeats") {
    val docs = Seq(
      (1L, "a b c d e f g h"),       // shares window "a b c d e" with 2
      (2L, "x y a b c d e q"),
      (3L, "p q r s t u"),           // 3/4 exact dups: all windows dup
      (4L, "p q r s t u"),
      (5L, "z zz zzz"),              // short-doc pair: 1 truncated window
      (6L, "z zz zzz"),
      (7L, "m n o p2 q2 m n o p2 q2"), // within-doc repeat (C4 rule)
      (8L, "totally unique text with no repeats anywhere at all")
    ).toDF("doc_id", "text")
    val out = Boilerplate.dupNgramCoverage(docs, "doc_id", "text",
        n = 5, minDf = 2)
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // (id, n_tokens, n_grams, n_dup_grams, covered_tokens)
    assert(out == Seq(
      (1L, 8L, 4L, 1L, 5L),   // window at pos 0 dup → tokens 0-4
      (2L, 8L, 4L, 1L, 5L),   // window at pos 2 dup → tokens 2-6
      (3L, 6L, 2L, 2L, 6L),   // exact dup: full coverage
      (4L, 6L, 2L, 2L, 6L),
      (5L, 3L, 1L, 1L, 3L),   // truncated window covers the whole doc (cap)
      (6L, 3L, 1L, 1L, 3L),
      (7L, 10L, 6L, 2L, 10L), // pos 0 == pos 5 within ONE doc → both dup
      (8L, 9L, 5L, 0L, 0L)))
    // NULL text rows are omitted; partitioning-invariant
    val withNull = docs.union(Seq((9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val a = Boilerplate.dupNgramCoverage(withNull, "doc_id", "text", 5, 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a.map(_._1) == (1L to 8L).toSet)
    val b = Boilerplate.dupNgramCoverage(withNull.repartition(5),
        "doc_id", "text", 5, 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Boilerplate.dupNgramCoverage(docs, "doc_id", "text", 5, minDf = 1)
    }
  }

  test("removeDupSpans: keeper survives, losers lose their ranges, order kept") {
    val docs = Seq(
      (1L, "a b c d e f g h"),       // keeper of "a b c d e" (pos 0)
      (2L, "x y a b c d e q"),       // loser: tokens 2-6 removed
      (3L, "p q r s t u"),           // keeper of both windows
      (4L, "p q r s t u"),           // loser: fully removed
      (5L, "z zz zzz"),              // short-window keeper
      (6L, "z zz zzz"),              // loser: fully removed
      (7L, "m n o p2 q2 m n o p2 q2"), // within-doc: second copy removed
      (8L, "totally unique text with no repeats anywhere at all")
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeDupSpans(docs, "doc_id", "text",
        n = 5, minDf = 2)
      .orderBy($"id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "a b c d e f g h", 8L, 0L),
      (2L, "x y q", 8L, 5L),
      (3L, "p q r s t u", 6L, 0L),
      (4L, "", 6L, 6L),
      (5L, "z zz zzz", 3L, 0L),
      (6L, "", 3L, 3L),
      (7L, "m n o p2 q2", 10L, 5L),
      (8L, "totally unique text with no repeats anywhere at all", 9L, 0L)))
    // partitioning-invariant (the keeper rule is a total order)
    val a = Boilerplate.removeDupSpans(docs.repartition(5), "doc_id",
        "text", 5, 2)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(a == out.toSet)
    // removing then re-scoring: no duplicated window survives except
    // what keepers legitimately still share below minDf
    val rescored = Boilerplate.dupNgramCoverage(
      Boilerplate.removeDupSpans(docs, "doc_id", "text", 5, 2)
        .filter(length($"clean_text") > 0)
        .select($"id".as("doc_id"), $"clean_text".as("text")),
      "doc_id", "text", 5, 2)
    assert(rescored.agg(sum($"n_dup_grams")).head().getLong(0) == 0L)
  }
}
