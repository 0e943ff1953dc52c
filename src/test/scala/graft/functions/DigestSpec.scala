package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DigestSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "a", Some(10L), "hello world"),
    (2L, "a", Some(20L), "more text"),
    (3L, "b", None, "null metric"),
    (4L, "b", Some(40L), "final row")
  )
  private def df = rows.toDF("id", "src", "m", "text")
  private val cols = Seq("id", "src", "m", "text")

  private def whole(d: org.apache.spark.sql.DataFrame): (Long, Long) =
    Digest.tableDigest(d, cols).select($"n_rows", $"digest")
      .as[(Long, Long)].head()

  test("digest is row-order and partitioning independent") {
    val base = whole(df)
    assert(whole(df.repartition(7, $"text")) == base)
    assert(whole(df.orderBy($"text".desc)) == base)
    // reconstructing the same rows in a different insertion order
    assert(whole(rows.reverse.toDF("id", "src", "m", "text")) == base)
  }

  test("any changed, missing, or duplicated row flips the digest") {
    val base = whole(df)
    val changed = rows.updated(1, (2L, "a", Some(21L), "more text"))
    assert(whole(changed.toDF("id", "src", "m", "text")) != base)
    assert(whole(rows.tail.toDF("id", "src", "m", "text")) != base)
    assert(whole((rows :+ rows.head).toDF("id", "src", "m", "text"))
      != base)
  }

  test("canonical encoding: column order, boundaries, and NULL position") {
    val base = whole(df)
    assert(Digest.tableDigest(df, cols.reverse)
      .select($"digest").as[Long].head() != base._2,
      "column order must be part of the encoding")
    // ("ab","c") vs ("a","bc") — the separator keeps them apart
    val ab = Seq(("ab", "c")).toDF("x", "y")
    val a = Seq(("a", "bc")).toDF("x", "y")
    assert(Digest.tableDigest(ab, Seq("x", "y"))
        .select($"digest").as[Long].head() !=
      Digest.tableDigest(a, Seq("x", "y"))
        .select($"digest").as[Long].head())
    // (NULL, "x") vs ("x", NULL) — per-column sentinel keeps order
    val nx = Seq((Option.empty[String], Some("x"))).toDF("x", "y")
    val xn = Seq((Some("x"), Option.empty[String])).toDF("x", "y")
    assert(Digest.tableDigest(nx, Seq("x", "y"))
        .select($"digest").as[Long].head() !=
      Digest.tableDigest(xn, Seq("x", "y"))
        .select($"digest").as[Long].head())
  }

  test("per-group digests drill down; groups sum to the audit surface") {
    val g = Digest.tableDigest(df, cols, Seq("src"))
      .select($"src", $"n_rows", $"digest")
      .as[(String, Long, Long)].collect()
      .map { case (k, n, d) => k -> ((n, d)) }.toMap
    assert(g.keySet == Set("a", "b"))
    assert(g("a")._1 == 2L && g("b")._1 == 2L)
    // a change in group b leaves group a's digest untouched
    val changed = rows.updated(3, (4L, "b", Some(41L), "final row"))
      .toDF("id", "src", "m", "text")
    val g2 = Digest.tableDigest(changed, cols, Seq("src"))
      .select($"src", $"digest").as[(String, Long)].collect().toMap
    assert(g2("a") == g("a")._2 && g2("b") != g("b")._2)
  }

  test("non-canonical column types are rejected loudly") {
    val withD = df.withColumn("d", $"m" * 1.5)
    val e = intercept[IllegalArgumentException] {
      Digest.tableDigest(withD, Seq("id", "d"))
    }
    assert(e.getMessage.contains("non-canonical"))
    intercept[IllegalArgumentException] {
      Digest.tableDigest(
        df.withColumn("ts", current_timestamp()), Seq("ts"))
    }
    intercept[IllegalArgumentException] { Digest.tableDigest(df, Nil) }
  }

  test("plan: one aggregate exchange with map-side partials, no join") {
    val plan = Digest.tableDigest(df.repartition(4), cols, Seq("src"))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(src".r.findAllIn(plan).size == 1,
      s"expected one group exchange:\n$plan")
    assert(plan.contains("partial_"), s"no map-side combine:\n$plan")
    assert(!plan.contains("Join"), s"digest must not join:\n$plan")
  }
}
