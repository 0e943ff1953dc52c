package graft.plans

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Unicode-script histogram kernel (graft_script_mix): five counts
  * must equal a driver-side code-point classification over every
  * fixture — including surrogate pairs (one COUNT per code point, not
  * per char), every documented window edge, NULL and empty text — and
  * the expression must stay inside codegen.
  */
class ScriptMixSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the documented windows. */
  private def ref(s: String): Seq[Long] = {
    var lat = 0L; var dig = 0L; var cyr = 0L; var cjk = 0L; var oth = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0x00C0 && cp <= 0x024F && cp != 0x00D7 && cp != 0x00F7))
        lat += 1
      else if (cp >= '0' && cp <= '9') dig += 1
      else if (cp >= 0x0400 && cp <= 0x052F) cyr += 1
      else if (cp >= 0x4E00 && cp <= 0x9FFF) cjk += 1
      else oth += 1
    }
    Seq(lat, dig, cyr, cjk, oth)
  }

  private def run(rows: Seq[String]): Seq[Option[Seq[Long]]] =
    rows.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), TextFunctions.scriptMix(col("t")).as("m"))
      .orderBy(col("i"))
      .as[(Int, Option[Seq[Long]])].collect().map(_._2).toSeq

  test("window edges: accented latin counts latin, × ÷ are other, " +
    "Cyrillic Supplement counts cyrillic") {
    val rows = Seq(
      "café üñ",          // é ü ñ → latin
      "×÷",                    // × ÷ → other (excluded)
      "ÀÖØöøɏ", // window boundary chars
      "ЀӿԀԯ",        // Cyrillic base + Supplement
      "一鿿",                    // CJK edges
      "あア",                    // kana → other (not in cjk win)
      "abc XYZ 012 !?")
    val got = run(rows).map(_.get)
    val want = rows.map(ref)
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got(0) == Seq(6L, 0L, 0L, 0L, 1L)) // space is other
    assert(got(1) == Seq(0L, 0L, 0L, 0L, 2L))
    assert(got(2) == Seq(6L, 0L, 0L, 0L, 0L))
    assert(got(3) == Seq(0L, 0L, 4L, 0L, 0L))
    assert(got(4) == Seq(0L, 0L, 0L, 2L, 0L))
  }

  test("surrogate pairs count once per CODE POINT; NULL and empty") {
    // U+1D54A (double-struck S) and U+20000 (CJK ext B — OUTSIDE the
    // U+4E00–9FFF window, so 'other') are non-BMP: two chars each
    val rows = Seq("𝕊", "𠀀", "", null)
    val got = run(rows)
    assert(got(0).get == Seq(0L, 0L, 0L, 0L, 1L))
    assert(got(1).get == Seq(0L, 0L, 0L, 0L, 1L))
    assert(got(2).get == Seq(0L, 0L, 0L, 0L, 0L))
    assert(got(3).isEmpty)
  }

  test("differential vs reference over the documents fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val got = docs
      .select(col("doc_id"), TextFunctions.scriptMix(col("text")).as("m"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> ref(t) }.toMap
    assert(got.size == want.size)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"doc $id: got ${got(id)}, want $w") }
    // counts must cover the text: sum of buckets == code-point length
    val tot = docs.select(
      sum(aggregate(TextFunctions.scriptMix(col("text")), lit(0L),
        (a, x) => a + x)).as("s"),
      sum(length(col("text")).cast("long")).as("l")).head()
    assert(tot.getLong(0) == tot.getLong(1))
  }

  test("kernel stays inside WholeStageCodegen") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(
      element_at(TextFunctions.scriptMix(col("text")), 1).as("n"))
    val stars = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stars.exists(_.toString.contains("graft_script_mix")),
      out.queryExecution.executedPlan.toString)
    assert(out.agg(sum(col("n"))).head().getLong(0) > 0)
  }
}
