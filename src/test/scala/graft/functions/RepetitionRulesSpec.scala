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

  test("NULL text drops from the output, matching UNNEST(NULL) mirrors") {
    val df = Seq((1L, Option("a b a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = RepetitionRules.measures(df, "doc_id", "text")
      .select($"doc_id").as[Long].collect().toSeq
    assert(out == Seq(1L))
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

  test("differential: distributed measures == driver-side reference on random docs") {
    val cfg = RepetitionRules.Config()
    // plain-Scala reference replaying the whole definition
    def ref(text: String): (String, Double, Double) = {
      val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .replaceAll("\\s+", " ")
      val toks = norm.split(" ", -1).toSeq // split("") -> [""]
      def grams(n: Int): Seq[String] = {
        val windows = math.max(toks.length - n, 0) + 1
        (0 until windows).map(w => toks.slice(w, w + n).mkString(" "))
          .filter(_.nonEmpty)
      }
      def chars(g: String): Long = g.replace(" ", "").length.toLong
      val gt = grams(cfg.topN); val gd = grams(cfg.dupN)
      val topPair =
        if (gt.isEmpty) ("", 0.0)
        else {
          val cnt = gt.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val (g, c) = cnt.toSeq.maxBy { case (g, c) => (c, g) }
          (g, (c * chars(g)).toDouble /
            cnt.map { case (g2, c2) => c2 * chars(g2) }.sum.toDouble)
        }
      val dupFrac =
        if (gd.isEmpty) 0.0
        else {
          val cnt = gd.groupBy(identity).view.mapValues(_.size.toLong).toMap
          val all = cnt.map { case (g, c) => c * chars(g) }.sum
          val dup = cnt.collect { case (g, c) if c > 1 => c * chars(g) }.sum
          dup.toDouble / all.toDouble
        }
      (topPair._1, topPair._2, dupFrac)
    }
    val rnd = new scala.util.Random(20260812L)
    val vocab = Seq("aa", "bb", "cc", "d", "longword", "x1")
    val randomDocs = (0 until 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(30)).map(_ =>
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val edge = Seq((100L, ""), (101L, "!!!"), (102L, "solo"),
      (103L, "a a a a a a"), (104L, "Mixed CASE mixed case"))
    val df = (randomDocs ++ edge).toDF("doc_id", "text")
    val got = RepetitionRules.measures(df, "doc_id", "text", cfg)
      .select($"doc_id", $"top_gram", $"top_gram_char_frac",
        $"dup_gram_char_frac")
      .as[(Long, String, Double, Double)].collect()
      .map { case (id, g, t, d) => id -> ((g, t, d)) }.toMap
    (randomDocs ++ edge).foreach { case (id, text) =>
      assert(got(id) == ref(text), s"doc $id '${text}': ${got(id)} vs ${ref(text)}")
    }
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
