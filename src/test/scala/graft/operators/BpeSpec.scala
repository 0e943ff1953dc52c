package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- independent textbook reference (driver-side) -----------------
  private def refMerge(syms: Seq[String], l: String,
                       r: String): Seq[String] = {
    val acc = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- syms) {
      if (acc.nonEmpty && acc.last == l && x == r)
        acc(acc.size - 1) = l + r
      else acc += x
    }
    acc.toSeq
  }

  private def refBpe(words: Map[String, Long],
                     k: Int): Seq[(Long, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      words.map { case (w, c) =>
        (w.split("").toSeq :+ Bpe.EndOfWord) -> c }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var step = 1L
    var done = false
    while (step <= k && !done) {
      val counts = vocab.toSeq.flatMap { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)) -> c)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((step, l, r, c))
        vocab = vocab.toSeq.map { case (syms, cnt) =>
          refMerge(syms, l, r) -> cnt
        }.groupMapReduce(_._1)(_._2)(_ + _)
        step += 1
      }
    }
    out.toSeq
  }

  // Sennrich et al.'s canonical example vocabulary
  private val corpus = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)
  ).toDF("doc_id", "text")
  private val wordCounts = Map("low" -> 5L, "lower" -> 2L,
    "newest" -> 6L, "widest" -> 3L)

  test("trainMerges == textbook reference on the canonical vocabulary") {
    val got = Bpe.trainMerges(corpus, "text", numMerges = 8)
      .as[(Long, String, String, Long)].collect().toSeq
    val expect = refBpe(wordCounts, 8)
    assert(got == expect)
    // first merge is the known argmax with deterministic ties:
    // (e,s), (s,t), (t,</w>) all weigh 9 — lexicographic picks (e,s)
    assert(got.head == ((1L, "e", "s", 9L)))
    // merges compound: later steps contain multi-char symbols
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1))
    Bpe.releaseIntermediates()
  }

  test("trainMerges: partitioning-invariant, deterministic, real-docs reference") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val g1 = Bpe.trainMerges(docs, "text", numMerges = 6)
      .as[(Long, String, String, Long)].collect().toSeq
    val g2 = Bpe.trainMerges(docs.repartition(7), "text", numMerges = 6)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(g1 == g2 && g1.size == 6)
    // independent reference on the driver-collected word counts
    val wc = docs.select(explode(
        graft.functions.TextFunctions.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(g1 == refBpe(wc, 6))
    Bpe.releaseIntermediates()
  }

  test("native segment kernel == HOF composition, incl. edge rows") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
      .union(Seq((9001L, ""), (9002L, "  ?!  "), (9003L, null))
        .toDF("doc_id", "text"))
    val merges = Bpe.trainMerges(docs, "text", numMerges = 6)
      .select($"left", $"right").as[(String, String)].collect().toSeq
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id", $"bpe_tokens")
      .as[(Long, Option[Seq[String]])].collect().toMap
    val native = rows(Bpe.segment(docs, "text", merges))
    assert(native == rows(Bpe.segmentHof(docs, "text", merges)))
    // empty/punct-only text tokenizes to [""] -> one bare </w>;
    // null text stays null — both exactly like the HOF form
    assert(native(9001L).get == Seq(Bpe.EndOfWord))
    assert(native(9002L).get == Seq(Bpe.EndOfWord))
    assert(native(9003L).isEmpty)
    // zero merges degenerate to characters + markers
    assert(rows(Bpe.segment(docs.filter($"doc_id" === 9002L), "text",
      Nil))(9002L).get == Seq(Bpe.EndOfWord))
    // the native kernel stays inside WholeStageCodegen: the segment
    // projection carries the *(n) codegen-stage marker
    val plan = Bpe.segment(docs, "text", merges)
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[.*graft_bpe_segment".r
      .findFirstIn(plan).isDefined, plan)
    Bpe.releaseIntermediates()
  }

  test("segment replays merges in order; concatenation reconstructs") {
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 6)
      .select($"left", $"right").as[(String, String)].collect().toSeq
    val seg = Bpe.segment(corpus, "text", merges)
      .select($"doc_id", $"bpe_tokens").as[(Long, Seq[String])]
      .collect().toMap
    // "newest" ×6: after enough merges the whole word fuses toward
    // few symbols; concatenation must reconstruct chars + markers
    val doc3 = seg(3L)
    assert(doc3.mkString == ("newest" + Bpe.EndOfWord) * 6)
    // reference apply agrees token-for-token
    val refSyms = merges.foldLeft(
      "newest".split("").toSeq :+ Bpe.EndOfWord) {
      case (s, (l, r)) => refMerge(s, l, r) }
    assert(doc3.take(refSyms.size) == refSyms)
    Bpe.releaseIntermediates()
  }
}
