package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer scoring ([[Unigram]]): differential vs a
  * driver-side reference DP over the real fixture, hand fixtures for
  * every branch (multi-char pieces beating chars, fallback on unseen
  * characters, empty/degenerate docs), the quantization-margin guard,
  * and the zero-exchange plan shape.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private def refTokens(text: String): Seq[String] = {
    val nrm = Option(text).getOrElse("").toLowerCase
      .replaceAll("[^a-z0-9]+", " ").replaceAll("\\s+", " ").trim
    if (nrm.isEmpty) Seq.empty else nrm.split(" ").toSeq
  }

  /** Driver-side reference trainer + Viterbi, mirroring the operator's
    * documented contract independently of its Spark plan.
    */
  private def refModel(texts: Seq[String], v: Int)
      : (Map[String, Long], Long) = {
    val wc = texts.flatMap(refTokens).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val cand = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      for (i <- 0 until math.min(w.length, Unigram.MaxStarts);
           l <- 1 to Unigram.MaxPieceLen if i + l <= w.length)
        cand(w.substring(i, i + l)) =
          cand.getOrElse(w.substring(i, i + l), 0L) + c
    }
    val top = cand.toSeq.sortBy { case (p, f) => (-f, p) }.take(v)
    val vocab = (top ++ cand.filter(_._1.length == 1)).toMap
    val t = vocab.values.sum
    (vocab.map { case (p, f) =>
      p -> math.floor(1000000.0 * math.log(f.toDouble / t.toDouble)).toLong
    }, math.floor(1000000.0 * math.log(1.0 / t.toDouble)).toLong)
  }

  private def refScore(w: String, cost: Map[String, Long],
                       fb: Long): Long = {
    val Neg = Long.MinValue / 4
    val dp = Array.fill(w.length + 1)(Neg); dp(0) = 0L
    for (j <- 1 to w.length) {
      var best = Neg
      for (l <- 1 to math.min(Unigram.MaxPieceLen, j)
           if dp(j - l) > Neg / 2) {
        cost.get(w.substring(j - l, j)) match {
          case Some(c) => best = math.max(best, dp(j - l) + c)
          case None if l == 1 => best = math.max(best, dp(j - 1) + fb)
          case None => ()
        }
      }
      dp(j) = best
    }
    dp(w.length)
  }

  test("differential: distributed scores == driver-side reference DP") {
    val v = 40
    val model = Unigram.trainModel(docs, "text", v)
    val texts = docs.select("text").as[String].collect().toSeq
    val (refCost, refFb) = refModel(texts, v)
    assert(model.pieces.toMap == refCost, "trained costs differ")
    assert(model.fallback == refFb)
    val got = Unigram.scoreDocs(docs, "doc_id", "text", model)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    docs.select("doc_id", "text").as[(Long, String)].collect()
      .foreach { case (id, text) =>
        val ws = refTokens(text)
        val want = (ws.size.toLong,
          ws.map(refScore(_, refCost, refFb)).sum)
        assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
      }
  }

  test("hand fixture: multi-char pieces beat per-char segmentation") {
    // corpus: "abab ab" -> candidate freqs: ab=5(2 per abab + 1), a=3,
    // b=3, ba=2, aba=2, bab=2, abab=2
    val corpus = Seq((1L, "abab ab"), (2L, "abab")).toDF("doc_id", "text")
    val model = Unigram.trainModel(corpus, "text", 3)
    val cost = model.pieces.toMap
    // top-3 by (freq desc, piece asc): ab(5), a(4)? recount: words
    // abab(x2), ab(x1): a appears 2x in abab + 1 in ab = 5; same b=5.
    // pieces: ab freq 2*2+1=5, a 5, b 5, ba 2, aba 2, bab 2, abab 2
    // top3 = (a,5),(ab,5),(b,5) lexicographic among freq-5 ties;
    // union chars adds nothing new
    assert(cost.keySet == Set("a", "ab", "b"), cost.toString)
    val t = cost.keySet.toSeq.map {
      case "a" => 5L; case "ab" => 5L; case "b" => 5L
    }.sum
    val cAb = math.floor(1000000.0 * math.log(5.0 / t)).toLong
    // "abab" best = ab+ab (2 pieces) beats a+b+a+b (4 pieces)
    val got = Unigram.scoreDocs(
        Seq((9L, "abab")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((9L, 1L, 2L * cAb)), got.toString)
  }

  test("fallback: unseen characters score the 1/T floor") {
    val corpus = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val model = Unigram.trainModel(corpus, "text", 2)
    val cost = model.pieces.toMap
    // target word "az": a known, z unseen -> cost(a) + fallback
    val got = Unigram.scoreDocs(
        Seq((9L, "az")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((9L, 1L, cost("a") + model.fallback)), got.toString)
  }

  test("degenerate docs: empty and null text score zero words") {
    val corpus = Seq((1L, "aa bb")).toDF("doc_id", "text")
    val model = Unigram.trainModel(corpus, "text", 2)
    val target = Seq((1L, Some("")), (2L, None), (3L, Some("!!!")))
      .toDF("doc_id", "text")
    val got = Unigram.scoreDocs(target, "doc_id", "text", model)
      .select(col("doc_id"), coalesce(col("n_words"), lit(0L)),
        coalesce(col("uni_q"), lit(0L)))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)),
      got.toString)
  }

  test("quantization-margin guard: throws above, passes below") {
    Unigram.trainModel(docs, "text", 40, minQuantMargin = Some(1e-9))
    val boom = intercept[IllegalStateException] {
      Unigram.trainModel(docs, "text", 40, minQuantMargin = Some(0.49))
    }
    assert(boom.getMessage.contains("quantization margin"), boom.getMessage)
  }

  test("plan: scoring is one codegen projection, zero exchanges") {
    val model = Unigram.trainModel(docs, "text", 40)
    val exec = Unigram.scoreDocs(docs, "doc_id", "text", model)
      .queryExecution.executedPlan
    val plan = exec.toString
    assert(!plan.contains("Exchange"), plan.take(400))
    val stages = exec.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(stages.nonEmpty, s"no codegen stage:\n${plan.take(400)}")
    assert(plan.contains("graft_unigram_score"), plan.take(400))
  }
}
