package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private val tgtSrcs = Seq("src0", "src1", "src2")
  private def tgt = docs.filter(col("source").isin(tgtSrcs: _*))

  // ---- driver-side reference (independent of the Column kernels) ----
  private def refTokens(text: String): Seq[String] = {
    val nrm = Option(text).getOrElse("").toLowerCase
      .replaceAll("[^a-z0-9]+", " ").replaceAll("\\s+", " ").trim
    if (nrm.isEmpty) Seq.empty else nrm.split(" ").toSeq
  }
  private def refBigrams(ts: Seq[String]): Seq[String] =
    if (ts.size < 2) Seq.empty
    else ts.sliding(2).map(_.mkString(" ")).toSeq

  test("differential: distributed scores == driver-side reference") {
    val got = Perplexity.bigramScores(docs, tgt, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val tgtToks = tgt.select("text").as[String].collect().map(refTokens)
    val bc = tgtToks.flatMap(refBigrams).groupBy(identity)
      .map { case (g, gs) => g -> gs.size.toLong }
    val uc = tgtToks.flatten.groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val v = uc.size.toLong
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(got.size == all.length)
    all.foreach { case (id, text) =>
      val gs = refBigrams(refTokens(text))
      val lp = gs.map { g =>
        val w1 = g.split(" ").head
        val x = (bc.getOrElse(g, 0L) + 1).toDouble /
          (uc.getOrElse(w1, 0L) + v).toDouble
        math.floor(Perplexity.Scale * math.log(x)).toLong
      }.sum
      assert(got(id) == (gs.size.toLong, lp),
        s"doc $id: got ${got(id)}, want (${gs.size}, $lp)")
    }
  }

  test("degenerate docs (< 2 tokens, empty, NULL) stay at (0, 0)") {
    val funky = Seq((1L, "one"), (2L, ""), (3L, null: String),
      (4L, "two words")).toDF("doc_id", "text")
    val out = Perplexity.bigramScores(funky, tgt, "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 4)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._2 == 0 && out(id)._3 == 0, s"doc $id: ${out(id)}")
    }
    assert(out(4L)._2 == 1)
  }

  test("target-trained model prefers target-like docs") {
    val scored = Perplexity.bigramScores(docs, tgt, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .filter(col("n_bigrams") > 0)
      .groupBy(col("source").isin(tgtSrcs: _*).as("is_tgt"))
      .agg(avg(col("logprob").cast("double") /
        col("n_bigrams").cast("double")).as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(scored(true) > scored(false),
      s"target docs should read as more probable: $scored")
  }

  test("plan: no cartesian product, no global window; doc-keyed final agg") {
    val out = Perplexity.bigramScores(docs, tgt, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
    assert("hashpartitioning\\(doc_id".r.findAllIn(plan).size == 1,
      s"exactly ONE doc-keyed aggregation exchange:\n$plan")
  }

  test("empty/token-less target fails fast instead of scoring garbage") {
    val corpus = Seq((1L, "two words")).toDF("doc_id", "text")
    val noneTgt = docs.filter(col("source") === "no_such_source")
    val e = intercept[Exception] {
      Perplexity.bigramScores(corpus, noneTgt, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("V = 0") ||
      Option(e.getCause).exists(_.getMessage.contains("V = 0")), e.toString)
  }

  test("quantization-margin guard: throws above the fixture's margin, passes below") {
    val m = Perplexity.minQuantizationMargin(docs, tgt, "doc_id", "text")
    // the gate fixture's margin must be real: strictly inside (0, 0.5]
    assert(m > 0 && m <= 0.5, s"margin $m")
    info(f"fixture quantization margin = $m%.3e")
    // threshold below the measured margin: scores flow
    val ok = Perplexity.bigramScores(docs, tgt, "doc_id", "text",
      minQuantMargin = Some(m / 2)).count()
    assert(ok == docs.count())
    // a fixture whose margin falls below the demanded threshold throws
    // loudly instead of shipping a flaky hash-compared oracle
    val boom = intercept[IllegalStateException] {
      Perplexity.bigramScores(docs, tgt, "doc_id", "text",
        minQuantMargin = Some(m + 1e-12))
    }
    assert(boom.getMessage.contains("quantization margin"), boom.getMessage)
  }

  test("ccnetBuckets: per-lang terciles over average cost, head+middle kept") {
    val got = Perplexity.ccnetBuckets(docs,
        docs.filter(col("source").isin("src0", "src1", "src2")),
        "doc_id", "text", "lang")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got.size == docs.count())
    // reference: recompute buckets from the spec-pinned scores
    val scores = Perplexity.bigramScores(docs,
        docs.filter(col("source").isin("src0", "src1", "src2")),
        "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .map { case (id, nb, lp) =>
        id -> (if (nb > 0) (-lp) / nb else 0L)
      }.toMap
    val langOf = docs.select("doc_id", "lang").as[(Long, String)]
      .collect().toMap
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val order = rows.map(r => (scores(r._1), r._1)).sorted
      val n = rows.size
      val wantBucket = order.zipWithIndex.map { case ((_, id), i) =>
        id -> (3L * i / n)
      }.toMap
      rows.foreach { case (id, l, cost, bucket, kept) =>
        assert(l == langOf(id) && cost == scores(id), s"doc $id")
        assert(bucket == wantBucket(id), s"doc $id bucket")
        assert(kept == (bucket < 2), s"doc $id kept")
      }
      // terciles are balanced within 1 (rank-discrete cut)
      val sizes = rows.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(0L, 1L, 2L)))
      if (n >= 3)
        assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
    }
    // the cut is non-trivial on the fixture: some docs are dropped
    assert(got.exists(!_._5) && got.exists(_._5))
  }
}
