package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark joins fast and loose"),
    (2L, "spark spark spark everywhere"),
    (3L, "completely unrelated words here"),
    (4L, "fast fast spark")
  ).toDF("doc_id", "text")

  /** Reference BM25 computed independently (plain Scala, same
    * quantization contract) for the fixture above.
    */
  private def referenceScores(query: String, k1: Double = 1.2,
                              b: Double = 0.75): Map[Long, Long] = {
    val docs = Map(
      1L -> "spark joins fast and loose",
      2L -> "spark spark spark everywhere",
      3L -> "completely unrelated words here",
      4L -> "fast fast spark"
    ).view.mapValues(_.split(' ').toSeq).toMap
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    val terms = query.split(' ').distinct
    docs.flatMap { case (id, toks) =>
      val dl = toks.size.toDouble
      val cs = terms.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None
        else {
          val df = docs.values.count(_.contains(t)).toDouble
          val idfQ = math.floor(
            1000000.0 * math.log((n - df + 0.5) / (df + 0.5)))
          val tfn = (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * dl / avgdl))
          Some(math.floor(idfQ * tfn).toLong)
        }
      }
      if (cs.isEmpty) None else Some(id -> cs.sum)
    }
  }

  test("topK matches an independent BM25 computation, quantized exactly") {
    val got = Bm25.topK(corpus, "doc_id", "text",
      Seq(0L -> "spark fast"), k = 10)
      .select($"doc_id", $"score_q").as[(Long, Long)].collect().toMap
    val want = referenceScores("spark fast")
    assert(got == want)
    assert(!got.contains(3L)) // shares no term -> absent, not zero
  }

  test("ranking is (score desc, doc_id) with k enforced") {
    val rows = Bm25.topK(corpus, "doc_id", "text",
      Seq(0L -> "spark fast", 1L -> "unrelated"), k = 2)
      .select($"qid", $"doc_id", $"rk".cast("long"))
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(rows.count(_._1 == 0L) == 2) // k caps query 0's hits
    assert(rows.filter(_._1 == 1L).map(_._2) == Seq(3L))
    val expectTop = referenceScores("spark fast").toSeq
      .sortBy { case (id, s) => (-s, id) }.take(2).map(_._1)
    assert(rows.filter(_._1 == 0L).sortBy(_._3).map(_._2) == expectTop)
  }

  test("margin guard trips on an impossible threshold; empty query rejected") {
    intercept[IllegalStateException] {
      Bm25.topK(corpus, "doc_id", "text", Seq(0L -> "spark"),
        k = 1, minQuantMargin = Some(1.0))
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", Seq.empty, k = 1)
    }
  }

  test("topKBatch (DataFrame queries) == topK (Seq queries), exactly") {
    val qs = Seq(0L -> "spark fast", 1L -> "unrelated words",
      2L -> "Loose JOINS!", 3L -> "spark")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"doc_id", $"score_q", $"rk".cast("long"))
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    val seqForm = rows(Bm25.topK(corpus, "doc_id", "text", qs, k = 3))
    val batch = Bm25.topKBatch(corpus, "doc_id", "text",
      qs.toDF("qid", "qtext"), "qid", "qtext", k = 3)
    assert(rows(batch) == seqForm)
    batch.unpersist(blocking = true)
    // deterministic under repartition of both sides
    val batch2 = Bm25.topKBatch(corpus.repartition(7), "doc_id", "text",
      qs.toDF("qid", "qtext").repartition(3), "qid", "qtext", k = 3)
    assert(rows(batch2) == seqForm)
    batch2.unpersist(blocking = true)
    // the margin guard carries over (and trips identically)
    intercept[IllegalStateException] {
      Bm25.topKBatch(corpus, "doc_id", "text",
        Seq(0L -> "spark").toDF("qid", "qtext"), "qid", "qtext",
        k = 1, minQuantMargin = Some(1.0))
    }
    intercept[IllegalArgumentException] {
      Bm25.topKBatch(corpus, "doc_id", "text",
        Seq(0L -> "???!!").toDF("qid", "qtext"), "qid", "qtext", k = 1)
    }
  }

  test("topKBatch plan: query relation broadcasts; no pins leak") {
    val qs = Seq(0L -> "spark fast").toDF("qid", "qtext")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Bm25.topKBatch(corpus, "doc_id", "text", qs,
      "qid", "qtext", k = 3)
    // eagerSnapshot pins the RESULT; internal tf/qTerms pins released
    // (async — poll briefly before asserting)
    val deadline = System.currentTimeMillis + 10000
    while (System.currentTimeMillis < deadline &&
      (spark.sparkContext.getPersistentRDDs.keySet -- before).size > 1)
      Thread.sleep(50)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.size <= 1, s"internal pins leaked: $added")
    out.unpersist(blocking = true)
    // plan check runs on a fresh (un-snapshotted) build of the same
    // pipeline: rebuild and inspect before materialization
    val qt = qs.select($"qid",
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.array_distinct(
          graft.functions.TextFunctions.tokens($"qtext"))).as("term"))
    val probe = corpus
      .select($"doc_id",
        org.apache.spark.sql.functions.explode(
          graft.functions.TextFunctions.tokens($"text")).as("term"))
      .join(org.apache.spark.sql.functions.broadcast(qt), Seq("term"))
    val probePlan = probe.queryExecution.executedPlan.toString
    assert(probePlan.contains("BroadcastHashJoin"), probePlan)
  }
}
