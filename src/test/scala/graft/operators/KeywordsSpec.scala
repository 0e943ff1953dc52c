package graft.operators

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple apple banana common"),
    (2L, "banana cherry common"),
    (3L, "cherry cherry cherry common")
  ).toDF("doc_id", "text")

  test("tfidfTopK: exact quantized scores on a hand fixture") {
    val got = Keywords.tfidfTopK(docs, "doc_id", "text", k = 2)
      .orderBy($"doc_id", $"score_micro".desc, $"term")
      .as[(Long, String, Long, Long)].collect().toSeq
    // N=3; df: apple 1, banana 2, cherry 2, common 3
    val ln3 = math.floor(1e6 * math.log(3.0)).toLong       // 1098612
    val ln15 = math.floor(1e6 * math.log(1.5)).toLong      // 405465
    assert(got == Seq(
      (1L, "apple", 2L, 2 * ln3), (1L, "banana", 1L, ln15),
      (2L, "banana", 1L, ln15), (2L, "cherry", 1L, ln15),
      (3L, "cherry", 3L, 3 * ln15), (3L, "common", 1L, 0L)),
      got.toString)
  }

  test("tfidfTopK: corpus-wide terms score zero, ties break on term") {
    // doc 2's two scored terms tie at ln(1.5); banana sorts first,
    // and k=1 keeps only it
    val one = Keywords.tfidfTopK(docs, "doc_id", "text", k = 1)
      .filter($"doc_id" === 2L)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(one.map(_._2) == Seq("banana"), one.toString)
    intercept[IllegalArgumentException] {
      Keywords.tfidfTopK(docs, "doc_id", "text", k = 0)
    }
  }

  test("rakeTopK: deg/freq phrase scores on the classic hand example") {
    val d = Seq((1L, "Deep learning of deep networks, and learning!"))
      .toDF("doc_id", "text")
    val got = Keywords.rakeTopK(d, "doc_id", "text", k = 5)
      .orderBy($"score_micro".desc, $"phrase")
      .as[(Long, String, Long)].collect().toSeq
    // phrases: "deep learning"(2), "deep networks"(2), "learning"(1)
    // deep: freq 2, deg 4 -> 2_000_000 ; learning: freq 2, deg 3 ->
    // 1_500_000 ; networks: freq 1, deg 2 -> 2_000_000
    assert(got == Seq(
      (1L, "deep networks", 4000000L),
      (1L, "deep learning", 3500000L),
      (1L, "learning", 1500000L)), got.toString)
  }

  test("rakeTopK: over-length candidates vanish from the statistics") {
    val d = Seq((1L, "deep learning of deep networks and learning"))
      .toDF("doc_id", "text")
    // maxWords=1: both 2-word runs are discarded entirely, so the
    // sole candidate "learning" scores deg=freq=1 -> 1.0
    val got = Keywords.rakeTopK(d, "doc_id", "text", k = 5,
        maxWords = 1)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "learning", 1000000L)), got.toString)
    // duplicate phrases report once
    val dup = Seq((2L, "red car and red car")).toDF("doc_id", "text")
    val phrases = Keywords.rakeTopK(dup, "doc_id", "text", k = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(phrases.map(_._2) == Seq("red car"), phrases.toString)
    intercept[IllegalArgumentException] {
      Keywords.rakeTopK(d, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Keywords.rakeTopK(d, "doc_id", "text", k = 1, maxWords = 0)
    }
    intercept[IllegalArgumentException] {
      Keywords.rakeTopK(d, "doc_id", "text", k = 1,
        stopwords = Seq.empty)
    }
  }

  test("plan: tf/df map-side combine; idf N is a broadcast, not a scan") {
    val plan = Keywords.tfidfTopK(docs, "doc_id", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"tf/df must map-side combine:\n$plan")
    assert(plan.contains("BroadcastExchange"),
      s"the one-row N frame must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian anywhere:\n$plan")
  }
}
