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
