package graft.operators

import graft.SparkSpec

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf sums 1/(c+rk) across lists, 0 for absent, reranks and caps k") {
    val lex = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("qid", "doc_id", "rk")
    val vec = Seq((0L, 11L, 1L), (0L, 13L, 2L))
      .toDF("qid", "doc_id", "rk")
    val got = Fusion.rrf(lex, vec, k = 3)
      .select($"doc_id", $"rrf").as[(Long, Double)].collect().toMap
    // doc 11 in both lists at ranks 2 and 1
    assert(got(11L) == 1.0 / (60.0 + 2.0) + 1.0 / (60.0 + 1.0))
    assert(got(10L) == 1.0 / 61.0) // lex only
    assert(got.size == 3 && got.contains(13L) && !got.contains(12L))
    // 13 (vec rank 2) outranks 10 (lex rank 1)? 1/62 < 1/61 -> no:
    // order must be 11, 10, 13
    val order = Fusion.rrf(lex, vec, k = 3)
      .orderBy($"rk").select($"doc_id").as[Long].collect().toSeq
    assert(order == Seq(11L, 10L, 13L))
  }

  test("rrf ties break by doc_id; queries stay independent") {
    val a = Seq((0L, 5L, 1L), (0L, 4L, 1L), (1L, 9L, 1L))
      .toDF("qid", "doc_id", "rk")
    val b = spark.emptyDataFrame
      .sparkSession.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        a.schema)
    val out = Fusion.rrf(a, b, k = 10)
      .select($"qid", $"doc_id", $"rk".cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    // same rrf for 4 and 5 -> doc_id ascending wins
    assert(out == Set((0L, 4L, 1L), (0L, 5L, 2L), (1L, 9L, 1L)))
  }
}
