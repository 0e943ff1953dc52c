package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  // "new york" always adjacent (collocated); "the" frequent and
  // independent — PMI must rank the bound pair above the common one
  private val docs = Seq(
    (1L, "the firm moved to new york last year"),
    (2L, "new york rents the analysts say keep rising"),
    (3L, "she left the office in new york yesterday"),
    (4L, "the report cites new york the hub of finance"),
    (5L, "the the the filler filler the document")
  ).toDF("doc_id", "text")

  test("topPmi: bound pair outranks frequent independent pair; exact key") {
    val out = Collocations.topPmi(docs, "text", k = 50, minCount = 2)
      .select($"w1", $"w2", $"c12", $"c1", $"c2", $"pmi_q", $"rk")
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val ny = out.find(r => r._1 == "new" && r._2 == "york").get
    assert(ny._3 == 4L && ny._4 == 4L && ny._5 == 4L) // always adjacent
    // driver-recomputed quantized PMI: same formula, same JVM ln
    val toks = docs.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).toSeq
    val n1 = toks.size.toLong
    val n12 = docs.as[(Long, String)].collect()
      .map(_._2.split(" ").length - 1).sum.toLong
    def pmiQ(c12: Long, c1: Long, c2: Long): Long =
      math.floor(Collocations.PmiScale.toDouble * math.log(
        (c12.toDouble / n12.toDouble) /
          ((c1.toDouble / n1.toDouble) * (c2.toDouble / n1.toDouble))))
        .toLong
    assert(ny._6 == pmiQ(4L, 4L, 4L))
    // every emitted row matches the reference formula
    out.foreach { r => assert(r._6 == pmiQ(r._3, r._4, r._5), r) }
    // "the the" occurs (doc 5) but "the" is frequent → lower PMI
    val thethe = out.find(r => r._1 == "the" && r._2 == "the").get
    assert(ny._6 > thethe._6)
    assert(ny._7 < thethe._7) // rank order follows
  }

  test("topPmi: deterministic under repartition; minCount prunes; guards") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"w1", $"w2", $"pmi_q", $"rk")
        .as[(String, String, Long, Long)].collect().toSeq
    val a = rows(Collocations.topPmi(docs, "text", 10, minCount = 2))
    val b = rows(Collocations.topPmi(docs.repartition(7), "text", 10,
      minCount = 2))
    assert(a == b && a.nonEmpty)
    // minCount excludes singleton pairs entirely
    val k2 = Collocations.topPmi(docs, "text", 100, minCount = 2)
      .select($"c12").as[Long].collect()
    assert(k2.forall(_ >= 2))
    // margin guard: absurd threshold throws, sane one passes
    intercept[IllegalStateException] {
      Collocations.topPmi(docs, "text", 5, minCount = 2,
        minQuantMargin = Some(0.5))
    }
    val n = Collocations.topPmi(docs, "text", 5, minCount = 2,
      minQuantMargin = Some(1e-9)).count()
    assert(n >= 2 && n <= 5) // only the repeated pairs qualify
    // minCount prunes EVERYTHING: the margin audit has nothing to
    // check and must skip cleanly (was an opaque NPE on getDouble)
    assert(Collocations.topPmi(docs, "text", 5, minCount = 1000000,
      minQuantMargin = Some(0.5)).count() == 0)
    Collocations.releaseIntermediates()
  }
}
