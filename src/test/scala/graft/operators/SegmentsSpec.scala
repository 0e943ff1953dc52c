package graft.operators

import graft.SparkSpec

class SegmentsSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  // 4 customers, tiles=2: c1 buys latest+most, c4 stale+least
  private val tx = Seq(
    (1L, 10 * day, 100.00), (1L, 9 * day, 50.00), (1L, 8 * day, 25.00),
    (2L, 9 * day, 80.00), (2L, 7 * day, 10.00),
    (3L, 5 * day, 60.00),
    (4L, 1 * day, 1.50)
  ).toDF("c", "t", "amt")

  test("rfm: exact day/cent arithmetic, tie-free ntile grading") {
    val got = Segments.rfm(tx, "c", "t", "amt", tiles = 2)
      .orderBy($"r_q", $"f_q", $"m_q")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // recency days from anchor (day 10): c1=0, c2=1, c3=5, c4=9
    //   -> r_q: c1,c2 = 1; c3,c4 = 2
    // frequency: c1=3, c2=2, c3=1, c4=1 (tie breaks by key: c3 first)
    //   -> f_q: c1,c2 = 1; c3,c4 = 2
    // monetary cents: c1=17500, c2=9000, c3=6000, c4=150
    //   -> m_q: c1,c2 = 1; c3,c4 = 2
    assert(got == Seq((1L, 1L, 1L, 2L, 26500L),
      (2L, 2L, 2L, 2L, 6150L)), got.toString)
  }

  test("rfm: monetary cents are rounded per row, not summed doubles") {
    // 0.1+0.2 style drift: 3 rows of 0.10 must sum to exactly 30 cents
    val t2 = Seq((1L, day, 0.10), (1L, day, 0.10), (1L, day, 0.10),
      (2L, day, 1.00)).toDF("c", "t", "amt")
    val cells = Segments.rfm(t2, "c", "t", "amt", tiles = 1)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(cells == Seq((1L, 1L, 1L, 2L, 130L)), cells.toString)
  }

  test("rfm: guards are loud") {
    intercept[IllegalArgumentException] {
      Segments.rfm(tx, "c", "t", "amt", tiles = 0)
    }
  }
}
