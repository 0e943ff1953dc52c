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

  test("activityDeciles: exact shares, most-active first") {
    // u1: 3 events incl. purchase 100c ; u2: 2 events, purchase 300c
    // u3: 1 event, no purchase ; u4: 1 event, purchase 100c
    val ev = Seq(
      (1L, "view", 0L), (1L, "view", 0L), (1L, "purchase", 100L),
      (2L, "view", 0L), (2L, "purchase", 300L),
      (3L, "view", 0L),
      (4L, "purchase", 100L)
    ).toDF("u", "ty", "cents")
    val got = Segments.activityDeciles(ev, "u", "ty", "cents",
        tiles = 2)
      .orderBy($"decile")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // tile 1 (most active): u1, u2 -> 5 events, 400c, share 400/500
    // tile 2: u3, u4 -> 2 events, 100c, share 100/500
    assert(got == Seq((1L, 2L, 5L, 400L, 800000L),
      (2L, 2L, 2L, 100L, 200000L)), got.toString)
    // zero total revenue -> all shares 0, not division errors
    val none = Seq((1L, "view", 0L), (2L, "view", 0L))
      .toDF("u", "ty", "cents")
    val z = Segments.activityDeciles(none, "u", "ty", "cents",
        tiles = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(z.forall(_._5 == 0L), z.mkString(","))
    intercept[IllegalArgumentException] {
      Segments.activityDeciles(ev, "u", "ty", "cents", tiles = 0)
    }
  }

  test("rfm: guards are loud") {
    intercept[IllegalArgumentException] {
      Segments.rfm(tx, "c", "t", "amt", tiles = 0)
    }
  }
}
