package graft.operators

import graft.SparkSpec

class BasketSpec extends SparkSpec {
  import spark.implicits._

  // baskets: {a,b} ×3, {a,c}, {b,c}, {a} — N=6
  private val rows = Seq(
    (1L, "a"), (1L, "b"), (1L, "a") /* dup item dedupes */,
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "b"),
    (4L, "a"), (4L, "c"),
    (5L, "b"), (5L, "c"),
    (6L, "a")
  ).toDF("o", "i")

  test("associationRules: exact support/confidence/lift on a fixture") {
    val got = Basket.associationRules(rows, "o", "i",
        minSupport = 1L, k = 10)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // supports: a=5, b=4, c=2; N=6
    // a->b: both 3, conf 3/5=600000, lift 6*3/(5*4)=900000
    assert(got(("a", "b")) == ((3L, 600000L, 900000L)))
    // b->a: conf 3/4 = 750000, same lift
    assert(got(("b", "a")) == ((3L, 750000L, 900000L)))
    // a->c: both 1, conf 1/5 = 200000, lift 6/(5*2) = 600000
    assert(got(("a", "c")) == ((1L, 200000L, 600000L)))
    // c->b: both 1, conf 1/2, lift 6/(2*4) = 750000
    assert(got(("c", "b")) == ((1L, 500000L, 750000L)))
    assert(got.size == 6) // all ordered pairs with co-occurrence
  }

  test("associationRules: min-support prune, basket cap, guards") {
    val pruned = Basket.associationRules(rows, "o", "i",
        minSupport = 2L, k = 10)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(pruned.map(r => (r._1, r._2)).toSet ==
      Set(("a", "b"), ("b", "a")), pruned.toString)
    // cap at 2 items: every basket qualifies except none here; with a
    // 3-item basket added, capping at 2 drops ONLY that basket
    val wide = rows.union(
      Seq((7L, "a"), (7L, "b"), (7L, "c")).toDF("o", "i"))
    val capped = Basket.associationRules(wide, "o", "i", 1L, 10,
        maxBasketItems = 2)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(capped(("a", "b")) == 3L) // basket 7 contributed nothing
    val uncapped = Basket.associationRules(wide, "o", "i", 1L, 10)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(uncapped(("a", "b")) == 4L)
    intercept[IllegalArgumentException] {
      Basket.associationRules(rows, "o", "i", 0L, 1)
    }
    intercept[IllegalArgumentException] {
      Basket.associationRules(rows, "o", "i", 1L, 0)
    }
    intercept[IllegalArgumentException] {
      Basket.associationRules(rows, "o", "i", 1L, 1, maxBasketItems = 1)
    }
  }
}
