package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, "a", 5L), (2L, "a", 25L), (3L, "a", 95L), (4L, "b", 5L))
    .toDF("pid", "k", "p")
  private lazy val intervals = Seq(
    (10L, "a", 0L, 30L),    // catches points 5, 25
    (11L, "a", 20L, 100L),  // catches 25, 95 — overlaps the first
    (12L, "b", 50L, 60L))   // catches nothing
    .toDF("iid", "k", "lo", "hi")

  test("matches equal the naive inequality join, no duplicates") {
    for (w <- Seq(7L, 30L, 1000L)) { // cell width must not change results
      val got = RangeJoin.pointInInterval(points, intervals,
        "p", "lo", "hi", cellWidth = w, keyCols = Seq("k"))
        .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L)),
        s"cellWidth=$w")
    }
  }

  test("inclusive bounds on both ends") {
    val pts = Seq((1L, "a", 0L), (2L, "a", 30L)).toDF("pid", "k", "p")
    val got = RangeJoin.pointInInterval(pts,
      intervals.filter($"iid" === 10L), "p", "lo", "hi", 10L, Seq("k"))
      .select($"pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("plan: hash join on (key, cell), not nested-loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
      "p", "lo", "hi", 10L, Seq("k")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
