package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  // key a: events at 0,10,20 | 100,105 (gap 80 > 50) ; key b: single event
  private lazy val ev = Seq(
    ("a", 1L, 0L), ("a", 2L, 10L), ("a", 3L, 20L),
    ("a", 4L, 100L), ("a", 5L, 105L), ("b", 6L, 7L))
    .toDF("k", "id", "ts")

  test("assign: gap > maxGap starts a new session; ordinals are 1-based") {
    val out = Sessionize.assign(ev, "k", "ts", maxGap = 50L, tieCol = "id")
      .select($"k", $"id", $"session_ord").as[(String, Long, Long)]
      .collect().toSet
    assert(out == Set(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("a", 4L, 2L), ("a", 5L, 2L), ("b", 6L, 1L)))
  }

  test("boundary: gap exactly maxGap stays in the session") {
    val e = Seq(("a", 1L, 0L), ("a", 2L, 50L), ("a", 3L, 101L))
      .toDF("k", "id", "ts")
    val out = Sessionize.assign(e, "k", "ts", 50L, "id")
      .select($"id", $"session_ord").as[(Long, Long)].collect().toMap
    assert(out(2L) == 1L) // gap == 50 -> same session
    assert(out(3L) == 2L) // gap 51 -> new
  }

  test("stats: bounds, counts, duration, value sum") {
    val out = Sessionize.stats(ev.withColumn("v", lit(2L).cast("double")),
      "k", "ts", 50L, "id", valueCol = Some("v"))
      .orderBy($"k", $"session_ord").collect()
    val s1 = out(0)
    assert(s1.getAs[Long]("n_events") == 3L)
    assert(s1.getAs[Long]("start_ts") == 0L &&
      s1.getAs[Long]("end_ts") == 20L && s1.getAs[Long]("duration") == 20L)
    assert(s1.getAs[Double]("sum_v") == 6.0)
    assert(out(1).getAs[Long]("n_events") == 2L)
    assert(out(2).getAs[Long]("n_events") == 1L)
  }

  test("plan: one hash exchange on the key feeds both windows and the agg") {
    val plan = Sessionize.stats(ev, "k", "ts", 50L, "id")
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(k".r.findAllIn(plan).size >= 1)
    assert(!plan.contains("CartesianProduct"))
  }
}
