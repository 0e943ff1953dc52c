package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench pass-scheduling protocol against a fake
  * clock — no Spark. The protocol is load-bearing evidence surface
  * (two driver rounds were lost to wrapper timeouts), so its
  * classification, variance re-entry, deadline degradation, and
  * failure-penalty paths are pinned here.
  */
class BenchSpecSuite extends AnyFunSuite {

  /** Scripted executor: pops the next PassResult per (query) in call
    * order, advances the fake clock by the pass's elapsed time, and
    * records the (tag, name) trace.
    */
  final class Rig(script: Map[String, Seq[PassResult]]) {
    var clock = 0.0
    val trace = scala.collection.mutable.ArrayBuffer[(String, String)]()
    private val remaining =
      scala.collection.mutable.Map(script.view.mapValues(_.toList).toSeq: _*)
    def exec(tag: String, name: String): PassResult = {
      trace += ((tag, name))
      val head :: tail = remaining(name): @unchecked
      remaining(name) = if (tail.isEmpty) List(head) else tail // last repeats
      clock += head.sec
      head
    }
    def run(names: Seq[String], budget: Double = 1e9): BenchOutcome =
      BenchProtocol.run(names, exec, () => clock, budget)
  }
  private def ok(s: Double) = PassResult(s, None)
  private def err(s: Double) = PassResult(s, Some("boom"))

  test("fast query: exactly one warmup + one timed pass, result is the min") {
    val rig = new Rig(Map("q" -> Seq(ok(2.0), ok(0.3)))) // cold warmup, fast timed
    val out = rig.run(Seq("q"))
    assert(rig.trace == Seq(("warmup", "q"), ("timed", "q")))
    assert(out.results("q") == 0.3)
    assert(out.failed.isEmpty && out.degraded.isEmpty)
  }

  test("fast classification uses the timed pass, not the cold warmup") {
    // Old protocol classified on the warmup: a 2.0 s cold warmup made
    // this query 'slow' and cost 4 passes. New protocol: 2 passes.
    val rig = new Rig(Map("q" -> Seq(ok(2.0), ok(0.4))))
    rig.run(Seq("q"))
    assert(rig.trace.size == 2)
  }

  test("slow query gets a second timed pass, result is min over all passes") {
    val rig = new Rig(Map("q" -> Seq(ok(3.0), ok(2.0), ok(1.8))))
    val out = rig.run(Seq("q"))
    assert(rig.trace.map(_._1) == Seq("warmup", "timed", "timed2"))
    assert(out.results("q") == 1.8)
  }

  test("variance above 25% of the faster pass triggers a third timed pass") {
    // timed=2.0, timed2=4.0 → |4-2| > 0.25*2 and 2.0 > jitter floor
    val rig = new Rig(Map("q" -> Seq(ok(3.0), ok(2.0), ok(4.0), ok(1.5))))
    val out = rig.run(Seq("q"))
    assert(rig.trace.map(_._1).contains("timed3"))
    assert(out.results("q") == 1.5)
  }

  test("variance below the 0.5 s jitter floor does NOT trigger a third pass") {
    // passes 0.30 vs 0.45: 50% apart but min is under the jitter floor.
    // warmup errors so the query is not fast-classified.
    val rig = new Rig(Map("q" -> Seq(err(0.1), ok(0.30), ok(0.45))))
    val out = rig.run(Seq("q"))
    assert(!rig.trace.map(_._1).contains("timed3"))
    assert(out.results("q") == 0.3)
  }

  test("a warmup error disqualifies fast classification") {
    val rig = new Rig(Map("q" -> Seq(err(0.1), ok(0.3), ok(0.3))))
    rig.run(Seq("q"))
    assert(rig.trace.map(_._1) == Seq("warmup", "timed", "timed2"))
  }

  test("both timed passes failing yields the 600 s penalty and failed flag") {
    val rig = new Rig(Map("q" -> Seq(err(1.0), err(1.0), err(1.0))))
    val out = rig.run(Seq("q"))
    assert(out.results("q") == BenchProtocol.FailurePenalty)
    assert(out.failed == Set("q"))
    assert(out.errors("q") == "boom")
  }

  test("a one-pass transient error is absorbed by the green sibling pass") {
    val rig = new Rig(Map("q" -> Seq(ok(3.0), err(0.1), ok(2.2))))
    val out = rig.run(Seq("q"))
    assert(out.results("q") == 2.2)
    assert(out.failed.isEmpty)
  }

  test("wall budget: extra passes are skipped, results still produced") {
    // Budget 10 s; warmup+timed for both queries consume 3+3+3+3=12 s,
    // so the slow queries' warmup2/timed2 are all budget-skipped and
    // the single-pass evidence stands, flagged degraded.
    val rig = new Rig(Map(
      "q1" -> Seq(ok(3.0), ok(3.0)),
      "q2" -> Seq(ok(3.0), ok(3.0))))
    val out = rig.run(Seq("q1", "q2"), budget = 10.0)
    assert(out.results("q1") == 3.0 && out.results("q2") == 3.0)
    assert(out.degraded == Set("q1", "q2"))
    assert(!rig.trace.map(_._1).contains("timed2"))
  }

  test("wall budget never cancels the guaranteed warmup + first timed pass") {
    val rig = new Rig(Map(
      "q1" -> Seq(ok(5.0), ok(5.0)),
      "q2" -> Seq(ok(5.0), ok(5.0))))
    val out = rig.run(Seq("q1", "q2"), budget = 1.0) // hopeless budget
    assert(rig.trace.count(_._1 == "warmup") == 2)
    assert(rig.trace.count(_._1 == "timed") == 2)
    assert(out.results.size == 2)
  }

  // Three sub-second control queries: their times set the cross-query
  // median so a single all-passes-stalled query reads as an outlier.
  private val controls = Map(
    "c1" -> Seq(ok(0.6), ok(0.2)),
    "c2" -> Seq(ok(0.6), ok(0.2)),
    "c3" -> Seq(ok(0.6), ok(0.2)))

  test("outlier retry: a stall spanning every pass is retried down") {
    // all three passes stalled at ~6 s (>10x the 0.2 s cross-query
    // median, >1 s absolute) → retry recovers the honest 0.9 s.
    val rig = new Rig(controls ++ Map("q" ->
      Seq(ok(6.0), ok(6.0), ok(6.1), ok(0.9))))
    val out = rig.run(Seq("c1", "c2", "c3", "q"))
    assert(rig.trace.map(_._1).count(_.startsWith("retry")) >= 1)
    assert(out.results("q") == 0.9)
  }

  test("a failed retry never overwrites the best green time") {
    val rig = new Rig(controls ++ Map("q" ->
      Seq(ok(6.0), ok(6.0), ok(6.1), err(0.1), err(0.1))))
    val out = rig.run(Seq("c1", "c2", "c3", "q"))
    assert(out.results("q") == 6.0)
    assert(out.failed.isEmpty)
  }

  test("realistic mixed registry stays within a small pass budget") {
    // 200 fast queries + 5 slow ones: the schedule should cost about
    // 2 passes per fast query and 3 per slow one — the property that
    // keeps the full registry inside the driver wrapper timeout.
    val fast = (1 to 200).map(i => f"f$i%03d" -> Seq(ok(0.6), ok(0.2)))
    val slow = (1 to 5).map(i => f"s$i" -> Seq(ok(3.0), ok(2.0), ok(2.1)))
    val rig = new Rig((fast ++ slow).toMap)
    val out = rig.run((fast ++ slow).map(_._1))
    assert(rig.trace.size == 200 * 2 + 5 * 3)
    assert(out.failed.isEmpty && out.degraded.isEmpty)
  }
}
