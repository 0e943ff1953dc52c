package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, t, id) — micros are plain longs here
  private val events = Seq(
    // u1: clean A -> B -> C
    (1L, "A", 100L, 1L), (1L, "B", 200L, 2L), (1L, "C", 300L, 3L),
    // u2: B before A does NOT count; the later B does
    (2L, "B", 50L, 10L), (2L, "A", 100L, 11L), (2L, "B", 150L, 12L),
    // u3: A only
    (3L, "A", 100L, 20L),
    // u4: C strictly before B's binding -> funnel stops at B
    (4L, "A", 100L, 30L), (4L, "C", 150L, 31L), (4L, "B", 200L, 32L),
    // u5: tie on t — id breaks it: B(id 41) binds AFTER A(id 40)
    (5L, "A", 100L, 40L), (5L, "B", 100L, 41L), (5L, "C", 101L, 42L),
    // u6: B exists but outside the span from first A
    (6L, "A", 100L, 50L), (6L, "B", 10000L, 51L),
    // u7: no A at all — never enters
    (7L, "B", 100L, 60L), (7L, "C", 200L, 61L)
  ).toDF("u", "ty", "t", "id")

  private def report(span: Option[Long]) =
    Funnel.conversion(events, "u", "t", "id", "ty",
        Seq("A", "B", "C"), span)
      .orderBy($"step")
      .as[(Long, String, Long)].collect().toSeq

  test("greedy-earliest semantics on a hand fixture") {
    // unbounded span: u1,u2,u3,u4,u5,u6 enter; B: u1,u2,u4,u5,u6;
    // C: u1 (300>200), u4? C(150) < B-binding(200) -> no; u5 yes
    assert(report(None) == Seq((1L, "A", 6L), (2L, "B", 5L),
      (3L, "C", 2L)))
    // span 500 from first A: u6's B at 10000 is out
    assert(report(Some(500L)) == Seq((1L, "A", 6L), (2L, "B", 4L),
      (3L, "C", 2L)))
  }

  test("completions binds the earliest qualifying event per step") {
    val c = Funnel.completions(events, "u", "t", "id", "ty",
        Seq("A", "B", "C"))
      .select($"u", $"step", $"t", $"id")
      .as[(Long, Long, Long, Long)].collect().toSet
    // u2's B binds the 150/12 event (the 50/10 one precedes its A)
    assert(c.contains((2L, 2L, 150L, 12L)))
    assert(!c.contains((2L, 2L, 50L, 10L)))
    // u5's tie: B binds at the same t with the larger id
    assert(c.contains((5L, 2L, 100L, 41L)))
    // u7 never enters the funnel
    assert(!c.exists(_._1 == 7L))
  }

  test("zero-reached steps still report; guards are loud") {
    val r = Funnel.conversion(events, "u", "t", "id", "ty",
        Seq("A", "B", "C", "A2"), None)
      .orderBy($"step").as[(Long, String, Long)].collect().toSeq
    assert(r.last == ((4L, "A2", 0L)), r.toString)
    intercept[IllegalArgumentException] {
      Funnel.conversion(events, "u", "t", "id", "ty", Nil, None)
    }
    intercept[IllegalArgumentException] {
      Funnel.conversion(events, "u", "t", "id", "ty", Seq("A", "A"),
        None)
    }
    intercept[IllegalArgumentException] {
      Funnel.conversion(events, "u", "t", "id", "ty", Seq("A"),
        Some(0L))
    }
  }

  test("retentionCohorts: first-bucket cohorts, k-offset return counts") {
    val B = 10L
    val act = Seq(
      // cohort 0: u1 active buckets 0,1,3; u2 active 0 only
      (1L, 1L), (1L, 5L), (1L, 12L), (1L, 33L),
      (2L, 7L),
      // cohort 2: u3 active buckets 2 and 3
      (3L, 21L), (3L, 29L), (3L, 35L)
    ).toDF("u", "t")
    val got = Funnel.retentionCohorts(act, "u", "t", B)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (2L, 0L, 1L), (2L, 1L, 1L)), got.toString)
    intercept[IllegalArgumentException] {
      Funnel.retentionCohorts(act, "u", "t", 0L)
    }
  }

  test("transitionMatrix: adjacent pairs per user, exact ppm rows") {
    // u1: A->B->A ; u2: A->B ; ties on t break by id (u3: A(40),B(41))
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L),
      (2L, "A", 10L, 4L), (2L, "B", 20L, 5L),
      (3L, "B", 100L, 41L), (3L, "A", 100L, 40L)
    ).toDF("u", "ty", "t", "id")
    val got = Funnel.transitionMatrix(ev, "u", "t", "id", "ty")
      .as[(String, String, Long, Long)].collect().toSet
    // transitions: A->B (u1, u2, u3) = 3; B->A (u1) = 1
    assert(got == Set(("A", "B", 3L, 1000000L), ("B", "A", 1L,
      1000000L)), got.toString)
    intercept[IllegalArgumentException] {
      Funnel.transitionMatrix(ev, "u", "t", "id", "ty", scale = 0L)
    }
  }

  test("topPaths: first-pathLen prefixes, deterministic top-k ties") {
    // u1: A>B>C (3 events, pathLen 2 -> A>B); u2: A>B; u3: B>A
    // (tie on t at u3 breaks by id: A(40) before B(41) -> A>B)
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "C", 30L, 3L),
      (2L, "A", 10L, 4L), (2L, "B", 20L, 5L),
      (3L, "B", 100L, 41L), (3L, "A", 100L, 40L),
      (4L, "C", 10L, 50L)
    ).toDF("u", "ty", "t", "id")
    val got = Funnel.topPaths(ev, "u", "t", "id", "ty", 2, 10)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("A>B", 3L), ("C", 1L)), got.toString)
    // k cuts on (n_users desc, path asc): with k=1 only A>B survives
    val top1 = Funnel.topPaths(ev, "u", "t", "id", "ty", 2, 1)
      .as[(String, Long)].collect().toSeq
    assert(top1 == Seq(("A>B", 3L)))
    // shorter-than-pathLen histories keep their full prefix (u4: "C")
    intercept[IllegalArgumentException] {
      Funnel.topPaths(ev, "u", "t", "id", "ty", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Funnel.topPaths(ev, "u", "t", "id", "ty", 2, 0)
    }
  }

  test("stickiness: trailing-window distincts, exact ppm ratio") {
    val day = 86400000000L
    // u1 active d0,d1; u2 active d0; u3 active d2 (twice — dedupes)
    val ev = Seq((1L, 0L), (1L, day), (2L, 0L), (3L, 2 * day),
      (3L, 2 * day + 5L)).toDF("u", "t")
    val got = Funnel.stickiness(ev, "u", "t", horizon = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // d0: dau {u1,u2}=2, mau(window d-1..d0) {u1,u2}=2 -> 1.0
    // d1: dau {u1}=1, mau {u1,u2}=2 -> 0.5
    // d2: dau {u3}=1, mau {u1,u3}=2 -> 0.5
    assert(got == Set((0L, 2L, 2L, 1000000L), (1L, 1L, 2L, 500000L),
      (2L, 1L, 2L, 500000L)), got.toString)
    // horizon=1 degenerates to dau==mau everywhere
    val h1 = Funnel.stickiness(ev, "u", "t", horizon = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(h1.forall(r => r._2 == r._3 && r._4 == 1000000L))
    intercept[IllegalArgumentException] {
      Funnel.stickiness(ev, "u", "t", horizon = 0)
    }
  }

  test("attribution: first/last-touch crediting, [NONE] sentinel") {
    // u1: view -> click -> purchase(50) ; first=view last=click
    // u2: purchase(30) with no prior touch ; first=purchase last=[NONE]
    // u3: click -> purchase(20) -> purchase(10): second purchase's
    //     last touch is still click (purchases never self-credit)
    val ev = Seq(
      (1L, "view", 10L, 1L, 0L), (1L, "click", 20L, 2L, 0L),
      (1L, "purchase", 30L, 3L, 50L),
      (2L, "purchase", 10L, 10L, 30L),
      (3L, "click", 10L, 20L, 0L), (3L, "purchase", 20L, 21L, 20L),
      (3L, "purchase", 30L, 22L, 10L)
    ).toDF("u", "ty", "t", "id", "cents")
    val got = Funnel.attribution(ev, "u", "t", "id", "ty", "cents")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("first", "view", 1L, 50L), ("first", "purchase", 1L, 30L),
      ("first", "click", 2L, 30L),
      ("last", "click", 3L, 80L), ("last", "[NONE]", 1L, 30L)),
      got.toString)
    intercept[IllegalArgumentException] {
      Funnel.attribution(ev, "u", "t", "id", "ty", "cents", "")
    }
  }

  test("conversionLatency: deltas vs first-step binding, rank quantiles") {
    // A->B funnel; deltas: u1 = 100, u2 = 300, u3 = 200
    val ev = Seq(
      (1L, "A", 0L, 1L), (1L, "B", 100L, 2L),
      (2L, "A", 0L, 3L), (2L, "B", 300L, 4L),
      (3L, "A", 0L, 5L), (3L, "B", 200L, 6L),
      (4L, "A", 0L, 7L) // never converts: no latency row
    ).toDF("u", "ty", "t", "id")
    val got = Funnel.conversionLatency(ev, "u", "t", "id", "ty",
        Seq("A", "B"))
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // n=3: p50 rank ceil(1.5)=2 -> 200 ; p90 rank ceil(2.7)=3 -> 300
    assert(got == Seq((2L, "B", 3L, 200L, 300L)), got.toString)
    intercept[IllegalArgumentException] {
      Funnel.conversionLatency(ev, "u", "t", "id", "ty", Seq("A"))
    }
  }

  test("topKgrams: contiguous k-grams per user, cross-user isolation") {
    // u1: A B A B -> trigrams A>B>A, B>A>B ; u2: B A B -> B>A>B
    val ev = Seq(
      (1L, "A", 10L, 1L), (1L, "B", 20L, 2L), (1L, "A", 30L, 3L),
      (1L, "B", 40L, 4L),
      (2L, "B", 10L, 10L), (2L, "A", 20L, 11L), (2L, "B", 30L, 12L)
    ).toDF("u", "ty", "t", "id")
    val got = Funnel.topKgrams(ev, "u", "t", "id", "ty", n = 3, k = 10)
      .as[(String, Long)].collect().toSet
    assert(got == Set(("B>A>B", 2L), ("A>B>A", 1L)), got.toString)
    // n=2 degenerates to the transition counts
    val bi = Funnel.topKgrams(ev, "u", "t", "id", "ty", n = 2, k = 10)
      .as[(String, Long)].collect().toSet
    assert(bi == Set(("A>B", 3L), ("B>A", 2L)), bi.toString)
    intercept[IllegalArgumentException] {
      Funnel.topKgrams(ev, "u", "t", "id", "ty", n = 1, k = 1)
    }
    intercept[IllegalArgumentException] {
      Funnel.topKgrams(ev, "u", "t", "id", "ty", n = 3, k = 0)
    }
  }

  test("cohortValue: first-bucket cohorts, running cumulative") {
    val day = 86400000000L
    // u1 first pays day 0 (10c), again day 2 (20c);
    // u2 first pays day 2 (40c) — its k=0 is cohort 2, not 0
    val ev = Seq((1L, 0L, 10L), (1L, 2 * day, 20L),
      (2L, 2 * day, 40L)).toDF("u", "t", "cents")
    val got = Funnel.cohortValue(ev, "u", "t", "cents", day)
      .orderBy($"cohort", $"k")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 10L, 10L), (0L, 2L, 20L, 30L),
      (2L, 0L, 40L, 40L)), got.toString)
    intercept[IllegalArgumentException] {
      Funnel.cohortValue(ev, "u", "t", "cents", 0L)
    }
  }

  test("conversionRateCi: exact rates, CI brackets the point estimate") {
    // 20 enterers, 10 reach B: rate 500000
    val ev = (1L to 20L).flatMap { u =>
      Seq((u, "A", 10L, u * 10)) ++
        (if (u <= 10) Seq((u, "B", 20L, u * 10 + 1)) else Nil)
    }.toDF("u", "ty", "t", "id")
    val got = Funnel.conversionRateCi(ev, "u", "t", "id", "ty",
        Seq("A", "B"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert((got._1, got._2, got._3, got._4) == ((2L, 20L, 10L,
      500000L)), got.toString)
    // the 95% interval brackets the point and is non-degenerate
    assert(got._5 <= 500000L && 500000L <= got._6, got.toString)
    assert(got._5 < got._6, got.toString)
    // and stays inside [0, 1e6]
    assert(got._5 >= 0L && got._6 <= 1000000L)
    intercept[IllegalArgumentException] {
      Funnel.conversionRateCi(ev, "u", "t", "id", "ty", Seq("A"))
    }
  }

  test("markovAccuracy: argmax prediction, tie-break, accuracy identity") {
    import spark.implicits._
    // user 1: A B A B A  -> transitions A>B, B>A, A>B, B>A
    // user 2: A C        -> A>C
    // A: {B:2, C:1} -> predict B, acc 2/3; B: {A:2} -> predict A, 1.0
    val ev = Seq((1L, 0L, 1L, "A"), (1L, 1L, 2L, "B"),
      (1L, 2L, 3L, "A"), (1L, 3L, 4L, "B"), (1L, 4L, 5L, "A"),
      (2L, 0L, 6L, "A"), (2L, 1L, 7L, "C"))
      .toDF("u", "t", "id", "ty")
    val got = Funnel.markovAccuracy(ev, "u", "t", "id", "ty")
      .orderBy($"prev_type")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 3L, 2L, 666666L),
      ("B", "A", 2L, 2L, 1000000L)), got.toString)
    // count tie breaks to the lexicographically smaller next type
    val tie = Seq((1L, 0L, 1L, "X"), (1L, 1L, 2L, "B"),
      (2L, 0L, 3L, "X"), (2L, 1L, 4L, "A")).toDF("u", "t", "id", "ty")
    val gotT = Funnel.markovAccuracy(tie, "u", "t", "id", "ty")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(gotT == Seq(("X", "A", 2L, 1L, 500000L)), gotT.toString)
    // simultaneous timestamps order by the id column (deterministic)
    val sim = Seq((1L, 5L, 1L, "P"), (1L, 5L, 2L, "Q"))
      .toDF("u", "t", "id", "ty")
    val gotS = Funnel.markovAccuracy(sim, "u", "t", "id", "ty")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(gotS == Seq(("P", "Q", 1L, 1L, 1000000L)), gotS.toString)
  }

  test("rapidRepeats: same-user same-type gaps only, threshold edge") {
    import spark.implicits._
    // user 1 type A at t=0, 5, 100; user 2 type A at t=7 (no pair
    // across users); user 1 type B at t=6 (no pair across types)
    val ev = Seq((1L, 0L, 1L, "A"), (1L, 5L, 2L, "A"),
      (1L, 100L, 3L, "A"), (2L, 7L, 4L, "A"), (1L, 6L, 5L, "B"))
      .toDF("u", "t", "id", "ty")
    val got = Funnel.rapidRepeats(ev, "u", "t", "id", "ty",
        withinMicros = 5L)
      .orderBy($"event_type")
      .as[(String, Long, Long, Long)].collect().toSeq
    // A: 4 events, one gap of exactly 5 (inclusive) counts; the
    // 95-gap doesn't; cross-user 7 never pairs. B: single event.
    assert(got == Seq(("A", 4L, 1L, 250000L), ("B", 1L, 0L, 0L)),
      got.toString)
    intercept[IllegalArgumentException] {
      Funnel.rapidRepeats(ev, "u", "t", "id", "ty", withinMicros = 0L)
    }
  }

  test("interarrivalVmr: metronome is zero-variance, burst spreads") {
    import spark.implicits._
    // user 1 type A at 0,100,200,300: constant gaps -> VMR 0
    val met = Seq((1L, 0L, 1L, "A"), (1L, 100L, 2L, "A"),
      (1L, 200L, 3L, "A"), (1L, 300L, 4L, "A")).toDF("u", "t", "id", "ty")
    val gotM = Funnel.interarrivalVmr(met, "u", "t", "id", "ty")
      .as[(String, Long, Long, Long)].collect().head
    assert(gotM == (("A", 3L, 100L, 0L)), gotM.toString)
    // gaps (100, 300): mean 200, variance 10000 -> VMR 50 exactly
    val burst = Seq((1L, 0L, 1L, "B"), (1L, 100L, 2L, "B"),
      (1L, 400L, 3L, "B")).toDF("u", "t", "id", "ty")
    val gotB = Funnel.interarrivalVmr(burst, "u", "t", "id", "ty")
      .as[(String, Long, Long, Long)].collect().head
    assert(gotB == (("B", 2L, 200L, 50L)), gotB.toString)
    // gaps never cross users or types: two singleton streams -> empty
    val iso = Seq((1L, 0L, 1L, "C"), (2L, 5L, 2L, "C"),
      (1L, 9L, 3L, "D")).toDF("u", "t", "id", "ty")
    assert(Funnel.interarrivalVmr(iso, "u", "t", "id", "ty")
      .count() == 0L)
  }

  test("channelConversion: first touch groups, window bounds the hit") {
    import spark.implicits._
    // u1: first "ad", purchase at 50 (inside window 100) -> hit
    // u2: first "ad", purchase at 200 (outside) -> miss
    // u3: first event IS the purchase -> hit at its own channel
    // u4: first "organic", never purchases -> miss
    val ev = Seq((1L, 0L, 1L, "ad"), (1L, 50L, 2L, "purchase"),
      (2L, 0L, 3L, "ad"), (2L, 200L, 4L, "purchase"),
      (3L, 0L, 5L, "purchase"),
      (4L, 0L, 6L, "organic")).toDF("u", "t", "id", "ty")
    val got = Funnel.channelConversion(ev, "u", "t", "id", "ty",
        "purchase", windowMicros = 100L)
      .orderBy($"channel")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("ad", 2L, 1L, 500000L),
      ("organic", 1L, 0L, 0L), ("purchase", 1L, 1L, 1000000L)),
      got.toString)
    intercept[IllegalArgumentException] {
      Funnel.channelConversion(ev, "u", "t", "id", "ty", "purchase",
        windowMicros = 0L)
    }
  }

  test("userGrowth: new-vs-returning split, cumulative ties out") {
    import spark.implicits._
    val day = 86400000000L
    // day 0: users 1,2 (both new); day 1: 1 returns, 3 is new;
    // day 2: only 2 returns (0 new)
    val ev = Seq((1L, 0L), (2L, 100L), (1L, day), (3L, day + 5L),
      (2L, 2 * day)).toDF("u", "t")
    val got = Funnel.userGrowth(ev, "u", "t")
      .orderBy($"day").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 2L, 2L), (1L, 2L, 1L, 3L),
      (2L, 1L, 0L, 3L)), got.toString)
    // cum on the last day == total distinct users
    assert(got.last._4 == 3L)
  }

  test("gapHistogram: binary-digit buckets, zero gap lands in bucket 0") {
    import spark.implicits._
    // user 1 type A at t = 10,10,11,16,24 (ids order the tie):
    // gaps 0 -> bucket 0, 1 -> 1, 5 -> 3 ('101'), 8 -> 4 ('1000')
    val ev = Seq((1L, 10L, 1L, "A"), (1L, 10L, 2L, "A"),
      (1L, 11L, 3L, "A"), (1L, 16L, 4L, "A"), (1L, 24L, 5L, "A"))
      .toDF("u", "t", "id", "ty")
    val got = Funnel.gapHistogram(ev, "u", "t", "id", "ty")
      .orderBy($"log2_bucket")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 0L, 1L, 250000L), ("A", 1L, 1L, 250000L),
      ("A", 3L, 1L, 250000L), ("A", 4L, 1L, 250000L)), got.toString)
  }

  test("survivalCurve: censoring holds the at-risk set, ppm fold exact") {
    import spark.implicits._
    val day = 86400000000L
    // B converts at entry (t=0); A and D convert at t=1; C never
    // converts and is censored at the horizon (day 5)
    val ev = Seq((1L, 0L, "view"), (1L, day, "purchase"),
      (2L, 0L, "purchase"),
      (3L, 0L, "view"), (3L, 5 * day, "view"),
      (4L, 0L, "view"), (4L, day, "purchase"))
      .toDF("u", "t", "ty")
    val got = Funnel.survivalCurve(ev, "u", "t", "ty", "purchase")
      .orderBy($"t_days")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // t=0: 1 of 4 converts -> 750000; t=1: 2 of 3 at risk ->
    // (750000 * 333333) div 1e6 = 249999 (the quantized fold IS the
    // statistic); censored C never emits an event row
    assert(got == Seq((0L, 1L, 4L, 750000L), (1L, 2L, 3L, 249999L)),
      got.toString)
    // without the censored user the day-1 risk set shrinks to 2
    val noC = ev.filter($"u" =!= 3L)
    val gotN = Funnel.survivalCurve(noC, "u", "t", "ty", "purchase")
      .orderBy($"t_days")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(gotN == Seq((0L, 1L, 3L, 666666L), (1L, 2L, 2L, 0L)),
      gotN.toString)
  }

  test("plan: user-keyed joins and aggregates, no window, no sort") {
    val plan = Funnel.completions(events, "u", "t", "id", "ty",
      Seq("A", "B", "C")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"funnel must not window:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"funnel must join on the user key:\n$plan")
  }
}
