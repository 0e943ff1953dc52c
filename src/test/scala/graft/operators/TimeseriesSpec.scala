package graft.operators

import graft.SparkSpec

class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  test("ewmaCounts: truncated alpha=1/2 weights, exact integers") {
    // counts: d0=2, d1=1, d3=4 (d2 silent)
    val df = Seq(0L, 1L, day, 3 * day, 3 * day, 3 * day, 3 * day)
      .toDF("t")
    val got = Timeseries.ewmaCounts(df, "t", horizon = 3)
      .orderBy($"day").as[(Long, Long)].collect().toSeq
    // H=3, weights (j=0,1,2) = 4,2,1; scale 8
    // d0: 2*4 = 8 ; d1: 1*4 + 2*2 = 8 ; d2: 0*4 + 1*2 + 2*1 = 4
    // d3: 4*4 + 0 + 1*1 = 17 ; beyond hi=3 nothing reported
    assert(got == Seq((0L, 8L), (1L, 8L), (2L, 4L), (3L, 17L)),
      got.toString)
  }

  test("ewmaCounts: horizon=1 degenerates to scaled daily counts") {
    val df = Seq(0L, 0L, day).toDF("t")
    val got = Timeseries.ewmaCounts(df, "t", horizon = 1)
      .orderBy($"day").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (1L, 1L)), got.toString)
  }

  test("cusumCounts: closed form equals the sequential recursion") {
    // counts per day: 5,5,5,20,20,5 (level shift at day 3)
    val counts = Seq(5, 5, 5, 20, 20, 5)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(d.toLong * day)
    }
    val got = Timeseries.cusumCounts(rows.toDF("t"), "t", slack = 1L,
        threshold = 1L)
      .orderBy($"day").as[(Long, Long, Long, Long)].collect().toSeq
    // mu = 60/6 = 10; sequential s_d = max(0, s + (x - 11))
    val mu = counts.sum / counts.length
    var s = 0L
    val want = counts.zipWithIndex.map { case (c, d) =>
      s = math.max(0L, s + (c - mu - 1))
      (d.toLong, c.toLong, s, if (s > 1L * mu) 1L else 0L)
    }
    assert(got == want, s"got $got want $want")
    // the shift is detected (some flagged day exists) and the
    // stationary head is not flagged
    assert(got.exists(_._4 == 1L) && got.head._4 == 0L)
    intercept[IllegalArgumentException] {
      Timeseries.cusumCounts(rows.toDF("t"), "t", slack = -1L)
    }
    intercept[IllegalArgumentException] {
      Timeseries.cusumCounts(rows.toDF("t"), "t", threshold = 0L)
    }
  }

  test("dowProfile: epoch-day weekday math, exact chi2 terms") {
    // day 0 = Thursday -> dow 3; day 4 = Monday -> dow 0
    val df = Seq(0L, 4 * day, 4 * day).toDF("t")
    val got = Timeseries.dowProfile(df, "t")
      .orderBy($"dow").as[(Long, Long, Long, Long)].collect().toSeq
    // n=3: dow0 has 2 (share 666666), dow3 has 1 (333333)
    // chi2 terms: (7*2-3)^2*1e6/(7*3) = 121e6/21 = 5761904
    //             (7*1-3)^2*1e6/21 = 16e6/21 = 761904
    assert(got == Seq((0L, 2L, 666666L, 5761904L),
      (3L, 1L, 333333L, 761904L)), got.toString)
  }

  test("trailingDailySum: RANGE framing skips silent days, gaps reset") {
    // days 0 (10c), 1 (20c), 9 (5c) — window 3
    val df = Seq((0L, 10L), (day, 20L), (9 * day, 5L))
      .toDF("t", "cents")
    val got = Timeseries.trailingDailySum(df, "t", "cents", window = 3)
      .orderBy($"day").as[(Long, Long, Long, Long)].collect().toSeq
    // day 1 trails 30; day 9 is farther than 2 days from everything
    // -> trails only itself (a ROWS frame would wrongly carry 20+5)
    assert(got == Seq((0L, 1L, 10L, 10L), (1L, 1L, 20L, 30L),
      (9L, 1L, 5L, 5L)), got.toString)
    intercept[IllegalArgumentException] {
      Timeseries.trailingDailySum(df, "t", "cents", window = 0)
    }
  }

  test("ewmaCounts: guards are loud") {
    val df = Seq(0L).toDF("t")
    intercept[IllegalArgumentException] {
      Timeseries.ewmaCounts(df, "t", horizon = 0)
    }
    intercept[IllegalArgumentException] {
      Timeseries.ewmaCounts(df, "t", horizon = 63)
    }
    intercept[IllegalArgumentException] {
      Timeseries.ewmaCounts(df, "t", horizon = 3, dayMicros = 0L)
    }
  }

  test("acfDaily: exact linear series saturates, constant degenerates," +
      " silent days pair with nobody") {
    // counts 1,2,...,8 on days 0..7 — exactly linear, so Pearson r
    // is exactly 1 at every lag and the divide chain lands on 10^6
    val ramp = (0L until 8L).flatMap(d =>
      Seq.fill((d + 1).toInt)(d * day)).toDF("t")
    val got = Timeseries.acfDaily(ramp, "t", maxLag = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 7L, 1000000L), (2L, 6L, 1000000L),
      (3L, 5L, 1000000L)), got.toString)
    // constant series: zero variance -> degenerate 0, not a crash
    val const = (0L until 6L).map(d => d * day).toDF("t")
    val gotC = Timeseries.acfDaily(const, "t", maxLag = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotC == Seq((1L, 5L, 0L), (2L, 4L, 0L)), gotC.toString)
    // calendar pairing: days 0,1,5,6 — lag 1 pairs (0,1),(5,6) only;
    // the lag-1 pairs are (1,2) and (1,2) counts -> perfectly
    // correlated... both pairs identical -> zero variance -> 0; what
    // matters is n_pairs = 2, NOT 3 (a ROWS lag would pair 1 with 5)
    val gap = Seq(0L -> 1, 1L -> 2, 5L -> 1, 6L -> 2).flatMap {
      case (d, n) => Seq.fill(n)(d * day)
    }.toDF("t")
    val gotG = Timeseries.acfDaily(gap, "t", maxLag = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(gotG == Seq((1L, 2L, 0L)), gotG.toString)
    intercept[IllegalArgumentException] {
      Timeseries.acfDaily(ramp, "t", maxLag = 0)
    }
  }

  test("xcfDaily: a shifted copy peaks exactly at its shift") {
    // x: counts 1..8 on days 0..7; y: the same ramp shifted +2 days —
    // at lag 2 y(d+2) == x(d)+0 shape exactly -> 10^6; other lags
    // still correlate (a ramp against a ramp) but over FEWER pairs
    val x = (0L until 8L).flatMap(d => Seq.fill((d + 1).toInt)(d * day))
    val y = (0L until 8L).flatMap(d =>
      Seq.fill((d + 1).toInt)((d + 2) * day))
    val got = Timeseries.xcfDaily(x.toDF("t"), "t", y.toDF("t"), "t",
      maxLag = 3).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2L) == ((8L, 1000000L)), got.toString)
    assert(got(-3L)._1 == 3L && got(3L)._1 == 7L, got.toString)
    // every lag of ramp-vs-ramp is exactly linear -> all saturate
    assert(got.values.forall(_._2 == 1000000L), got.toString)
    // disjoint calendars -> zero pairs at every lag, no crash
    val far = (100L until 104L).map(d => d * day)
    val gotF = Timeseries.xcfDaily(x.toDF("t"), "t", far.toDF("t"),
      "t", maxLag = 1).as[(Long, Long, Long)].collect()
    assert(gotF.isEmpty, gotF.mkString(","))
    intercept[IllegalArgumentException] {
      Timeseries.xcfDaily(x.toDF("t"), "t", y.toDF("t"), "t",
        maxLag = 0)
    }
  }

  test("dowAdjustedOutliers: weekly shape is normal, a spike flags " +
      "only against its own weekday") {
    // 4 full weeks where epoch-weekday w always gets count w+1 —
    // strongly weekly-shaped; every residual is exactly 10^6
    val weekly = (0L until 28L).flatMap(d =>
      Seq.fill(((d + 3) % 7 + 1).toInt)(d * day))
    val got = Timeseries.dowAdjustedOutliers(weekly.toDF("t"), "t")
      .orderBy($"day").as[(Long, Long, Long, Long)].collect()
    assert(got.length == 28 && got.forall(r =>
      r._3 == 1000000L && r._4 == 0L), got.mkString(","))
    // spike one day 8x: it flags; every OTHER day stays unflagged
    // (a raw-count MAD would flag the naturally-big weekdays too)
    val spikeDay = 10L
    val spiked = (weekly ++ Seq.fill(
      (((spikeDay + 3) % 7 + 1) * 7).toInt)(spikeDay * day))
      .toDF("t")
    val gotS = Timeseries.dowAdjustedOutliers(spiked, "t")
      .orderBy($"day").as[(Long, Long, Long, Long)].collect()
    val flagged = gotS.filter(_._4 == 1L).map(_._1).toSet
    assert(flagged.contains(spikeDay), gotS.mkString(","))
    // the noiseless fixture has MAD = 0, so the spike's own weekday
    // siblings (whose mean it dragged) may flag as collateral — but
    // no day of any OTHER weekday ever does
    assert(flagged.forall(d => (d + 3) % 7 == (spikeDay + 3) % 7),
      gotS.mkString(","))
    intercept[IllegalArgumentException] {
      Timeseries.dowAdjustedOutliers(spiked, "t", kMad = 0)
    }
  }

  test("seasonalStrength: rigid week saturates, flat degenerates") {
    // counts (w+1) per weekday over 4 full weeks: zero within-weekday
    // variance -> eta^2 = exactly 10^6
    val weekly = (0L until 28L).flatMap(d =>
      Seq.fill(((d + 3) % 7 + 1).toInt)(d * day)).toDF("t")
    val got = Timeseries.seasonalStrength(weekly, "t")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._1 == 28L && got._3 == 0L && got._4 == 1000000L,
      got.toString)
    // constant series: SST = 0 -> degenerate 0, not a crash
    val flat = (0L until 14L).map(d => d * day).toDF("t")
    val gotF = Timeseries.seasonalStrength(flat, "t")
      .as[(Long, Long, Long, Long)].collect().head
    assert(gotF == ((14L, 0L, 0L, 0L)), gotF.toString)
  }

  test("periodDelta: signed ppm vs previous, zero base yields NULL") {
    // values 100 -> 150 -> 75 -> 0 -> 50 per period
    val rows = Seq((2020L, 100L), (2021L, 150L), (2022L, 75L),
      (2023L, 0L), (2024L, 50L)).flatMap { case (p, v) =>
      Seq((p, v)) } // one row per period, value summed as-is
    val got = Timeseries.periodDelta(rows.toDF("p", "v"), "p", "v")
      .orderBy($"period")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((2020L, 1L, 100L, None),
      (2021L, 1L, 150L, Some(500000L)),
      (2022L, 1L, 75L, Some(-500000L)),
      (2023L, 1L, 0L, Some(-1000000L)),
      (2024L, 1L, 50L, None)), got.toString)
  }

  test("dowHourHeatmap: epoch grid cells and exact shares") {
    // epoch day 0 was a Thursday (dow 3); hour from the µs remainder
    val hr = 3600000000L
    val df = Seq(0L, hr, hr, 7 * day + 23 * hr).toDF("t")
    val got = Timeseries.dowHourHeatmap(df, "t")
      .orderBy($"dow", $"hr")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 0L, 1L, 250000L), (3L, 1L, 2L, 500000L),
      (3L, 23L, 1L, 250000L)), got.toString)
  }

  test("seasonalNaiveBacktest: a perfectly weekly series zeroes MASE") {
    // period-7 repeating counts 1..7: y(d-7) predicts exactly
    // (abs_err_seasonal = 0) while y(d-1) keeps missing
    val weekly = (0L until 21L).flatMap(d =>
      Seq.fill((d % 7 + 1).toInt)(d * day)).toDF("t")
    val got = Timeseries.seasonalNaiveBacktest(weekly, "t")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._1 == 14L && got._2 == 0L && got._3 == 20L &&
      got._4 > 0L && got._5 == 0L, got.toString)
    // a flat series: both forecasts are perfect -> degenerate 0 mase
    val flat = (0L until 10L).map(d => d * day).toDF("t")
    val gotF = Timeseries.seasonalNaiveBacktest(flat, "t")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gotF == ((3L, 0L, 9L, 0L, 0L)), gotF.toString)
    intercept[IllegalArgumentException] {
      Timeseries.seasonalNaiveBacktest(flat, "t", period = 1)
    }
  }

  test("momentsDaily: exact skew/kurt chains on hand fixtures") {
    // counts (1,3): symmetric -> skew 0; kurtosis of a two-point
    // symmetric distribution is exactly 1
    val two = (Seq(0L) ++ Seq.fill(3)(day)).toDF("t")
    val gotT = Timeseries.momentsDaily(two, "t")
      .as[(Long, Long, Long)].collect().head
    assert(gotT == ((2L, 0L, 1000000L)), gotT.toString)
    // counts (1,1,4): skew^2 = 0.5 and kurt = 1.5 EXACTLY (A3 = 54,
    // M2 = 18, A4 = 486 — the chain floors land on the true values)
    val asym = (Seq(0L, day) ++ Seq.fill(4)(2 * day)).toDF("t")
    val gotA = Timeseries.momentsDaily(asym, "t")
      .as[(Long, Long, Long)].collect().head
    assert(gotA == ((3L, 500000L, 1500000L)), gotA.toString)
    // mirrored counts (1,4,4): same magnitudes, NEGATIVE skew — the
    // sign splits before the floor, so the value mirrors exactly
    val neg = (Seq(0L) ++ Seq.fill(4)(day) ++ Seq.fill(4)(2 * day))
      .toDF("t")
    val gotN = Timeseries.momentsDaily(neg, "t")
      .as[(Long, Long, Long)].collect().head
    assert(gotN == ((3L, -500000L, 1500000L)), gotN.toString)
    // constant series degenerates to 0/0 reported as zeros
    val const = (0L until 4L).map(d => d * day).toDF("t")
    val gotC = Timeseries.momentsDaily(const, "t")
      .as[(Long, Long, Long)].collect().head
    assert(gotC == ((4L, 0L, 0L)), gotC.toString)
  }

  test("theilSen: median slope is outlier-immune where the mean is not") {
    // counts 2,4,6,8,10 on days 0..4: every pairwise slope is exactly
    // 2 -> 2e6 ppm at p10/p50/p90
    val ramp = (0L until 5L).flatMap(d =>
      Seq.fill((2 * d + 2).toInt)(d * day)).toDF("t")
    val got = Timeseries.theilSen(ramp, "t")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((5L, 10L, 2000000L, 2000000L, 2000000L)),
      got.toString)
    // one wild spike day (count 100 on day 2): 10 pairs, only the 4
    // touching the spike are corrupted — the median survives at 2e6
    val spiked = ((0L until 5L).flatMap(d =>
      Seq.fill((2 * d + 2).toInt)(d * day)) ++
      Seq.fill(94)(2L * day)).toDF("t")
    val gotS = Timeseries.theilSen(spiked, "t")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gotS._1 == 5L && gotS._2 == 10L && gotS._4 == 2000000L,
      gotS.toString)
    // p90 picks up the spike's steep ascent, p10 its descent: the
    // band widens while the point estimate holds
    assert(gotS._3 < 2000000L && gotS._5 > 2000000L, gotS.toString)
    intercept[IllegalArgumentException] {
      Timeseries.theilSen(ramp, "t", dayMicros = 0L)
    }
  }
}
