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
}
