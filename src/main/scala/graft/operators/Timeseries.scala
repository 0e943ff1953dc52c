package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series smoothing over event/transaction streams — the
  * monitoring view (drift tests q135/q152 compare distributions; this
  * family tracks levels over time).
  */
object Timeseries {

  /** Exact exponentially-weighted moving average of daily row counts
    * with α = 1/2 and a truncated `horizon`: for each day d the
    * smoothed level is Σ_{j=0..H−1} count(d−j)·2^{H−1−j}, reported as
    * the exact integer numerator `ewma_scaled` (denominator 2^H —
    * divide client-side if a float is wanted). Power-of-two weights
    * keep every step in integer arithmetic (the q105 λ=1/2 precedent),
    * so the trajectory is bit-equal on any engine — no float
    * accumulation order to drift. Days are exact epoch-micros `div`
    * buckets; a day appears iff some activity falls in its trailing
    * window (absent days in the window contribute 0 by construction).
    *
    * Scale: ONE day-keyed count over the scan (map-side combined,
    * output = |days| rows), then a ≤ horizon× fan-out of that BOUNDED
    * daily frame (never the raw stream) and a second day-keyed
    * aggregate in decimal(38,0) — counts near 2^63/2^H would wrap a
    * long under ANSI; decimal keeps the gate loud-proof and exact.
    * No window, no sort, no self-join.
    */
  def ewmaCounts(df: DataFrame, tsMicrosCol: String, horizon: Int = 16,
                 dayMicros: Long = 86400000000L): DataFrame = {
    require(horizon >= 1 && horizon <= 62,
      s"horizon must be in [1, 62], got $horizon")
    require(dayMicros > 0, s"dayMicros must be positive, got $dayMicros")
    val cnt = df
      .select(expr(s"CAST($tsMicrosCol AS BIGINT) div $dayMicros")
        .as("__d"))
      .groupBy(col("__d"))
      .agg(count(lit(1)).as("__n"))
    val hi = cnt.agg(max(col("__d")).as("__hi"))
    cnt.crossJoin(broadcast(hi))
      .select(col("__d"), col("__n"), col("__hi"),
        explode(sequence(lit(0), lit(horizon - 1))).as("__j"))
      .filter(col("__d") + col("__j") <= col("__hi"))
      .select((col("__d") + col("__j")).as("day"),
        (col("__n").cast("decimal(38,0)") *
          expr(s"CAST(shiftleft(1L, ${horizon - 1} - __j) " +
            "AS decimal(38,0))")).as("__w"))
      .groupBy(col("day"))
      .agg(sum(col("__w")).cast("long").as("ewma_scaled"))
  }
}
