package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Poisson bootstrap — distributed confidence intervals
  * without resampling shuffles (Chamandy et al. 2012, "Estimating
  * uncertainty for massive data streams", the standard
  * planet-scale form). Classic bootstrap resampling (draw n rows with
  * replacement, B times) cannot shuffle 100 TB B times; the Poisson
  * bootstrap replaces each replicate's multinomial row counts with
  * independent Poisson(1) weights, so every replicate is computed in
  * the SAME single pass over the data.
  *
  * Determinism: the weight for (row, replicate b) derives from the
  * md5 uniform of "salt:key:b" ([[Sampling.hashBucket]]'s 60-bit
  * convention) compared against the Poisson(1) inverse-CDF thresholds
  * pre-scaled to 2^60 — integer constants baked identically into the
  * Column form and every SQL mirror, so no engine ever evaluates a
  * transcendental. Weights are truncated at 8 (P(w>8) ≈ 1.1e-6 —
  * negligible bias, and both engines truncate identically).
  */
object Bootstrap {

  /** Exact integers: T(k) = floor(CDF_Poisson(1)(k) · 2^60), k=0..7;
    * a 60-bit uniform u maps to weight = #{k : T(k) <= u}, i.e. the
    * CASE ladder below, capped at 8.
    */
  val PoissonOneThresholds: Seq[Long] = Seq(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L,
    1152825534095764625L, 1152909688087595836L)

  /** The CASE ladder over a 60-bit uniform column. */
  def poissonOneWeight(u: Column): Column =
    PoissonOneThresholds.zipWithIndex
      .foldRight(lit(8)) { case ((t, k), tail) =>
        when(u < t, lit(k)).otherwise(tail)
      }

  /** SQL mirror of [[poissonOneWeight]] for the oracle side. */
  def poissonOneWeightSql(u: String): String =
    PoissonOneThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Per-replicate weighted means of `valueCol` (an exact integer —
    * pre-scale money to cents first): for b in [0, replicates),
    * returns (b, n_eff = Σw, mean_micro = (10⁶·Σ w·x) div Σw).
    * Rank the B means client-side (or via [[ci]]) for the interval.
    *
    * Scale: ONE scan; each row explodes to its `replicates` (b, w)
    * pairs (a narrow codegen fan-out — B× rows into a map-side
    * combined 64-cell aggregate, so the exchange moves B partial rows
    * per partition, not B× the data). Products accumulate in
    * decimal(38,0) — Σ 8·x over 10¹² rows wraps a long, ANSI would
    * fail loudly. No shuffle of the corpus, no window, no sort.
    */
  def replicateMeans(df: DataFrame, keyCol: String, valueCol: String,
                     replicates: Int, salt: String): DataFrame = {
    require(replicates >= 1 && replicates <= 4096,
      s"replicates must be in [1, 4096], got $replicates")
    val u = Sampling.hashBucket(
      concat_ws(":", col(keyCol).cast("string"),
        col("__b").cast("string")), salt, hexChars = 15)
    df.select(col(keyCol), col(valueCol).cast("long").as("__x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"))
      .withColumn("__w", poissonOneWeight(u))
      .groupBy(col("__b").cast("long").as("b"))
      .agg(sum(col("__w").cast("decimal(38,0)")).as("__n"),
        sum(col("__w").cast("decimal(38,0)") *
          col("__x").cast("decimal(38,0)")).as("__wx"))
      .select(col("b"), col("__n").cast("long").as("n_eff"),
        expr("(CAST(1000000 AS decimal(38,0)) * __wx) div __n")
          .cast("long").as("mean_micro"))
  }

  /** Rank-based percentile interval over [[replicateMeans]] output
    * (discrete quantiles — the q47 convention, never interpolated):
    * one row (n_replicates, lo_micro, hi_micro) where lo/hi are the
    * ceil(α·B)-th / ceil((1−α)·B)-th smallest replicate means.
    */
  def ci(means: DataFrame, alpha: Double = 0.025): DataFrame = {
    require(alpha > 0.0 && alpha < 0.5, s"alpha in (0, 0.5), got $alpha")
    // B is a bounded report frame (<= 4096 rows) — counting it on the
    // driver is metadata, not data movement
    val n = means.count()
    require(n >= 1, "ci needs at least one replicate mean")
    val loRk = math.max(1L, math.ceil(alpha * n).toLong)
    val hiRk = math.ceil((1.0 - alpha) * n).toLong
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("mean_micro"), col("b"))
    means.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === loRk || col("__rk") === hiRk)
      .agg(lit(n).as("n_replicates"),
        min(col("mean_micro")).as("lo_micro"),
        max(col("mean_micro")).as("hi_micro"))
  }
}
