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
  * Determinism: the weight for (row, replicate b) derives from a
  * per-row md5 seed ([[Sampling.hashBucket]]'s 60-bit convention)
  * mixed per replicate by splitmix64 ([[uniform]] — one string hash
  * per ROW, five integer ops per replicate), compared against the
  * Poisson(1) inverse-CDF thresholds pre-scaled to 2^60 — integer
  * constants baked identically into the Column form and every SQL
  * mirror, so no engine ever evaluates a transcendental. Weights are
  * truncated at 8 (P(w>8) ≈ 1.1e-6 — negligible bias, and both
  * engines truncate identically).
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

  /** The per-(row, replicate) 60-bit uniform: ONE md5 per row
    * ([[Sampling.hashBucket]]'s 60-bit seed) mixed per replicate with
    * splitmix64 (`graft_splitmix64`, five integer ops) — the string
    * hash is paid once, not B times; measured 64× fewer md5s cut the
    * sf0.1 bench from 20 s to the low seconds. The DuckDB replay is
    * [[splitMixUniformSql]].
    */
  def uniform(seed: Column, b: Column): Column =
    call_function("graft_splitmix64", seed, b)

  /** HUGEINT mod-2^64 SQL replay of [[graft.plans.NativeExprs]]'
    * splitMix64 (the q51 wrap kit + a split multiply: a 64×64 product
    * overflows INT128, so wrapmul(a, c) = (a_lo·c + ((a_hi·c) mod
    * 2^32)·2^32) mod 2^64). `x`/`b` must render as HUGEINTs.
    */
  def splitMixUniformSql(x: String, b: String): String = {
    val M64 = "18446744073709551616::HUGEINT"
    def wm(a: String, c: String) =
      s"((($a & 4294967295::HUGEINT) * $c + ((($a >> 32) * $c) " +
        s"% 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M64)"
    val z0 = s"(($x + ${wm(s"($b + 1)", "11400714819323272985::HUGEINT")}) % $M64)"
    val z1 = wm(s"xor($z0, $z0 >> 30)", "13787848793156543929::HUGEINT")
    val z2 = wm(s"xor($z1, $z1 >> 27)", "10723151780598845931::HUGEINT")
    s"(xor($z2, $z2 >> 31) >> 4)"
  }

  /** Per-replicate weighted means of `valueCol` (an exact integer —
    * pre-scale money to cents first): for b in [0, replicates),
    * returns (b, n_eff = Σw, mean_micro = (10⁶·Σ w·x) div Σw).
    * Rank the B means client-side (or via [[ci]]) for the interval.
    *
    * Scale: ONE scan; each row pays ONE md5 (its 60-bit seed), then
    * explodes to `replicates` (b, splitmix-uniform, w) rows — a
    * narrow codegen fan-out into a map-side combined B-cell
    * aggregate, so the exchange moves B partial rows per partition,
    * not B× the data. Products accumulate via the exact LONG hi/lo
    * split ([[hiLo]]) — Σ 8·x over 10¹² rows wraps a plain long sum,
    * and per-row decimals cost 6× the aggregate; past the split's
    * 2⁹⁴ headroom ANSI fails loudly. No shuffle of the corpus, no
    * window, no sort.
    */
  /** Exact Σ(w·x) without per-row decimal arithmetic: each long
    * product splits into (arithmetic-shift) hi = ⌊p/2³¹⌋ and
    * lo = p − hi·2³¹ ∈ [0, 2³¹), both accumulated as plain LONG sums
    * (codegen), and the true sum 2³¹·Σhi + Σlo is recombined in
    * decimal only over the B output cells. Exact while Σ|w·x| < 2⁹⁴
    * (any corpus: 10¹² rows × max-long cents is 2⁹²); past the long
    * partial bounds ANSI mode still errors loudly, never wraps. The
    * former per-row decimal accumulation cost 6× the whole aggregate
    * (measured at 30M fan-out rows: 11.5 s vs 1.8 s).
    */
  private def hiLo(p: Column): (Column, Column) = {
    val hi = shiftright(p, 31)
    (hi, p - (hi * lit(2147483648L)))
  }
  private val RecombineSql =
    "(CAST(__sh AS decimal(38,0)) * 2147483648 + CAST(__sl AS decimal(38,0)))"

  def replicateMeans(df: DataFrame, keyCol: String, valueCol: String,
                     replicates: Int, salt: String): DataFrame = {
    require(replicates >= 1 && replicates <= 4096,
      s"replicates must be in [1, 4096], got $replicates")
    val (hi, lo) = hiLo(col("__w") * col("__x"))
    df.select(col(valueCol).cast("long").as("__x"),
        Sampling.hashBucket(col(keyCol), salt, hexChars = 15)
          .as("__seed"))
      .select(col("__x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"),
        col("__seed"))
      .withColumn("__w",
        poissonOneWeight(uniform(col("__seed"),
          col("__b").cast("long"))))
      .groupBy(col("__b").cast("long").as("b"))
      .agg(sum(col("__w")).as("__n"),
        sum(hi).as("__sh"), sum(lo).as("__sl"))
      .select(col("b"), col("__n").cast("long").as("n_eff"),
        expr(s"(CAST(1000000 AS decimal(38,0)) * $RecombineSql) " +
          "div __n").cast("long").as("mean_micro"))
  }

  /** [[replicateMeans]] per group — every segment gets its B
    * replicate means in the SAME single pass (the aggregate keys on
    * (group, b): |groups|·B cells, still map-side combined; nothing
    * else changes). Returns (group, b, n_eff, mean_micro).
    */
  def replicateMeansBy(df: DataFrame, groupCol: String, keyCol: String,
                       valueCol: String, replicates: Int,
                       salt: String): DataFrame = {
    require(replicates >= 1 && replicates <= 4096,
      s"replicates must be in [1, 4096], got $replicates")
    val (hi, lo) = hiLo(col("__w") * col("__x"))
    df.select(col(groupCol).as("grp"),
        col(valueCol).cast("long").as("__x"),
        Sampling.hashBucket(col(keyCol), salt, hexChars = 15)
          .as("__seed"))
      .select(col("grp"), col("__x"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__b"),
        col("__seed"))
      .withColumn("__w",
        poissonOneWeight(uniform(col("__seed"),
          col("__b").cast("long"))))
      .groupBy(col("grp"), col("__b").cast("long").as("b"))
      .agg(sum(col("__w")).as("__n"),
        sum(hi).as("__sh"), sum(lo).as("__sl"))
      .filter(col("__n") > 0) // a tiny group can draw all-zero weights
      .select(col("grp").as(groupCol), col("b"),
        col("__n").cast("long").as("n_eff"),
        expr(s"(CAST(1000000 AS decimal(38,0)) * $RecombineSql) " +
          "div __n").cast("long").as("mean_micro"))
  }

  /** Per-group rank-based percentile intervals over
    * [[replicateMeansBy]] output: one row per group
    * (group, n_replicates, lo_micro, hi_micro) — the discrete-rank
    * [[ci]] applied within each group's replicate frame (group
    * windows over B-row partitions; no driver count needed since the
    * per-group B rides the window).
    */
  def ciBy(means: DataFrame, groupCol: String,
           alpha: Double = 0.025): DataFrame = {
    require(alpha > 0.0 && alpha < 0.5, s"alpha in (0, 0.5), got $alpha")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("mean_micro"), col("b"))
    means
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col(groupCol))))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).cast("long").as("n_replicates"),
        min(when(col("__rk") === greatest(lit(1L),
          ceil(lit(alpha) * col("__n"))), col("mean_micro")))
          .cast("long").as("lo_micro"),
        max(when(col("__rk") === ceil(lit(1.0 - alpha) * col("__n")),
          col("mean_micro"))).cast("long").as("hi_micro"))
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
