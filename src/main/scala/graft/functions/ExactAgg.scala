package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numerically *deterministic* aggregates over double columns.
  *
  * Problem: `sum(double)` is order-dependent; Spark's partial aggregation
  * and DuckDB's accumulate in different orders, so results differ in the
  * last ulps and a hash-based oracle compare fails. Fix: quantize each
  * value to an integer number of "cents" (`round(x * scale)` — IEEE-
  * deterministic given identical input doubles on both engines), aggregate
  * the exact integers, and convert back to double at the very end. Every
  * helper here has a textual SQL mirror in [[graft.functions.Sql]]; the two
  * MUST stay formula-identical so Spark and DuckDB produce bit-equal
  * doubles.
  *
  * The reference engine aggregates in single-process pandas and never hits
  * this (SURVEY.md §6); at 100 TB the exact-integer form also makes partial
  * (map-side) aggregation lossless, which plain double sums are not.
  */
object ExactAgg {
  /** x -> round(x * scale) as long. scale=100 for 2-decimal money. */
  def ints(c: Column, scale: Long = 100L): Column =
    round(c * lit(scale.toDouble)).cast("long")

  /** Exact integer SUM as decimal(38,0): long accumulation overflows at
    * large SF (sum of squared cents blew past 2^63 at sf0.1 already);
    * DuckDB's SUM(BIGINT) auto-promotes to HUGEINT, so the decimal
    * accumulator keeps the two engines value-identical — both cast the
    * same exact integer to double at the end.
    */
  private[functions] def sumExact(c: Column): Column =
    sum(c.cast("decimal(38,0)"))

  /** Exact sum of a fixed-point double column, returned as double. */
  def sumFx(c: Column, scale: Long = 100L): Column =
    sumExact(ints(c, scale)).cast("double") / lit(scale.toDouble)

  /** Exact mean: (sumCents / n) / scale, all in doubles at the end. */
  def avgFx(c: Column, scale: Long = 100L): Column =
    sumExact(ints(c, scale)).cast("double") / count(lit(1)).cast("double") /
      lit(scale.toDouble)

  /** Exact revenue-style sum: SUM(price * (1 - disc)) with price
    * quantized to cents and disc to basis points, multiplied as integers
    * (no intermediate double rounding at all), /1e6 at the end.
    */
  def revenueFx(price: Column, disc: Column): Column =
    sumExact(ints(price, 100L) * (lit(10000L) - ints(disc, 10000L)))
      .cast("double") / lit(1e6)

  /** Sample stddev from exact integer sums, with the reference's
    * n==1 -> 0.0 override (ref: aggregate_rental_rates.py:131,139).
    * var = (Q - S*S/n) / (n-1) / scale^2, guarded >= 0.
    */
  def stddevFx(c: Column, scale: Long = 100L): Column = {
    val cc = ints(c, scale)
    val cd = cc.cast("decimal(38,0)")
    val n  = count(lit(1)).cast("double")
    val s  = sum(cd).cast("double")
    val q  = sum(cd * cd).cast("double")
    val v  = greatest((q - s * s / n) / (n - lit(1.0)), lit(0.0)) /
      lit((scale * scale).toDouble)
    when(count(lit(1)) <= 1, lit(0.0)).otherwise(sqrt(v))
  }
}

/** DuckDB-SQL textual mirrors of [[ExactAgg]]. Keep formula shapes
  * (operator order, associativity, casts) identical to the Column side.
  */
object Sql {
  def ints(col: String, scale: Long = 100L): String =
    s"CAST(ROUND($col * $scale.0) AS BIGINT)"

  def sumFx(col: String, scale: Long = 100L): String =
    s"(CAST(SUM(${ints(col, scale)}) AS DOUBLE) / $scale.0)"

  def avgFx(col: String, scale: Long = 100L): String =
    s"(CAST(SUM(${ints(col, scale)}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / $scale.0)"

  def revenueFx(price: String, disc: String): String =
    s"(CAST(SUM(${ints(price, 100L)} * (10000 - ${ints(disc, 10000L)})) AS DOUBLE) / 1000000.0)"

  def stddevFx(col: String, scale: Long = 100L): String = {
    val cc = ints(col, scale)
    val n  = "CAST(COUNT(*) AS DOUBLE)"
    val s  = s"CAST(SUM($cc) AS DOUBLE)"
    val q  = s"CAST(SUM($cc * $cc) AS DOUBLE)"
    val sc2 = scale * scale
    s"(CASE WHEN COUNT(*) <= 1 THEN 0.0 ELSE " +
      s"SQRT(GREATEST(($q - $s * $s / $n) / ($n - 1.0), 0.0) / $sc2.0) END)"
  }
}
