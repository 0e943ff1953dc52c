package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4 / the 100 TB checklist).
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one reduce key dominates an
  * AGGREGATION (AQE cannot split a single group) or when a join's hot
  * side must pre-spread before a non-AQE-visible stage.
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (key, salt) —
    * spreading a hot key over `salts` reducers — then final aggregate on
    * the key. Caller supplies algebraic partial/final agg pairs (sum/
    * count/min/max style; the ExactAgg integer forms compose losslessly).
    *
    * @param partialAggs aggregations for phase 1 (named columns)
    * @param finalAggs   aggregations for phase 2 over the phase-1 output
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      partialAggs: Seq[Column], finalAggs: Seq[Column])
      : DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a random
    * salt in [0, salts); the (small) right side is replicated `salts`
    * times so every salted left row still meets its match. Right side
    * must be modest (it multiplies by `salts`).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
