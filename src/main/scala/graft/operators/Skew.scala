package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §4 / the 100 TB checklist).
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when one reduce key dominates an
  * AGGREGATION (AQE cannot split a single group) or when a join's hot
  * side must pre-spread before a non-AQE-visible stage.
  *
  * The salt is DETERMINISTIC — `pmod(xxhash64(saltBy…), salts)` over
  * caller-passed columns — never `rand()`/partition-id/row-id. A
  * nondeterministic expression feeding an exchange makes the map stage
  * indeterminate: one fetch failure at 100 TB then forces a full-stage
  * retry (Spark rolls back ALL consumers of an indeterminate stage).
  * With a content-derived salt, recomputation of any lost map task
  * reproduces identical shuffle blocks and recovery stays task-local.
  * Pick `saltBy` columns that vary WITHIN a hot key (a row id, event
  * id, timestamp…) — a salt constant per key spreads nothing.
  */
object Skew {

  /** Deterministic salt in [0, salts): content-derived, so shuffle
    * output is reproducible across task retries (see class doc).
    */
  def saltColumn(saltBy: Seq[Column], salts: Int): Column = {
    require(saltBy.nonEmpty, "saltBy columns required (see Skew doc)")
    pmod(xxhash64(saltBy: _*), lit(salts.toLong))
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt) —
    * spreading a hot key over `salts` reducers — then final aggregate on
    * the key. Caller supplies algebraic partial/final agg pairs (sum/
    * count/min/max style; the ExactAgg integer forms compose losslessly).
    *
    * @param saltBy      columns the salt hashes (must vary within a key)
    * @param partialAggs aggregations for phase 1 (named columns)
    * @param finalAggs   aggregations for phase 2 over the phase-1 output
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBy: Seq[Column],
                      salts: Int, partialAggs: Seq[Column],
                      finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", saltColumn(saltBy, salts))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed LEFT side: left rows spread over
    * [0, salts) by a deterministic hash of `saltBy`; the (small) right
    * side is replicated `salts` times so every salted left row still
    * meets its match. Right side must be modest (it multiplies by
    * `salts`).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltBy: Seq[Column], salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", saltColumn(saltBy, salts))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    saltedLeft.join(replicatedRight, keys :+ "__salt").drop("__salt")
  }
}
