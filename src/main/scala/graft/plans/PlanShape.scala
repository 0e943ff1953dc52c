package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plan-shaping helpers: small rewrites that steer Catalyst toward the
  * physical plan we want without touching operator semantics.
  */
object PlanShape {

  /** Project `expr` as `name`, then filter on the materialized column —
    * evaluating `expr` exactly ONCE per row.
    *
    * The naive `withColumn(name, expr).filter(pred)` is collapsed by
    * Catalyst (CollapseProject + PushPredicateThroughNonJoin substitute
    * the alias into the predicate), so an expensive expression — e.g.
    * cosine over a 1536-d pair — is evaluated in BOTH the Filter and the
    * Project. There is no cross-operator subexpression elimination, so
    * at n² pair counts that doubles the dominant cost.
    *
    * A nondeterministic barrier column blocks both rules (Catalyst never
    * collapses or pushes across nondeterministic projections). The
    * predicate must also REFERENCE the barrier: a dangling barrier
    * column would be removed by ColumnPruning (same fixed-point batch),
    * making the projection deterministic again and re-enabling the push
    * — verified on the q22 plan. The `OR barrier < -1` arm is always
    * false at runtime (partition ids are non-negative) but is not
    * statically foldable, and a disjunction cannot be split into
    * pushable conjuncts. Costs one int compare per row.
    */
  def filterOnce(df: DataFrame, name: String, expr: Column,
                 pred: Column => Column): DataFrame =
    hoistFilter(df, Seq(name -> expr), pred(col(name)))

  /** Multi-column [[filterOnce]]: materialize every `hoisted` column in
    * one projection, then filter on `pred` (which references them by
    * name) with each hoisted expression evaluated exactly ONCE per row.
    * Without the barrier, PushPredicateThroughNonJoin substitutes the
    * aliases into the predicate — a keep-gate over hoisted (nrm, toks)
    * re-tokenizes the document once per measure reference (~8× for the
    * Gopher rule set). Hoisted columns stay on the output frame so
    * downstream stages can reuse them; callers drop what they don't
    * need.
    */
  def hoistFilter(df: DataFrame, hoisted: Seq[(String, Column)],
                  pred: Column): DataFrame = {
    val withCols = hoisted.foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
    withCols
      .withColumn("__graft_barrier", spark_partition_id())
      .filter(pred || col("__graft_barrier") < lit(-1))
      .drop("__graft_barrier")
  }
}
