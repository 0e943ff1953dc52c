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
    df.withColumn(name, expr)
      .withColumn("__graft_barrier", spark_partition_id())
      .filter(pred(col(name)) || col("__graft_barrier") < lit(-1))
      .drop("__graft_barrier")
}
