package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus profiling at scale. The exact rank-based token quantiles
  * (q47's oracle form, `graft.queries.TextQueries`) sort every document
  * of a source inside ONE window partition — correct and portable, but
  * a giant source serializes a single reducer's sort at 100 TB. This is
  * the production path: Spark's Greenwald-Khanna `percentile_approx`
  * aggregate, which combines map-side partial sketches through one
  * ordinary aggregation exchange — no window, no per-source sort, error
  * bounded by `accuracy` (1/accuracy relative rank error).
  *
  * The exact form stays as the oracle/audit twin (same split as
  * `Sketches.kmvDistinct` vs `kmvEstimate`); the spec bounds the
  * approx path against the exact answers on test data.
  */
object Profile {

  /** Per-group approximate quantiles of the token count:
    * (groupCol, n_docs, q_<p> per requested probability).
    */
  def tokenQuantilesApprox(df: DataFrame, groupCol: String, textCol: String,
                           probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                           accuracy: Int = 10000): DataFrame = {
    val base = df.select(col(groupCol),
      TextFunctions.tokenCount(col(textCol)).as("__n_tok"))
    val qCols: Seq[Column] = probs.map { p =>
      percentile_approx(col("__n_tok"), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}")
    }
    base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), qCols: _*)
  }
}
