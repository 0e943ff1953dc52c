package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group top-k — the reference's ranked retrieval (SURVEY.md §2.4 A5,
  * transcript_summaries.py:271-275: top-23 chunks by cosine sim per
  * meeting).
  *
  * `row_number` over a partitioned window is the scale-correct form: Spark
  * pushes a per-partition k-limit into the sort (TakeOrderedAndProject-
  * style partial ranking under AQE), so no group ever materializes fully
  * on one task beyond its sort run. Ordering must be tie-free for
  * deterministic output — callers append a unique id to `order`.
  */
object TopK {
  def perGroup(df: DataFrame, part: Seq[Column], order: Seq[Column],
               k: Int, rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
