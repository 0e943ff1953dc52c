package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval (no reference counterpart — the
  * reference's retrieval is single-channel Pinecone; reciprocal-rank
  * fusion is the standard public recipe, Cormack et al., SIGIR'09).
  */
object Fusion {

  /** Reciprocal-rank fusion of two ranked lists keyed (qid, doc_id,
    * rk): rrf = Σ_lists 1/(c + rk), docs absent from a list contribute
    * 0 from it. Output: per-query top-k by (rrf desc, doc_id) as
    * (qid, doc_id, rrf, rk).
    *
    * Scale shape: both inputs are ALREADY top-n lists (bounded per
    * query), so the full-outer join and the re-rank window touch
    * O(|queries| · n) rows regardless of corpus size — fusion is never
    * the scale problem; the upstream retrievers are.
    *
    * Determinism: rrf is two IEEE divisions and one add in a fixed
    * expression order — hash-compare-safe with integer ranks in.
    */
  def rrf(a: DataFrame, b: DataFrame, k: Int,
          c: Double = 60.0): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    require(c > 0.0, s"c > 0, got $c")
    val l = a.select(col("qid"), col("doc_id"),
      col("rk").cast("double").as("__rka"))
    val r = b.select(col("qid"), col("doc_id"),
      col("rk").cast("double").as("__rkb"))
    val fused = l.join(r, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c) + col("__rka")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("__rkb")), lit(0.0)))
      .select(col("qid"), col("doc_id"), col("rrf"))
    TopK.perGroup(fused, Seq(col("qid")),
      Seq(col("rrf").desc, col("doc_id")), k)
      .select(col("qid"), col("doc_id"), col("rrf"), col("rk"))
  }
}
