package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus perplexity scoring — the CCNet-style quality filter: train an
  * add-1-smoothed bigram language model on a target ("clean") corpus
  * and score every document by its total log-probability under it;
  * low-per-token-logprob documents read as gibberish/boilerplate and
  * get filtered or bucketed downstream. Complements [[Importance]]
  * (distribution match via hashed bags — order-blind) with a
  * SEQUENTIAL model: word order matters here.
  *
  * Scoring is exact-integer: each bigram contributes
  * `⌊10⁶ · ln((c(w1,w2)+1) / (c(w1)+V))⌋` — quantized longs summed per
  * document, so results are reproducible across runs, partitionings,
  * and engines (cross-engine ln boundary margins audited ≥ 4·10⁻⁴ at
  * every gate SF vs ~10⁻¹⁰ ulp drift — the q72 determinism argument).
  *
  * Scale design: the bigram/unigram count tables are MODEL-scale
  * (distinct n-grams), far smaller than the corpus but NOT broadcastable
  * at real vocabulary sizes — the probe is two gram/word-keyed LEFT
  * joins (AQE picks broadcast at small scale, gram-partitioned SMJ at
  * 100 TB) followed by ONE doc-keyed aggregation exchange. The
  * vocabulary size V rides as a one-row broadcast whose unigram
  * aggregate REUSES the count table's exchange (ReuseExchange — no
  * second pass over the target). Model build = one bigram + one unigram
  * exchange over the target, map-side combined.
  */
object Perplexity {

  /** Log-probability quantization scale (q72's [[Importance.WeightScale]]
    * convention).
    */
  val Scale: Long = Importance.WeightScale

  private def gramsOf(toks: Column, n: Int): Column =
    call_function("graft_shingles", toks, lit(n))

  /** Score `corpus` docs under a bigram model trained on `target`:
    * (idCol, n_bigrams, logprob) — `logprob` = Σ quantized bigram
    * log-probs (exact long), `n_bigrams` = scored transitions.
    * Documents with fewer than 2 tokens have no transitions and stay in
    * the output at (0, 0). A bigram whose first word is out-of-vocabulary
    * scores `⌊10⁶·ln(1/V)⌋` (c12 = c1 = 0) — the uniform-over-vocab
    * floor.
    */
  def bigramScores(corpus: DataFrame, target: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val tt = target.select(TextFunctions.tokens(col(textCol)).as("__t"))
    val bc = tt.filter(size(col("__t")) >= 2)
      .select(explode(gramsOf(col("__t"), 2)).as("__mg"))
      .groupBy(col("__mg")).agg(count(lit(1)).as("__c12"))
    val uc = tt.select(explode(gramsOf(col("__t"), 1)).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c1"))
    val vF = uc.agg(count(lit(1)).as("__v"))
    val pg = corpus
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode_outer(
        when(size(col("__t")) >= 2, gramsOf(col("__t"), 2))
          .otherwise(array().cast("array<string>"))).as("__g"))
    // V = 0 means the target matched nothing (or only token-less docs):
    // the smoothed probability degenerates to 1/0 = Inf and every score
    // is garbage — fail loudly instead (the DuckDB mirror errors on
    // CAST('inf' AS BIGINT) for the same input)
    val vOk = when(col("__v") > 0, col("__v")).otherwise(raise_error(
      lit("Perplexity.bigramScores: target corpus has no tokens (V = 0)")))
    // formula order mirrored verbatim in the SQL oracle: one double
    // division, ln, scale, floor
    val q = floor(lit(Scale) * log(
      (coalesce(col("__c12"), lit(0L)) + 1).cast("double") /
        (coalesce(col("__c1"), lit(0L)) + vOk).cast("double")))
      .cast("long")
    pg.join(bc, col("__g") === col("__mg"), "left")
      .join(uc, element_at(split(col("__g"), " "), 1) === col("__w"),
        "left")
      .crossJoin(broadcast(vF))
      .groupBy(col(idCol))
      .agg(count(col("__g")).as("n_bigrams"),
        coalesce(sum(when(col("__g").isNotNull, q)), lit(0L))
          .as("logprob"))
  }
}
