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
                   textCol: String,
                   minQuantMargin: Option[Double] = None): DataFrame = {
    minQuantMargin.foreach { threshold =>
      val m = minQuantizationMargin(corpus, target, idCol, textCol)
      if (m < threshold) throw new IllegalStateException(
        f"Perplexity quantization margin $m%.3e below threshold " +
          f"$threshold%.3e: a bigram log-prob sits close enough to its " +
          "floor boundary that cross-engine ln drift could flip the " +
          "quantized score — re-audit the fixture before trusting a " +
          "hash-compared oracle")
    }
    val g = scoredGrams(corpus, target, idCol, textCol)
    g.df.groupBy(col(idCol))
      .agg(count(col("__g")).as("n_bigrams"),
        coalesce(sum(when(col("__g").isNotNull, floor(g.y).cast("long"))),
          lit(0L)).as("logprob"))
  }

  /** Min distance of any scored bigram's UNQUANTIZED `10⁶·ln` value to
    * its nearest floor boundary — the quantity the cross-engine
    * determinism argument rests on (audited ≥ 4·10⁻⁴ per gate fixture
    * vs ~10⁻⁹ absolute ln drift). One extra aggregate over the scoring
    * frame; returns +∞ for a corpus with no scorable bigrams. Run via
    * `bigramScores(..., minQuantMargin = Some(t))` as the debug-mode
    * guard so a future fixture can't silently go flaky.
    */
  def minQuantizationMargin(corpus: DataFrame, target: DataFrame,
                            idCol: String, textCol: String): Double = {
    val g = scoredGrams(corpus, target, idCol, textCol)
    val frac = g.y - floor(g.y)
    val row = g.df.filter(col("__g").isNotNull)
      .agg(min(least(frac, lit(1.0) - frac))).head()
    if (row.isNullAt(0)) Double.PositiveInfinity else row.getDouble(0)
  }

  private final case class ScoredGrams(df: DataFrame, y: Column)

  /** The shared scoring frame: one row per (doc, bigram) with the model
    * counts joined in, plus the unquantized `10⁶·ln(ratio)` column —
    * [[bigramScores]] floors it, [[minQuantizationMargin]] measures its
    * boundary distance.
    */
  private def scoredGrams(corpus: DataFrame, target: DataFrame,
                          idCol: String, textCol: String): ScoredGrams = {
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
    val y = lit(Scale) * log(
      (coalesce(col("__c12"), lit(0L)) + 1).cast("double") /
        (coalesce(col("__c1"), lit(0L)) + vOk).cast("double"))
    ScoredGrams(
      pg.join(bc, col("__g") === col("__mg"), "left")
        .join(uc, element_at(split(col("__g"), " "), 1) === col("__w"),
          "left")
        .crossJoin(broadcast(vF)),
      y)
  }

  /** CCNet-style perplexity-bucket curation (Wenzek et al. 2020): per
    * language, rank documents by their average per-transition model
    * cost and cut into TERCILES — head (best third), middle, tail;
    * CCNet keeps head+middle and drops the tail. All-integer and
    * tie-proof for the hash gate:
    *
    *  - cost_q = (−logprob) div n_bigrams — the NEGATED quantized sum
    *    divided as positive integers (Spark `div` truncates toward
    *    zero, DuckDB `//` floors: they agree only on non-negative
    *    operands, so the sign is flipped BEFORE the division);
    *    transition-less docs (< 2 tokens) cost 0 and sort first;
    *  - bucket = (3·(rank−1)) div n_lang over the total order
    *    (cost_q asc, id asc) within each language — the q47
    *    rank-discrete-quantile convention, never an interpolated
    *    percentile;
    *  - kept = bucket < 2.
    *
    * Scale note: this is the RANKED form (one per-language sort — the
    * oracle-checkable verifier). At 100 TB the cut is served by
    * joining rank-quantile BOUNDARIES (the `tokenQuantiles` machinery)
    * against the score column instead of ranking every row; the
    * boundary form changes no semantics, only the exchange.
    */
  def ccnetBuckets(corpus: DataFrame, target: DataFrame, idCol: String,
                   textCol: String, langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scores = bigramScores(corpus, target, idCol, textCol)
    val withLang = scores.join(
      corpus.select(col(idCol), col(langCol)), Seq(idCol))
      .withColumn("cost_q", when(col("n_bigrams") > 0,
        expr("(-logprob) div n_bigrams")).otherwise(lit(0L)))
    val w = Window.partitionBy(col(langCol))
      .orderBy(col("cost_q"), col(idCol))
    val wc = Window.partitionBy(col(langCol))
    withLang
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wc))
      .withColumn("bucket", expr("(3 * (__rn - 1)) div __n"))
      .select(col(idCol), col(langCol), col("cost_q"), col("bucket"),
        (col("bucket") < 2).as("kept"))
  }
}
