package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Stupid-backoff language-model scoring — the distributed-LM scheme
  * of Brants et al. 2007 ("Large Language Models in Machine
  * Translation", EMNLP): score each transition by the raw relative
  * frequency `c(w1 w2)/c(w1)` when the bigram was seen in the target
  * corpus, otherwise BACK OFF to the scaled unigram frequency
  * `α·c(w2)/N` (α = 0.4 in the paper). No discounting, no
  * normalization — the scheme exists precisely because at corpus
  * scale the normalized Kneser–Ney statistics are the bottleneck and
  * the unnormalized backoff score is "inexpensive and approaches the
  * quality of Kneser–Ney smoothing for large amounts of data".
  * Complements [[Perplexity]] (add-1-smoothed bigram LM, the CCNet
  * filter): same model-build shape, different — and at 100 TB far
  * cheaper to extend to higher orders — scoring rule. North-star
  * operator: the reference computes no corpus statistics.
  *
  * Determinism (the q74/q96 quantized-ln kit): counts are exact
  * longs, N and V ride as one-row broadcast aggregates, each
  * transition contributes `⌊10⁶·ln(score)⌋` with the mirrored-order
  * double chain replayed verbatim by the SQL oracle, and the
  * floor-boundary margin is auditable via [[minQuantizationMargin]]
  * (the runtime guard shape every quantized operator here carries).
  *
  * Scale design (identical envelope to [[Perplexity.bigramScores]]):
  * model build = one bigram + one unigram exchange over the target,
  * map-side combined, MODEL-scale (distinct n-grams) not
  * corpus-scale; the probe is three gram/word-keyed LEFT joins (AQE
  * broadcasts small models, gram-partitioned SMJ at real vocabulary
  * sizes) and ONE doc-keyed aggregation exchange; N and V reuse the
  * unigram table's exchange (ReuseExchange — no second target pass).
  */
object Lm {

  /** Quantization scale: scores are `⌊10⁶·ln(·)⌋` longs. */
  val Scale: Long = Importance.WeightScale

  private def gramsOf(toks: Column, n: Int): Column =
    call_function("graft_shingles", toks, lit(n))

  /** Score `corpus` docs under a stupid-backoff bigram model trained
    * on `target`: one row per corpus doc —
    * (idCol, n_bigrams, n_hit, n_backoff, sb_score) where `n_hit`
    * counts transitions scored from the bigram table, `n_backoff`
    * those that fell back to `α·c(w2)/N`, and `sb_score` is the
    * exact-long sum of quantized per-transition scores. A transition
    * whose w2 is out-of-vocabulary scores the uniform floor
    * `⌊10⁶·ln(α/V)⌋` (counted under neither hit nor backoff).
    * Documents with fewer than 2 tokens have no transitions and stay
    * in the output at (0, 0, 0, 0).
    */
  def stupidBackoffScores(corpus: DataFrame, target: DataFrame,
                          idCol: String, textCol: String,
                          alpha: Double = 0.4,
                          minQuantMargin: Option[Double] = None)
      : DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    minQuantMargin.foreach { threshold =>
      val m = minQuantizationMargin(corpus, target, idCol, textCol, alpha)
      if (m < threshold) throw new IllegalStateException(
        f"Lm.stupidBackoffScores quantization margin $m%.3e below " +
          f"threshold $threshold%.3e: a transition score sits close " +
          "enough to its floor boundary that cross-engine ln drift " +
          "could flip the quantized sum — re-audit the fixture before " +
          "trusting a hash-compared oracle")
    }
    val g = scoredGrams(corpus, target, idCol, textCol, alpha)
    g.df.groupBy(col(idCol))
      .agg(count(col("__g")).as("n_bigrams"),
        coalesce(sum(when(col("__g").isNotNull && col("__c12").isNotNull,
          1L)), lit(0L)).as("n_hit"),
        coalesce(sum(when(col("__g").isNotNull && col("__c12").isNull &&
          col("__c2").isNotNull, 1L)), lit(0L)).as("n_backoff"),
        coalesce(sum(when(col("__g").isNotNull,
          floor(g.y).cast("long"))), lit(0L)).as("sb_score"))
  }

  /** Min distance of any scored transition's UNQUANTIZED `10⁶·ln`
    * value to its nearest floor boundary — the cross-engine
    * determinism audit ([[Perplexity.minQuantizationMargin]] shape).
    * +∞ for a corpus with no scorable transitions.
    */
  def minQuantizationMargin(corpus: DataFrame, target: DataFrame,
                            idCol: String, textCol: String,
                            alpha: Double = 0.4): Double = {
    val g = scoredGrams(corpus, target, idCol, textCol, alpha)
    val frac = g.y - floor(g.y)
    val row = g.df.filter(col("__g").isNotNull)
      .agg(min(least(frac, lit(1.0) - frac))).head()
    if (row.isNullAt(0)) Double.PositiveInfinity else row.getDouble(0)
  }

  private final case class ScoredGrams(df: DataFrame, y: Column)

  /** One row per (doc, transition) with model counts joined in plus
    * the unquantized `10⁶·ln(score)` column. The three-way CASE is
    * mirrored verbatim by the SQL oracle: seen bigram → `c12/c1`,
    * unigram backoff → `α·(c2/N)`, OOV floor → `α/V`.
    */
  private def scoredGrams(corpus: DataFrame, target: DataFrame,
                          idCol: String, textCol: String,
                          alpha: Double): ScoredGrams = {
    val tt = target.select(TextFunctions.tokens(col(textCol)).as("__t"))
    val bc = tt.filter(size(col("__t")) >= 2)
      .select(explode(gramsOf(col("__t"), 2)).as("__mg"))
      .groupBy(col("__mg")).agg(count(lit(1)).as("__c12"))
    val uc = tt.select(explode(gramsOf(col("__t"), 1)).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    // N (total target tokens) and V (vocab) in ONE one-row broadcast —
    // the aggregate reuses uc's exchange (ReuseExchange)
    val nvF = uc.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
    val pg = corpus
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode_outer(
        when(size(col("__t")) >= 2, gramsOf(col("__t"), 2))
          .otherwise(array().cast("array<string>"))).as("__g"))
    // an empty target degenerates every score (ln of NULL/0) — fail
    // loudly, mirroring the oracle's CAST error on the same input
    val vOk = when(col("__v") > 0, col("__v")).otherwise(raise_error(
      lit("Lm.stupidBackoffScores: target corpus has no tokens (V = 0)")))
    val y = lit(Scale) * when(col("__c12").isNotNull,
        log(col("__c12").cast("double") / col("__c1").cast("double")))
      .when(col("__c2").isNotNull,
        log(lit(alpha) *
          (col("__c2").cast("double") / col("__n").cast("double"))))
      .otherwise(log(lit(alpha) / vOk.cast("double")))
    ScoredGrams(
      pg.join(bc, col("__g") === col("__mg"), "left")
        .join(uc.select(col("__w").as("__w1"), col("__c").as("__c1")),
          element_at(split(col("__g"), " "), 1) === col("__w1"), "left")
        .join(uc.select(col("__w").as("__w2"), col("__c").as("__c2")),
          element_at(split(col("__g"), " "), 2) === col("__w2"), "left")
        .crossJoin(broadcast(nvF)),
      y)
  }
}
