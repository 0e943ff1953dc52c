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

  /** The trained model as FRAMES — unigram counts `(__w, __c)`,
    * bigram counts `(__mg, __cb)`, trigram counts `(__mg3, __c123)`,
    * and the one-row `(__n, __v)` totals — so the scoring joins are
    * source-agnostic: [[modelFrames]] computes them from target text,
    * [[LmIndex]] reads the SAME shapes from a persisted count table,
    * and the shared scoring expressions guarantee served scores are
    * bit-identical to inline ones. All frames are lazy; a scorer that
    * never joins `tc` never pays for it.
    */
  private[operators] final case class LmFrames(uc: DataFrame,
                                               bc: DataFrame,
                                               tc: DataFrame,
                                               nvF: DataFrame)

  /** Count frames from target text: one tokenize feeding the unigram
    * exchange (which N/V reuse), plus one bigram and one trigram
    * exchange — each MODEL-scale (distinct grams), map-side combined.
    */
  private[operators] def modelFrames(target: DataFrame,
                                     textCol: String): LmFrames = {
    val tt = target.select(TextFunctions.tokens(col(textCol)).as("__t"))
    val uc = tt.select(explode(gramsOf(col("__t"), 1)).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    val bc = tt.filter(size(col("__t")) >= 2)
      .select(explode(gramsOf(col("__t"), 2)).as("__mg"))
      .groupBy(col("__mg")).agg(count(lit(1)).as("__cb"))
    val tc = tt.filter(size(col("__t")) >= 3)
      .select(explode(gramsOf(col("__t"), 3)).as("__mg3"))
      .groupBy(col("__mg3")).agg(count(lit(1)).as("__c123"))
    val nvF = uc.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
    LmFrames(uc, bc, tc, nvF)
  }

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
      : DataFrame =
    stupidBackoffScoresFrom(corpus, modelFrames(target, textCol),
      idCol, textCol, alpha, minQuantMargin)

  /** [[stupidBackoffScores]] over pre-built model frames — the shared
    * body the inline and [[LmIndex]]-served paths both run, so served
    * scores are bit-identical by construction.
    */
  private[operators] def stupidBackoffScoresFrom(
      corpus: DataFrame, m: LmFrames, idCol: String, textCol: String,
      alpha: Double, minQuantMargin: Option[Double]): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    minQuantMargin.foreach { threshold =>
      val mg = marginOf(scoredGrams(corpus, m, idCol, textCol, alpha),
        excludeExactOne = false)
      if (mg < threshold) throw new IllegalStateException(
        f"Lm.stupidBackoffScores quantization margin $mg%.3e below " +
          f"threshold $threshold%.3e: a transition score sits close " +
          "enough to its floor boundary that cross-engine ln drift " +
          "could flip the quantized sum — re-audit the fixture before " +
          "trusting a hash-compared oracle")
    }
    val g = scoredGrams(corpus, m, idCol, textCol, alpha)
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
                            alpha: Double = 0.4): Double =
    marginOf(scoredGrams(corpus, modelFrames(target, textCol), idCol,
      textCol, alpha), excludeExactOne = false)

  /** Min distance of any scored transition's unquantized value to its
    * floor boundary; `excludeExactOne` drops score-exactly-1 rows
    * (ln(1.0) = 0.0 is ON a boundary but exact in every engine — the
    * trigram/KN audits' exclusion).
    */
  private def marginOf(g: ScoredGrams, excludeExactOne: Boolean)
      : Double = {
    val frac = g.y - floor(g.y)
    val base = g.df.filter(col("__g").isNotNull)
    val rows = if (excludeExactOne) base.filter(g.y =!= lit(0.0)) else base
    val row = rows.agg(min(least(frac, lit(1.0) - frac))).head()
    if (row.isNullAt(0)) Double.PositiveInfinity else row.getDouble(0)
  }

  /** Trigram stupid backoff — the whole point of the scheme (Brants
    * 2007 §3: backoff makes HIGHER orders cheap because no
    * normalization statistics are needed): score each trigram
    * transition by the recursive rule
    * `S(w3|w1w2) = c123/c12  if the trigram was seen,
    *  else α·S(w3|w2)` which expands to the four-way CASE
    * `c123/c12 → α·c23/c2 → α²·c3/N → α²/V` (a seen trigram implies
    * its prefix bigram, a seen bigram implies its first word — the
    * denominators of the taken branch are never NULL). One row per
    * corpus doc: (idCol, n_trigrams, n_hit3, n_hit2, n_backoff,
    * sb_score) — n_hit3 scored from the trigram table, n_hit2 from
    * the bigram backoff, n_backoff from the unigram, OOV (floor)
    * under none. Docs with < 3 tokens stay in the output at zeros.
    *
    * Scale envelope: ONE extra model exchange vs the bigram form (the
    * trigram table); the probe adds two gram-keyed LEFT joins against
    * the same bigram table (both sides of the backoff) — still
    * model-scale exchanges only, N/V ride the same one-row broadcast.
    */
  def stupidBackoffTrigramScores(corpus: DataFrame, target: DataFrame,
                                 idCol: String, textCol: String,
                                 alpha: Double = 0.4,
                                 minQuantMargin: Option[Double] = None)
      : DataFrame =
    stupidBackoffTrigramScoresFrom(corpus,
      modelFrames(target, textCol), idCol, textCol, alpha,
      minQuantMargin)

  /** [[stupidBackoffTrigramScores]] over pre-built model frames (the
    * [[LmIndex]] serve seam).
    */
  private[operators] def stupidBackoffTrigramScoresFrom(
      corpus: DataFrame, m: LmFrames, idCol: String, textCol: String,
      alpha: Double, minQuantMargin: Option[Double]): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1], got $alpha")
    minQuantMargin.foreach { threshold =>
      val mg = marginOf(scoredTrigrams(corpus, m, idCol, textCol,
        alpha), excludeExactOne = true)
      if (mg < threshold) throw new IllegalStateException(
        f"Lm.stupidBackoffTrigramScores quantization margin $mg%.3e " +
          f"below threshold $threshold%.3e: a transition score sits " +
          "close enough to its floor boundary that cross-engine ln " +
          "drift could flip the quantized sum — re-audit the fixture " +
          "before trusting a hash-compared oracle")
    }
    val g = scoredTrigrams(corpus, m, idCol, textCol, alpha)
    g.df.groupBy(col(idCol))
      .agg(count(col("__g")).as("n_trigrams"),
        coalesce(sum(when(col("__g").isNotNull && col("__c123").isNotNull,
          1L)), lit(0L)).as("n_hit3"),
        coalesce(sum(when(col("__g").isNotNull && col("__c123").isNull &&
          col("__c23").isNotNull, 1L)), lit(0L)).as("n_hit2"),
        coalesce(sum(when(col("__g").isNotNull && col("__c123").isNull &&
          col("__c23").isNull && col("__c3").isNotNull, 1L)), lit(0L))
          .as("n_backoff"),
        coalesce(sum(when(col("__g").isNotNull,
          floor(g.y).cast("long"))), lit(0L)).as("sb_score"))
  }

  /** [[minQuantizationMargin]] for the trigram form, with one extra
    * exclusion the bigram form rarely needs: a UNIQUE-CONTINUATION
    * context (c123 == c12 — at trigram order most contexts are
    * unique) scores exactly 1, and `ln(1.0) = 0.0` sits ON a floor
    * boundary — but it is EXACT in every engine (the ratio of equal
    * longs is exactly 1.0 and ln(1.0) returns exactly 0.0 in
    * java.lang.Math and DuckDB alike), so it cannot drift and is
    * excluded from the audit rather than failing it.
    */
  def minQuantizationMarginTrigram(corpus: DataFrame, target: DataFrame,
                                   idCol: String, textCol: String,
                                   alpha: Double = 0.4): Double =
    marginOf(scoredTrigrams(corpus, modelFrames(target, textCol),
      idCol, textCol, alpha), excludeExactOne = true)

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * smoothing stupid backoff explicitly approximates — Brants 2007
    * §3): each transition scores
    *
    *   P(w2|w1) = max(c12 − d, 0)/c1 + d·N1+(w1·)/c1 · N1+(·w2)/B
    *
    * with absolute discount d = 3/4 and continuation probability
    * N1+(·w2)/B (B = distinct bigram types) — the "how many contexts
    * does w2 continue" statistic that makes KN beat raw frequency on
    * Francisco-type words. Four-way CASE by what the model has seen:
    *
    *   1. seen bigram      → the full interpolated formula
    *   2. seen w1 (with continuations) and seen-continuation w2
    *                       → discount mass only: d·N1+(w1·)/c1·N1+(·w2)/B
    *   3. seen-continuation w2 (w1 unseen / continuation-less)
    *                       → P_cont(w2) = N1+(·w2)/B
    *   4. else             → uniform 1/V floor (the stupid-backoff OOV
    *                         convention; true KN assigns such tokens
    *                         zero mass, which ln cannot score)
    *
    * Determinism: d = 3/4 makes every probability a ratio of EXACT
    * integers — num = max(4·c12−3, 0)·B + 3·N1+(w1·)·N1+(·w2), den =
    * 4·c1·B — so the score is `ln` of ONE correctly-rounded double
    * division (no a+b·c shape for DuckDB's FMA contraction to break,
    * the q90 lesson) and the usual quantized-ln margin audit
    * ([[minQuantizationMarginKn]]) covers the rest. Integer guard:
    * num ≤ 4·c12·B + 3·N1f·N1c stays well under 2^53 through sf1;
    * beyond that promote the numerator to decimal before the divide.
    *
    * Scale envelope: the bigram/unigram model exchanges of
    * [[stupidBackoffScores]] plus TWO model-scale aggregates over the
    * bigram table (N1+(w1·), N1+(·w2) — grouped counts of distinct
    * types, not corpus passes); B rides the same one-row broadcast as
    * N/V. The probe adds two word-keyed LEFT joins.
    */
  def kneserNeyScores(corpus: DataFrame, target: DataFrame,
                      idCol: String, textCol: String,
                      minQuantMargin: Option[Double] = None): DataFrame =
    kneserNeyScoresFrom(corpus, modelFrames(target, textCol), idCol,
      textCol, minQuantMargin)

  /** [[kneserNeyScores]] over pre-built model frames (the [[LmIndex]]
    * serve seam — the KN statistics N1+(w1·)/N1+(·w2)/B are DERIVED
    * from the bigram frame, so a persisted uni+bi model serves KN
    * with no extra components).
    */
  private[operators] def kneserNeyScoresFrom(
      corpus: DataFrame, m: LmFrames, idCol: String, textCol: String,
      minQuantMargin: Option[Double]): DataFrame = {
    minQuantMargin.foreach { threshold =>
      val mg = marginOf(scoredKn(corpus, m, idCol, textCol),
        excludeExactOne = true)
      if (mg < threshold) throw new IllegalStateException(
        f"Lm.kneserNeyScores quantization margin $mg%.3e below " +
          f"threshold $threshold%.3e: a transition score sits close " +
          "enough to its floor boundary that cross-engine ln drift " +
          "could flip the quantized sum — re-audit the fixture before " +
          "trusting a hash-compared oracle")
    }
    val g = scoredKn(corpus, m, idCol, textCol)
    g.df.groupBy(col(idCol))
      .agg(count(col("__g")).as("n_bigrams"),
        coalesce(sum(when(col("__g").isNotNull && col("__c12").isNotNull,
          1L)), lit(0L)).as("n_top"),
        coalesce(sum(when(col("__g").isNotNull && col("__c12").isNull &&
          col("__c1").isNotNull && col("__n1f").isNotNull &&
          col("__n1c").isNotNull, 1L)), lit(0L)).as("n_interp"),
        coalesce(sum(when(col("__g").isNotNull && col("__c12").isNull &&
          (col("__c1").isNull || col("__n1f").isNull) &&
          col("__n1c").isNotNull, 1L)), lit(0L)).as("n_cont"),
        coalesce(sum(when(col("__g").isNotNull,
          floor(g.y).cast("long"))), lit(0L)).as("kn_score"))
  }

  /** [[minQuantizationMargin]] for the KN form (exact-1 scores
    * excluded like the trigram audit — a ratio of equal longs and
    * ln(1.0)=0.0 are exact in every engine).
    */
  def minQuantizationMarginKn(corpus: DataFrame, target: DataFrame,
                              idCol: String, textCol: String): Double =
    marginOf(scoredKn(corpus, modelFrames(target, textCol), idCol,
      textCol), excludeExactOne = true)

  /** One row per (doc, bigram transition) with the KN statistics
    * joined in plus the unquantized `10⁶·ln(P)` column (q124's oracle
    * replays the CASE verbatim).
    */
  private def scoredKn(corpus: DataFrame, m: LmFrames,
                       idCol: String, textCol: String): ScoredGrams = {
    val bc = m.bc.select(col("__mg"), col("__cb").as("__c12"))
    val mgParts = split(col("__mg"), " ")
    val n1f = bc.groupBy(element_at(mgParts, 1).as("__fw"))
      .agg(count(lit(1)).as("__n1f"))
    val n1b = bc.groupBy(element_at(mgParts, 2).as("__cw"))
      .agg(count(lit(1)).as("__n1c"))
    val uc = m.uc
    // B (bigram types) + V (vocab) in one one-row broadcast; both
    // aggregates reuse their model table's exchange
    val bvF = bc.agg(count(lit(1)).as("__b"))
      .crossJoin(uc.agg(count(lit(1)).as("__v")))
    val pg = corpus
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode_outer(
        when(size(col("__t")) >= 2, gramsOf(col("__t"), 2))
          .otherwise(array().cast("array<string>"))).as("__g"))
    val parts = split(col("__g"), " ")
    val vOk = when(col("__v") > 0, col("__v")).otherwise(raise_error(
      lit("Lm.kneserNeyScores: target corpus has no tokens (V = 0)")))
    // exact-integer numerator/denominator (d = 3/4 multiplied through)
    val numTop = (lit(4L) * col("__c12") - lit(3L)) * col("__b") +
      lit(3L) * col("__n1f") * col("__n1c")
    val numInterp = lit(3L) * col("__n1f") * col("__n1c")
    val denC1 = lit(4L) * col("__c1") * col("__b")
    val y = lit(Scale) * when(col("__c12").isNotNull,
        log(numTop.cast("double") / denC1.cast("double")))
      .when(col("__c1").isNotNull && col("__n1f").isNotNull &&
          col("__n1c").isNotNull,
        log(numInterp.cast("double") / denC1.cast("double")))
      .when(col("__n1c").isNotNull,
        log(col("__n1c").cast("double") / col("__b").cast("double")))
      .otherwise(log(lit(1.0) / vOk.cast("double")))
    ScoredGrams(
      pg.join(bc.select(col("__mg"), col("__c12")),
          col("__g") === col("__mg"), "left")
        .join(uc.select(col("__w").as("__w1"), col("__c").as("__c1")),
          element_at(parts, 1) === col("__w1"), "left")
        .join(n1f, element_at(parts, 1) === col("__fw"), "left")
        .join(n1b, element_at(parts, 2) === col("__cw"), "left")
        .crossJoin(broadcast(bvF)),
      y)
  }

  private final case class ScoredGrams(df: DataFrame, y: Column)

  /** One row per (doc, trigram transition) with all backoff-level
    * counts joined in plus the unquantized `10⁶·ln(score)` column —
    * the four-way CASE mirrored verbatim by q117's oracle.
    */
  private def scoredTrigrams(corpus: DataFrame, m: LmFrames,
                             idCol: String, textCol: String,
                             alpha: Double): ScoredGrams = {
    val tc = m.tc
    val bc = m.bc
    val uc = m.uc
    val nvF = m.nvF
    val pg = corpus
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .select(col(idCol), explode_outer(
        when(size(col("__t")) >= 3, gramsOf(col("__t"), 3))
          .otherwise(array().cast("array<string>"))).as("__g"))
    val parts = split(col("__g"), " ")
    val b12 = concat_ws(" ", element_at(parts, 1), element_at(parts, 2))
    val b23 = concat_ws(" ", element_at(parts, 2), element_at(parts, 3))
    val vOk = when(col("__v") > 0, col("__v")).otherwise(raise_error(
      lit("Lm.stupidBackoffTrigramScores: target corpus has no tokens " +
        "(V = 0)")))
    val y = lit(Scale) * when(col("__c123").isNotNull,
        log(col("__c123").cast("double") / col("__c12").cast("double")))
      .when(col("__c23").isNotNull,
        log(lit(alpha) *
          (col("__c23").cast("double") / col("__c2").cast("double"))))
      .when(col("__c3").isNotNull,
        log(lit(alpha) * lit(alpha) *
          (col("__c3").cast("double") / col("__n").cast("double"))))
      .otherwise(log(lit(alpha) * lit(alpha) / vOk.cast("double")))
    ScoredGrams(
      pg.join(tc, col("__g") === col("__mg3"), "left")
        .join(bc.select(col("__mg").as("__mg12"), col("__cb").as("__c12")),
          b12 === col("__mg12"), "left")
        .join(bc.select(col("__mg").as("__mg23"), col("__cb").as("__c23")),
          b23 === col("__mg23"), "left")
        .join(uc.select(col("__w").as("__w2"), col("__c").as("__c2")),
          element_at(parts, 2) === col("__w2"), "left")
        .join(uc.select(col("__w").as("__w3"), col("__c").as("__c3")),
          element_at(parts, 3) === col("__w3"), "left")
        .crossJoin(broadcast(nvF)),
      y)
  }

  /** One row per (doc, transition) with model counts joined in plus
    * the unquantized `10⁶·ln(score)` column. The three-way CASE is
    * mirrored verbatim by the SQL oracle: seen bigram → `c12/c1`,
    * unigram backoff → `α·(c2/N)`, OOV floor → `α/V`.
    */
  private def scoredGrams(corpus: DataFrame, m: LmFrames,
                          idCol: String, textCol: String,
                          alpha: Double): ScoredGrams = {
    val bc = m.bc.select(col("__mg"), col("__cb").as("__c12"))
    val uc = m.uc
    val nvF = m.nvF
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
