package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model tokenizer scoring (Kudo 2018, the
  * SentencePiece unigram scheme — the other mainstream subword
  * tokenizer beside BPE; public literature, no reference counterpart).
  *
  * Deterministic training stand-in for the full EM loop: candidate
  * pieces are every ≤ [[MaxPieceLen]]-char substring of the corpus
  * vocabulary weighted by word frequency; the model keeps the
  * `vocabSize` most frequent (ties → lexicographic) UNION every single
  * character (coverage guarantee), and each piece costs the quantized
  * `⌊1e6·ln(freq/T)⌋` (T = total selected-piece frequency). Scoring is
  * the per-word Viterbi max-score DP ([[graft.plans.UnigramScoreExpr]],
  * one codegen pass) — per document, the SUM of best word scores: the
  * corpus "encoding cost" a tokenizer evaluation compares across
  * vocabularies (lower magnitude ⇒ the vocabulary compresses the
  * corpus better). Scores are reported, never piece sequences — a max
  * is a unique value, so segmentation TIES cannot make the
  * hash-compared gate engine-order-sensitive.
  *
  * Determinism contract: freq and T are exact longs, `freq/T` is one
  * correctly-rounded double division, `ln` is margin-audited
  * (`minQuantMargin`, the q72/Bm25 kit), costs/fallback floor to exact
  * longs, and the DP is pure integer arithmetic after that.
  *
  * Scale shape (the 100 TB contract): training exchanges are bounded
  * by the CORPUS VOCABULARY (the word-count aggregate is model-scale,
  * the [[Lm]]/[[Bpe]] contract) — piece enumeration explodes DISTINCT
  * words (≤ [[MaxStarts]]·[[MaxPieceLen]] rows each), never raw text;
  * the selected model is a bounded driver collect (vocabSize + alphabet
  * rows); scoring is ONE narrow projection with the model riding as a
  * broadcast literal — zero exchanges, zero joins.
  */
object Unigram {

  val Scale = 1000000L

  /** Longest candidate piece. */
  val MaxPieceLen = 4

  /** Candidate substrings enumerate from at most this many start
    * positions per word — bounds the training explode on degenerate
    * mega-words (a >200-char alnum run is boilerplate/garbage; its
    * tail substrings add noise, not vocabulary). The DP scores FULL
    * words of any length regardless.
    */
  val MaxStarts = 200

  /** The trained model: (piece → quantized cost) + the fallback cost
    * an out-of-vocabulary single character scores.
    */
  final case class Model(pieces: Seq[(String, Long)], fallback: Long) {
    /** [[graft.plans.UnigramScoreExpr]] literal: header
      * `maxPieceLen fallback`, then `piece cost` lines.
      */
    def serialized: String =
      (s"$MaxPieceLen $fallback" +:
        pieces.map { case (p, c) => s"$p $c" }).mkString("\n")
  }

  /** Candidate piece frequencies over the corpus vocabulary:
    * freq(p) = Σ_words count(w) · #occurrences of p in w (start
    * positions capped at [[MaxStarts]]). One corpus-scan word count
    * (model-scale exchange), then a distinct-word-bounded explode.
    */
  def pieceFrequencies(corpus: DataFrame, textCol: String): DataFrame =
    pieceFreqFromWords(corpus
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt")))

  /** [[pieceFrequencies]] over a pre-counted (w, cnt) word frame —
    * cnt may be NEGATIVE (a change-feed word-count delta yields piece
    * DELTAS, the [[TokenizerIndex]] incremental-refresh seam: piece
    * frequency is additive over words).
    */
  private[operators] def pieceFreqFromWords(words: DataFrame)
      : DataFrame = {
    words
      .select(col("w"), col("cnt"),
        explode(sequence(lit(1),
          least(length(col("w")), lit(MaxStarts)))).as("i"))
      .select(col("w"), col("cnt"), col("i"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .filter(col("i") + col("l") - 1 <= length(col("w")))
      .select(col("w").substr(col("i"), col("l")).as("piece"), col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
  }

  /** Train the model: top-`vocabSize` pieces by (freq desc, piece asc)
    * UNION all single characters, quantized-ln costs, margin-audited.
    * Driver result is vocabSize + alphabet rows — bounded metadata.
    */
  def trainModel(corpus: DataFrame, textCol: String, vocabSize: Int,
                 minQuantMargin: Option[Double] = None): Model = {
    val cand = pieceFrequencies(corpus, textCol).persist()
    try modelFromFrequencies(cand, vocabSize, minQuantMargin)
    finally { cand.unpersist(blocking = false); () }
  }

  /** [[trainModel]]'s derivation from an already-computed candidate
    * frequency frame (piece, freq) — the [[TokenizerIndex]] serve
    * seam: deriving from PERSISTED frequencies runs the identical
    * top-V ∪ chars selection and cost chain, so the served model is
    * bit-identical to the inline one.
    */
  private[operators] def modelFromFrequencies(
      freqs: DataFrame, vocabSize: Int,
      minQuantMargin: Option[Double]): Model = {
    require(vocabSize >= 1, s"vocabSize >= 1, got $vocabSize")
    val spark = freqs.sparkSession
    import spark.implicits._
    val cand = freqs.select(col("piece"), col("freq"))
    val top = cand.orderBy(col("freq").desc, col("piece"))
      .limit(vocabSize)
    val vocab = top
      .unionByName(cand.filter(length(col("piece")) === 1))
      .distinct()
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    require(vocab.nonEmpty,
      "empty corpus vocabulary - no token survives normalization")
    val t = vocab.map(_._2).sum
    // mirror order: one double division each, same java.lang.Math.log
    // on both the engine and oracle side
    val raw: Seq[(String, Double)] = vocab.map { case (p, f) =>
      p -> 1000000.0 * math.log(f.toDouble / t.toDouble)
    }
    val fbRaw = 1000000.0 * math.log(1.0 / t.toDouble)
    minQuantMargin.foreach { threshold =>
      val m = (raw.map(_._2) :+ fbRaw).map { y =>
        val frac = y - math.floor(y)
        math.min(frac, 1.0 - frac)
      }.min
      if (m < threshold) throw new IllegalStateException(
        f"Unigram cost quantization margin $m%.3e below $threshold%.3e: " +
          "cross-engine ln drift could flip a floor - re-audit the " +
          "fixture before trusting a hash-compared oracle")
    }
    Model(raw.map { case (p, y) => p -> math.floor(y).toLong },
      math.floor(fbRaw).toLong)
  }

  /** Per-document unigram encoding cost: (idCol, n_words, uni_q) —
    * ONE codegen projection, the model broadcast as a literal, zero
    * exchanges.
    */
  def scoreDocs(corpus: DataFrame, idCol: String, textCol: String,
                model: Model): DataFrame =
    corpus.select(col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("n_words"),
      TextFunctions.unigramScore(col(textCol), model.serialized)
        .as("uni_q"))
}
