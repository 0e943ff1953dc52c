package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.functions.TextFunctions

/** Importance-weighted data selection (DSIR-style): score every raw
  * document by how target-like its hashed n-gram distribution is —
  * `score(d) = Σ_grams w(bucket(gram))` with
  * `w(b) = ⌊10⁶ · ln(p_target(b) / p_raw(b))⌋`, add-1-smoothed bag of
  * hashed unigrams+bigrams (the published estimator's feature space).
  * High scores = documents that look like the target corpus; select by
  * thresholding or top-fraction downstream. North-star operator — the
  * reference has no data-selection stage.
  *
  * Scale design: bucket counts are map-side-combined aggregates whose
  * wire traffic is k partial rows per partition; the k-row count table
  * is a BOUNDED driver collect (k ≪ corpus, the [[Sampling.temperatureMix]]
  * precedent) from which the quantized weights build a local relation
  * that BROADCASTS back — no corpus double-pass, no totals cross-join.
  * The scoring pass is scan → explode → broadcast lookup → ONE doc_id
  * exchange (map-side partial sum of exact longs). Three corpus passes
  * total (target counts, raw counts, score), inherent to the estimator.
  *
  * Determinism: the weight is quantized (floor of 10⁶·ln) so the score
  * is an exact-long sum — reproducible across runs, partitionings, and
  * engines. ln itself is cross-library-identical only to ~1 ulp, but the
  * quantization boundary margin is audited ≥ 5·10⁻⁴ on every gate
  * fixture (vs ~10⁻¹⁰ ulp drift), and inputs are fixed per SF, so the
  * oracle compare is deterministic, not flaky (the q64 sqrt argument,
  * weakened from correctly-rounded to margin-audited).
  */
object Importance {

  /** Log-ratio quantization scale: weights are ⌊10⁶·ln(ratio)⌋ longs. */
  val WeightScale: Long = 1000000L

  /** Hashed unigram+bigram bag of a text column (non-distinct — counts
    * are the feature). Same token/shingle kernels as the dedup family.
    */
  private[operators] def grams(c: org.apache.spark.sql.Column) =
    concat(TextFunctions.shingles(c, 1), TextFunctions.shingles(c, 2))

  private def bucketOf(g: org.apache.spark.sql.Column, salt: String,
                       k: Int) =
    pmod(Sampling.hashBucket(g, salt), lit(k.toLong))

  /** Per-bucket gram counts of `df`'s `textCol`: k rows (bucket, cnt),
    * missing buckets absent (the caller zero-fills). Map-side partial
    * count — only k rows per partition reach the exchange.
    */
  private def bucketCounts(df: DataFrame, textCol: String, salt: String,
                           k: Int): Array[(Long, Long)] =
    df.select(explode(grams(col(textCol))).as("__g"))
      .groupBy(bucketOf(col("__g"), salt, k).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** The quantized importance-weight table: k rows (bucket, w) with
    * `w = ⌊10⁶ · ln( ((ct+1)/(cr+1)) · ((Nr+k)/(Nt+k)) )⌋` — add-1
    * smoothing over the k hashed buckets, ln of the smoothed
    * probability ratio. Both count aggregates are bounded driver
    * collects (k rows each); the returned frame is a k-row local
    * relation that broadcasts into the scoring join.
    */
  def hashedWeights(target: DataFrame, raw: DataFrame, textCol: String,
                    k: Int = 64, salt: String = "dsir",
                    minQuantMargin: Option[Double] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ct = bucketCounts(target, textCol, salt, k).toMap
    val cr = bucketCounts(raw, textCol, salt, k).toMap
    val nt = ct.valuesIterator.sum
    val nr = cr.valuesIterator.sum
    val ys = (0L until k.toLong).map { b =>
      // formula order mirrored verbatim in the SQL oracle: two double
      // divisions, one multiply, ln, floor — IEEE ops are
      // order-deterministic, ln is margin-audited (scaladoc)
      val x = ((ct.getOrElse(b, 0L) + 1).toDouble /
          (cr.getOrElse(b, 0L) + 1).toDouble) *
        ((nr + k).toDouble / (nt + k).toDouble)
      b -> WeightScale * math.log(x)
    }
    // debug-mode guard for the margin the determinism argument rests
    // on: min distance of any UNQUANTIZED weight to its floor boundary
    // (weights are k driver-side doubles, so this audit is exact and
    // free). Throws rather than letting a near-boundary fixture ship a
    // flaky hash-compared oracle.
    minQuantMargin.foreach { threshold =>
      val m = ys.map { case (_, y) =>
        val frac = y - math.floor(y)
        math.min(frac, 1.0 - frac)
      }.minOption.getOrElse(Double.PositiveInfinity)
      if (m < threshold) throw new IllegalStateException(
        f"DSIR quantization margin $m%.3e below threshold $threshold%.3e: " +
          "a weight sits close enough to its floor boundary that " +
          "cross-engine ln drift could flip it — re-audit the fixture " +
          "before trusting a hash-compared oracle")
    }
    val rows = ys.map { case (b, y) => Row(b, math.floor(y).toLong) }
    target.sparkSession.createDataFrame(
      target.sparkSession.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("bucket", LongType, nullable = false),
        StructField("w", LongType, nullable = false))))
  }

  /** Score every `raw` document against a weight table from
    * [[hashedWeights]]: (idCol, n_feats, score) — `n_feats` = gram
    * count, `score` = exact-long Σ w. Featureless docs (empty/NULL
    * text) stay in the output at (0, 0) via explode_outer — no
    * id-universe join-back. One doc_id exchange; the weight join is a
    * broadcast.
    */
  def score(raw: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, k: Int = 64,
            salt: String = "dsir"): DataFrame =
    raw.select(col(idCol), explode_outer(grams(col(textCol))).as("__g"))
      .withColumn("__b",
        when(col("__g").isNotNull, bucketOf(col("__g"), salt, k)))
      .join(broadcast(weights), col("__b") === col("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__b")).as("n_feats"),
        coalesce(sum(col("w")), lit(0L)).as("score"))

  /** The composed selector: DSIR scores of `raw` against `target`.
    *
    * By default `raw` executes TWICE (bucket counts + scoring pass) —
    * callers with an expensive upstream should persist it, or pass
    * `persistUpstream = true`: `raw` is pinned, the counts pass fills
    * the cache, the scoring pass reads it, and the pin is released
    * before returning — the result comes back as an eagerly-
    * materialized persisted snapshot ((id, n_feats, score) longs, far
    * narrower than the text corpus; `unpersist()` it when consumed —
    * the [[graft.sources.TableStore.snapshot]] handle pattern).
    */
  def dsirScores(target: DataFrame, raw: DataFrame, idCol: String,
                 textCol: String, k: Int = 64,
                 salt: String = "dsir",
                 persistUpstream: Boolean = false): DataFrame = {
    val in = if (persistUpstream) raw.persist() else raw
    try {
      val out = score(in, idCol, textCol,
        hashedWeights(target, in, textCol, k, salt), k, salt)
      if (!persistUpstream) out
      else graft.sources.TableStore.eagerSnapshot(out)
    } finally if (persistUpstream) in.unpersist(blocking = false)
  }
}
