package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** In-engine trainable text classifier: hashed bag-of-words features +
  * a linear model fit by full-batch gradient descent — the fastText-
  * style "cheap proxy scorer" every curation pipeline distills its
  * expensive labeler into (LLM judgments, rule cascades, human labels)
  * so the whole corpus can be scored at scan speed.
  *
  * Cross-engine exactness (the repo's oracle discipline): training is
  * ALL integer arithmetic — weights are fixed-point longs scaled by
  * 2^20, the nonlinearity is the hard sigmoid `clamp(1/2 + z/4, 0, 1)`
  * (the piecewise-linear logistic surrogate; σ'(0) = 1/4 matches), and
  * every division is truncation-toward-zero, which Spark's `div` and
  * DuckDB's `//` agree on. Zero transcendentals ⇒ no quantized-ln
  * margin kit needed: a SQL replay reproduces every weight, score and
  * prediction BIT-EXACTLY, iteration by iteration (q122).
  *
  * Step schedule: η_t = 2^-(t+1) — the standard diminishing schedule
  * for (sub)gradient descent; a constant step oscillates on this
  * objective (measured in the round-10 prototype: 64% → 78% → bounce),
  * the halving schedule converges monotonically after the first
  * overshoot.
  *
  * Scale shape (the 100 TB story):
  *   - Features are built with ONE corpus exchange: `repartition(id)`
  *     BEFORE the (id, bucket) count — HashPartitioning(id) already
  *     satisfies the grouped distribution (id ⊆ keys), so the count
  *     aggregates exchange-free and the frame stays id-partitioned for
  *     the whole training loop (persisted, scanned 2× per iteration).
  *   - Per iteration: weights (dim rows) broadcast into the score
  *     join; the per-doc score aggregate and the err⋈feats join are
  *     both exchange-free on the id partitioning; the gradient is ONE
  *     dim-bounded exchange (map-side partials ⇒ ≤ dim rows per
  *     partition) collected to the driver — the classic distributed-LR
  *     treeAggregate shape, corpus never re-shuffled.
  *   - Gradient cells accumulate in decimal(38,0) (exact at any corpus
  *     size — a long overflows around 10^10 docs × max err × count);
  *     the driver update divides in BigInteger, also exact.
  *   - dim bounds driver memory and broadcast size (2^18 longs = 2 MiB
  *     default), independent of corpus size.
  */
object Classifier {

  // [[trainAndScore]] pins its feature frame across the training loop;
  // same owned-release registry pattern as [[Dedup]]. Round 14: the
  // pin is a [[Loops.truncate]] checkpoint (release closures, not
  // Dataset.unpersist) — a released score plan no longer recomputes,
  // consume it before releasing.
  private val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private val pinnedReleases =
    scala.collection.mutable.ListBuffer.empty[() => Unit]
  graft.Engine.register("Classifier")(() => releaseIntermediates())

  /** Release every feature frame pinned so far. */
  def releaseIntermediates(): Unit = synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
    pinnedReleases.foreach(f => f())
    pinnedReleases.clear()
  }

  /** @param dim        hashed feature space (weight vector length)
    * @param iters      full-batch GD steps
    * @param scaleShift fixed-point scale: weights/scores carry 2^scaleShift
    * @param salt       feature-hash salt ([[Sampling.hashBucket]] convention)
    */
  final case class Config(dim: Int = 1 << 18, iters: Int = 6,
                          scaleShift: Int = 20, salt: String = "clf") {
    require(dim > 0 && iters >= 1 && scaleShift >= 1 && scaleShift <= 40)
    val scale: Long = 1L << scaleShift
  }

  /** Hashed bag-of-words features: one row per (id, bucket) with the
    * token count, plus the label carried alongside. md5-bucket hashing
    * ([[Sampling.hashBucket]] mod dim) so any engine replays the
    * feature map. One exchange (the id repartition); the count
    * aggregate and everything downstream reuse that partitioning.
    * Callers persist the result (it is scanned 2× per training
    * iteration).
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     label: Column, cfg: Config = Config()): DataFrame =
    docs
      // EXPLICIT partition count (cluster-adaptive, not a constant):
      // the expensive per-row work (tokenize + md5 per token) runs
      // AFTER this exchange, whose input bytes are tiny — a bare
      // repartition(col) lets AQE coalesce it to one partition by
      // byte-size and serialize the whole feature build into a single
      // task (measured 27 s for a 2.4 s build at sf0.1). A
      // user-specified count is exempt from AQE coalescing.
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .select(col(idCol).as("id"), label.cast("long").as("y"),
        explode(filter(TextFunctions.tokens(col(textCol)),
          t => length(t) > 0)).as("w"))
      .groupBy(col("id"), col("y"),
        (Sampling.hashBucket(col("w"), cfg.salt) % cfg.dim).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Hard sigmoid over a fixed-point score: clamp(S/2 + z/4, 0, S),
    * z/4 as truncation-toward-zero via sign-split shifts (exact, and
    * equal to SQL `z // 4` under DuckDB's truncating `//`).
    */
  private def hardSigmoid(z: Column, scale: Long): Column = {
    val q = when(z >= 0, shiftright(z, 2))
      .otherwise(-shiftright(-z, 2))
    greatest(lit(0L), least(lit(scale), lit(scale / 2) + q))
  }

  /** Truncation-toward-zero BigInteger division (driver twin of the
    * engine-side rule).
    */
  private def tdiv(a: BigInt, b: BigInt): BigInt =
    a.abs / b * (if (a.signum < 0) -1 else 1)

  /** Train the hard-sigmoid linear model by full-batch GD over
    * [[hashedFeatures]] output. Returns (weights, bias), both
    * fixed-point at 2^scaleShift — dim-bounded driver state, like
    * k-means centroids. One action per iteration.
    */
  def train(feats: DataFrame, cfg: Config = Config()): (Array[Long], Long) = {
    val n = feats.select(col("id")).distinct().count()
    require(n > 0, "empty corpus")
    val weights = Array.fill(cfg.dim)(0L)
    var bias = 0L
    for (it <- 0 until cfg.iters) {
      val grad = gradient(feats, weights, bias, cfg)
      val den = BigInt(n) << (it + 1)
      grad.foreach { case (b, g) =>
        if (b >= 0) weights(b.toInt) =
          (BigInt(weights(b.toInt)) - tdiv(g, den)).toLong
        else bias = (BigInt(bias) - tdiv(g, den)).toLong
      }
    }
    (weights, bias)
  }

  /** One full-batch gradient: Σ_docs err·cnt per bucket (+ the bias
    * cell as bucket −1). err = hardSigmoid(z) − y·S. Exchange-free up
    * to the final dim-bounded aggregate; cells accumulate in
    * decimal(38,0).
    */
  private def gradient(feats: DataFrame, weights: Array[Long], bias: Long,
                       cfg: Config): Array[(Long, BigInt)] = {
    val errDf = perDocErr(feats, weights, bias, cfg)
    // SHUFFLE_HASH, not the default sort-merge: both sides are already
    // id-partitioned (zero exchange either way), but SMJ re-SORTS the
    // full feature frame every iteration; hashing the per-doc err side
    // (one row per doc — always the smaller side) streams feats as-is
    val terms = feats.join(errDf.hint("shuffle_hash"), Seq("id"))
      .select(col("bucket"), (col("err") * col("cnt"))
        .cast("decimal(38,0)").as("term"))
      .union(errDf.select(lit(-1L).as("bucket"),
        col("err").cast("decimal(38,0)").as("term")))
    terms.groupBy(col("bucket"))
      .agg(sum(col("term")).as("g"))
      .collect()
      .map(r => (r.getLong(0),
        BigInt(r.getDecimal(1).toBigInteger)))
  }

  /** Per-doc fixed-point err (and score): weights broadcast into the
    * feats join, per-doc sum exchange-free on the id partitioning.
    */
  private def perDocErr(feats: DataFrame, weights: Array[Long], bias: Long,
                        cfg: Config): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val wdf = weights.zipWithIndex
      .collect { case (w, b) if w != 0L => (b.toLong, w) }
      .toSeq.toDF("bucket", "w")
    val z = feats.join(broadcast(wdf), Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg(max(col("y")).as("y"),
        (lit(bias) +
          sum(coalesce(col("w"), lit(0L)) * col("cnt"))).as("z"))
    z.select(col("id"), col("y"), col("z"),
      (hardSigmoid(col("z"), cfg.scale) - col("y") * cfg.scale).as("err"))
  }

  /** Score every doc with a trained model: (id, y, z, p, pred), all
    * exact fixed-point longs. Same broadcast-join shape as training.
    */
  def score(feats: DataFrame, weights: Array[Long], bias: Long,
            cfg: Config = Config()): DataFrame =
    perDocErr(feats, weights, bias, cfg)
      .select(col("id"), col("y"), col("z"),
        hardSigmoid(col("z"), cfg.scale).as("p"))
      .withColumn("pred", (col("p") * 2 > cfg.scale).cast("long"))

  // ---------------------------------------------------- persistence

  /** Persist a trained model as TableStore table `table` — the same
    * train-once / serve-many contract as [[AnnIndex.save]]: the
    * artifact inherits OCC commits, generations and time travel, so a
    * serving fleet pins the generation this returns and
    * [[loadModelAt]] re-serves identical scores after any number of
    * retrains. Weights are stored SPARSE (nonzero buckets only — at
    * dim 2^18 most cells never see a feature), bias as bucket −1; the
    * meta row pins (dim, scaleShift, salt, iters) so serving can't
    * silently hash into a different feature space.
    */
  def saveModel(store: graft.sources.TableStore, table: String,
                weights: Array[Long], bias: Long,
                cfg: Config = Config()): Long = {
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    val metaRow = Seq(("meta", -1L, 0L,
        AnnIndex.jsonOf(Map("dim" -> cfg.dim.toString,
          "scaleShift" -> cfg.scaleShift.toString,
          "salt" -> cfg.salt, "iters" -> cfg.iters.toString))))
      .toDF("component", "bucket", "w", "meta")
    val rows = weights.zipWithIndex
      .collect { case (w, b) if w != 0L =>
        ("weight", b.toLong, w, null: String) } :+
      (("weight", -1L, bias, null: String))
    val df = metaRow.unionByName(
      rows.toSeq.toDF("component", "bucket", "w", "meta"))
    // generation from this commit's CAS, not a racy generations().last
    if (store.exists(table)) store.rewrite(table, df)
    else store.append(table, df)
  }

  /** Load the LIVE model generation: (weights, bias, cfg). */
  def loadModel(store: graft.sources.TableStore, table: String)
      : (Array[Long], Long, Config) = fromRows(store.read(table))

  /** Load a PINNED model generation (time travel) — the serving
    * reproducibility anchor.
    */
  def loadModelAt(store: graft.sources.TableStore, table: String,
                  gen: Long): (Array[Long], Long, Config) =
    fromRows(store.readAt(table, gen))

  private def fromRows(rows: DataFrame): (Array[Long], Long, Config) = {
    val meta = rows.filter(col("component") === "meta")
      .select(col("meta")).collect()
    require(meta.length == 1,
      s"Classifier model table: expected one meta row, got ${meta.length}")
    val p = AnnIndex.parseJson(meta(0).getString(0))
    val cfg = Config(dim = p("dim").toInt, iters = p("iters").toInt,
      scaleShift = p("scaleShift").toInt, salt = p("salt"))
    val weights = Array.fill(cfg.dim)(0L)
    var bias = 0L
    // dim-bounded collect, same contract as the training loop's
    rows.filter(col("component") === "weight")
      .select(col("bucket"), col("w")).collect()
      .foreach { r =>
        val b = r.getLong(0)
        if (b < 0) bias = r.getLong(1)
        else weights(b.toInt) = r.getLong(1)
      }
    (weights, bias, cfg)
  }

  /** Materialize model scores over the full corpus as TableStore table
    * `scoresTable` — the batch anchor [[refreshScores]] maintains
    * incrementally. Labels are not needed for serving; the scores
    * schema is (id, z, p, pred).
    */
  def scoreAndSave(store: graft.sources.TableStore, scoresTable: String,
                   docs: DataFrame, idCol: String, textCol: String,
                   weights: Array[Long], bias: Long,
                   cfg: Config = Config()): Long = {
    val scores = scoreDocs(docs, idCol, textCol, weights, bias, cfg)
    // generation from this commit's CAS, not a racy generations().last
    if (store.exists(scoresTable)) store.rewrite(scoresTable, scores)
    else store.append(scoresTable, scores)
  }

  /** INCREMENTAL score maintenance from a corpus change feed
    * ([[graft.sources.TableStore.changesBetween]] output) — the
    * [[AnnIndex.refreshCodes]] contract for classifier scores: deleted
    * ids leave the scores table, inserted rows are scored and
    * appended. Cost scales with the churn, never the corpus; a corpus
    * compaction feeds nothing and this is a no-op. Invariant
    * (spec-gated): after a refresh the scores table equals a full
    * [[scoreAndSave]] of the live corpus under the same model.
    */
  def refreshScores(store: graft.sources.TableStore, scoresTable: String,
                    changes: DataFrame, idCol: String, textCol: String,
                    weights: Array[Long], bias: Long,
                    cfg: Config = Config()): Unit = {
    // delete BOTH churned id sets (deletes AND inserts): updates ride
    // the feed as delete+insert pairs, and deleting insert ids too
    // makes the refresh IDEMPOTENT under at-least-once replays (a
    // crash-retry re-runs cleanly instead of duplicating score rows)
    val del = changes
      .filter(col("__change_type").isin("delete", "insert"))
      .select(col(idCol).as("id")).distinct()
    val ins = changes.filter(col("__change_type") === "insert")
    store.deleteByKeys(scoresTable, del, Seq("id"))
    store.append(scoresTable,
      scoreDocs(ins, idCol, textCol, weights, bias, cfg))
  }

  /** [[score]] straight from documents (labels not required — serving
    * path): features built with the one-exchange shape, scored, label
    * column dropped.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                weights: Array[Long], bias: Long,
                cfg: Config = Config()): DataFrame =
    score(hashedFeatures(docs, idCol, textCol, lit(0L), cfg),
      weights, bias, cfg).drop("y")

  /** Train-then-score in one call — the q122 surface. Builds and
    * PINS the feature frame (it feeds every GD round and the final
    * scoring); the pin is registered with the engine release point and
    * freed by [[releaseIntermediates]]/`Engine.releaseAll`, NOT per
    * call — repeated calls in a long-lived session should release
    * between them.
    */
  def trainAndScore(docs: DataFrame, idCol: String, textCol: String,
                    label: Column, cfg: Config = Config()): DataFrame = {
    // checkpoint, not persist: the frame is scanned 2× per iteration +
    // once for scoring, so (a) the tiny LogicalRDD plan saves Catalyst
    // re-analysis of the tokenize/hash lineage on every one of those
    // plans, and (b) the id HashPartitioning survives, keeping every
    // per-iteration aggregate and join exchange-free
    val feats = synchronized {
      val (f, rel) = Loops.truncate(
        hashedFeatures(docs, idCol, textCol, label, cfg))
      pinnedReleases += rel; f
    }
    val (w, b) = train(feats, cfg)
    score(feats, w, b, cfg)
  }
}
