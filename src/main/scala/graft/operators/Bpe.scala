package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding merge training (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * learn a tokenizer's merge list from the corpus. North-star
  * operator: the canonical first step of building an LLM training
  * stack over a new corpus.
  *
  * The published algorithm, re-expressed for Spark's execution model:
  *  - ONE corpus pass builds the word-frequency relation (word, cnt)
  *    — after that, every iteration runs on the VOCABULARY relation
  *    only (≪ corpus; the standard trick — pair statistics weight each
  *    word's internal pairs by its corpus count, so the corpus is
  *    never rescanned).
  *  - each of `numMerges` rounds: adjacent-symbol pair counts (narrow
  *    explode over the vocab, map-side-combined, pair-vocabulary-sized
  *    exchange) → the argmax pair (count desc, then lexicographic
  *    (left, right) — a TOTAL order, so ties are deterministic) as ONE
  *    collected row → a greedy left-to-right merge fold rewrites each
  *    word's symbol array (narrow projection).
  *  - per-round lineage truncation: the rewritten vocab persists and
  *    the predecessor releases (the PageRank/CC round pattern) so
  *    round i's plan does not re-execute rounds 1..i−1; pins are owned
  *    ([[releaseIntermediates]]).
  *
  * Everything is exact-integer / string algebra — no floats anywhere,
  * so results are deterministic on any partitioning, cluster size, or
  * engine. Symbols start as single characters plus the standard `</w>`
  * end-of-word marker (angle brackets cannot occur in normalized
  * tokens, so the marker never collides).
  *
  * Returns the merge table (step, left, right, pair_count), step
  * 1-based in learn order — the artifact a BPE tokenizer loads.
  */
object Bpe {

  /** End-of-word marker symbol (normalized tokens are [a-z0-9] only —
    * no collision). */
  val EndOfWord = "</w>"

  private val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private def track(df: DataFrame): DataFrame = synchronized {
    pinned += df; df
  }
  // one-line enrollment in the engine-wide release point
  graft.Engine.register("Bpe")(() => releaseIntermediates())

  /** Unpersist every vocab round frame the trainer has pinned. */
  def releaseIntermediates(): Unit = synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }

  /** Greedy left-to-right merge of adjacent (l, r) symbol pairs in one
    * array: fold that either merges the element into the accumulator's
    * tail or appends it. "a a a" under (a,a) → [aa, a] — the scan
    * resumes AFTER a merge (the merged tail is `l+r`, which matches
    * `l` again only if the pair is idempotent-concatenative, which
    * nonempty l/r preclude... unless l = l+r, impossible).
    */
  private[operators] def mergeFold(syms: Column, l: String,
                                   r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Character array of a word (Spark split on "" keeps a trailing
    * zero-width match under its -1 limit — filter it). */
  private def chars(w: Column): Column =
    filter(split(w, ""), s => length(s) > 0)

  /** The word-frequency relation with initial character symbols:
    * (w, cnt, syms). One corpus pass — NULL texts explode to no rows
    * and an empty/punct-only text's lone `""` token drops on the
    * exploded word, so no pre-filter (which would cost a second full
    * normalization of every document) is needed.
    */
  private def initVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        concat(chars(col("w")), array(lit(EndOfWord))).as("syms"))

  /** Adjacent-pair weighted counts of a vocab relation → (l, r, c). */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        i => struct(element_at(col("syms"), i + 1).as("l"),
          element_at(col("syms"), i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))

  /** Learn `numMerges` merges. Stops early (fewer rows) if the corpus
    * runs out of mergeable pairs. */
  def trainMerges(df: DataFrame, textCol: String,
                  numMerges: Int): DataFrame = {
    require(numMerges >= 1 && numMerges <= 4096,
      s"numMerges in [1, 4096], got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = track(initVocab(df, textCol).persist())
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    try {
      var step = 1
      var exhausted = false
      while (step <= numMerges && !exhausted) {
        // argmax pair: ONE bounded driver row; total order (c desc,
        // l, r) makes every tie deterministic
        val best = pairCounts(vocab)
          .orderBy(col("c").desc, col("l"), col("r")).limit(1)
          .as[(String, String, Long)].collect()
        if (best.isEmpty) exhausted = true
        else {
          val (l, r, c) = best(0)
          merges += ((step.toLong, l, r, c))
          val next = track(vocab
            .withColumn("syms", mergeFold(col("syms"), l, r))
            .persist())
          next.count() // materialize before releasing the predecessor
          vocab.unpersist(blocking = false)
          synchronized { pinned.filterInPlace(_ ne vocab) }
          vocab = next
          step += 1
        }
      }
      merges.toSeq.toDF("step", "left", "right", "pair_count")
    } finally {
      vocab.unpersist(blocking = false)
      synchronized { pinned.filterInPlace(_ ne vocab) }
    }
  }

  /** Segment a text column with a learned merge list: every token's
    * character symbols replay the merges IN ORDER (the standard BPE
    * apply rule — training-order replay, not greedy longest-match).
    * `merges` is the collected (left, right) list, driver-side (merge
    * tables are small artifacts by construction). Returns the input
    * plus `bpe_tokens` (array of subword symbols, `</w>`-terminated
    * per word) — one narrow projection, zero exchanges, inside
    * WholeStageCodegen via the native
    * [[graft.plans.BpeSegmentExpr]] kernel (the HOF composition,
    * [[segmentHof]], is CodegenFallback-interpreted and was ~6× the
    * cost of the training loop at sf0.1).
    */
  def segment(df: DataFrame, textCol: String,
              merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall { case (l, r) =>
      !l.contains(' ') && !l.contains('\n') &&
        !r.contains(' ') && !r.contains('\n') },
      "merge symbols must be space/newline-free")
    df.withColumn("bpe_tokens",
      call_function("graft_bpe_segment", col(textCol),
        lit(merges.map { case (l, r) => s"$l $r" }.mkString("\n"))))
  }

  /** [[segment]] as the pure Column-HOF composition — the
    * differential-spec twin that pins the native kernel's algebra. */
  def segmentHof(df: DataFrame, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val perWord = merges.foldLeft(
      (w: Column) => concat(chars(w), array(lit(EndOfWord)))
    ) { (f, m) => (w: Column) => mergeFold(f(w), m._1, m._2) }
    df.withColumn("bpe_tokens",
      flatten(transform(TextFunctions.tokens(col(textCol)),
        w => perWord(w))))
  }
}
