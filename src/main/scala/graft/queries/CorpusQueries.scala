package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.functions.TextFunctions
import graft.operators.Dedup

/** End-to-end training-corpus preparation passes — the composition the
  * north-star operators exist for, each as one declarative plan.
  */
object CorpusQueries {

  private def normSql(c: String) =
    s"TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER($c), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))"
  private def nTokSql(c: String) = {
    val nrm = normSql(c)
    s"(CASE WHEN LENGTH($nrm) = 0 THEN CAST(0 AS BIGINT) ELSE LEN(STRING_SPLIT($nrm, ' ')) END)"
  }

  /** q35 — the classic pretraining cleaning pass: quality filter
    * (length + alpha ratio), then exact dedup (keep min doc_id per
    * fingerprint), then per-source survivor stats. Narrow filter →
    * one dedup exchange → one stats exchange.
    */
  private val q35 = Q("q35_corpus_clean",
    (s, dir) => {
      val d = t(s, dir, "documents").repartition(col("doc_id"))
        .withColumn("n_tok", TextFunctions.tokenCount(col("text")))
        .withColumn("alpha",
          length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
            length(col("text")).cast("double"))
        .filter(col("n_tok") >= 20 && col("alpha") >= 0.5)
      val survivors = Dedup.exactSurvivors(d, "doc_id", "text")
        .select(col("keep_id"))
      survivors.join(t(s, dir, "documents"),
          survivors("keep_id") === col("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    },
    Some(s"""WITH filtered AS (
        SELECT doc_id, text, source, n_chars FROM documents
        WHERE ${nTokSql("text")} >= 20
          AND (CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g'))
            AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE)) >= 0.5),
      survivors AS (
        SELECT MIN(doc_id) AS keep_id FROM filtered
        GROUP BY MD5(${normSql("text")}))
      SELECT d.source, COUNT(*) AS n_docs,
        CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
      FROM survivors s JOIN documents d ON d.doc_id = s.keep_id
      GROUP BY d.source ORDER BY d.source"""))

  /** q36 — sequence packing: assign documents to fixed-token-budget
    * packs via a running total windowed WITHIN each source shard (a
    * global ordering would serialize on one task; per-shard packing is
    * the scale form). The running sum is exact integer arithmetic; pack
    * id is a closed-form projection of it (same trick as the spatial
    * grid). One exchange (the window partition).
    */
  private val q36 = Q("q36_sequence_packing",
    (s, dir) => {
      val budget = 2048L
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .withColumn("n_tok", TextFunctions.tokenCount(col("text")))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .withColumn("pack_id",
          floor((col("cum") - col("n_tok")).cast("double") / budget)
            .cast("long"))
        .groupBy(col("source"), col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("source"), col("pack_id"))
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, source, ${nTokSql("text")} AS n_tok FROM documents),
      packed AS (
        SELECT doc_id, source, n_tok,
          SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM toks)
      SELECT source,
        CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / 2048) AS BIGINT)
          AS pack_id,
        COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        MIN(doc_id) AS first_doc
      FROM packed GROUP BY source, pack_id ORDER BY source, pack_id"""))

  /** q50 — the full curation pipeline under one oracle: Gopher quality
    * gate → exact dedup survivors → domain re-weighting → train/val/test
    * split → per-(source, split) stats. Every stage is the portable
    * operator proven alone in q42/q16/q41/q40; this gates their
    * COMPOSITION (filter→dedup→mix→split ordering matters and the
    * oracle replays it stage for stage). Plan: narrow gate, one dedup
    * exchange, narrow mix+split, one stats exchange.
    */
  private val q50 = {
    import graft.functions.QualityRules
    import graft.operators.Sampling
    val cfg = QualityRules.Config()
    val rates: Map[String, Double] =
      (0 until 20).map(n => s"src$n" -> (if (n % 2 == 0) 1.0 else 0.5)).toMap
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    Q("q50_curation_pipeline",
      (s, dir) => {
        val raw = t(s, dir, "documents")
        // repartition only the CPU-heavy gate path; the join-back scan
        // needs no redistribution (broadcast here, AQE-chosen SMJ at scale)
        val kept = raw.repartition(col("doc_id"))
          .filter(QualityRules.keep(col("text"), cfg))
        val surv = Dedup.exactSurvivors(kept, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        val enriched = surv.join(raw, Seq("doc_id"))
          .select(col("doc_id"), col("source"), col("n_chars"))
        val mixed = Sampling.mixDomains(enriched, "source", "doc_id",
          rates, salt = "cur")
        Sampling.assignSplits(mixed, "doc_id", splits, salt = "cursplit")
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"), col("split"))
      },
      Some {
        val n = TextQueries.lenTokSql("toks", "nrm")
        val keepPred =
          s"""($n BETWEEN ${cfg.minWords} AND ${cfg.maxWords}
            AND (CASE WHEN $n > 0
              THEN CAST(LENGTH(REPLACE(nrm, ' ', '')) AS DOUBLE)
                / CAST($n AS DOUBLE) ELSE 0.0 END)
              BETWEEN ${cfg.minMeanWordLen} AND ${cfg.maxMeanWordLen}
            AND (CASE WHEN $n > 0 THEN
              CAST((LENGTH(text) - LENGTH(REPLACE(text, '#', ''))) +
                (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) / 3
                AS DOUBLE) / CAST($n AS DOUBLE) ELSE 0.0 END)
              <= ${cfg.maxSymbolRatio}
            AND (CASE WHEN $n > 0 THEN CAST(LEN(LIST_FILTER(toks,
                x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
              / CAST($n AS DOUBLE) ELSE 0.0 END)
              >= ${cfg.minAlphaWordFrac}
            AND CAST(${TextQueries.markerHitsSql("toks", "en")} AS BIGINT)
              >= ${cfg.minStopwordHits})"""
        val rateCases = rates.toSeq.sortBy(_._1)
          .map { case (src, r) =>
            s"WHEN '$src' THEN ${math.round(r * Sampling.BucketSpace)}"
          }.mkString(" ")
        val bounds = splits.scanLeft(0.0)(_ + _._2).tail
          .map(c => math.round(c * Sampling.BucketSpace))
        val splitCases = splits.map(_._1).zip(bounds)
          .map { case (nm, b) => s"WHEN sb < $b THEN '$nm'" }.mkString(" ")
        s"""WITH nt AS (SELECT doc_id, text, source, n_chars,
            ${TextQueries.normSql("text")} AS nrm,
            STRING_SPLIT(${TextQueries.normSql("text")}, ' ') AS toks
          FROM documents),
        kept AS (SELECT doc_id, text, nrm FROM nt WHERE $keepPred),
        surv AS (SELECT MIN(doc_id) AS doc_id FROM kept
          GROUP BY MD5(nrm)),
        enriched AS (SELECT d.doc_id, d.source, d.n_chars,
            ${SamplingQueries.hashSql("cur", "d.doc_id")} AS hm,
            ${SamplingQueries.hashSql("cursplit", "d.doc_id")} AS hs
          FROM surv s JOIN documents d ON d.doc_id = s.doc_id),
        mixed AS (SELECT doc_id, source, n_chars,
            CAST(${SamplingQueries.bucketSql("hs")} AS BIGINT) AS sb
          FROM enriched
          WHERE CAST(${SamplingQueries.bucketSql("hm")} AS BIGINT) <
            (CASE source $rateCases ELSE 0 END))
        SELECT source, CASE $splitCases ELSE NULL END AS split,
          COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM mixed GROUP BY source, split ORDER BY source, split"""
      })
  }

  /** q56 — benchmark decontamination ([[graft.operators.Decontaminate]]):
    * corpus docs scored by distinct-3-gram overlap against a held-out
    * "benchmark" slice (doc_id ≡ 0 mod 97 — standing in for an eval
    * set, which at production scale is the tiny broadcast side). The
    * oracle replays shingling, the benchmark union, and the left-join
    * overlap count.
    */
  private val q56 = Q("q56_decontaminate",
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.overlap(
          corpus = docs.filter(col("doc_id") % 97 =!= 0),
          bench = docs.filter(col("doc_id") % 97 === 0),
          idCol = "doc_id", textCol = "text", shingleN = 3,
          flagFrac = 0.05)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH nt AS (SELECT doc_id,
        STRING_SPLIT(${normSql("text")}, ' ') AS toks FROM documents),
      sh AS (SELECT doc_id,
          UNNEST(${TextQueries.shinglesSql("toks", 3)}) AS sh FROM nt),
      bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
      corp AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
      SELECT corp.doc_id, COUNT(*) AS n_shingles,
        COUNT(bench.sh) AS n_contaminated,
        CAST(COUNT(bench.sh) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS contamination_frac,
        CAST((CAST(COUNT(bench.sh) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
          >= 0.05 AS BIGINT) AS flagged
      FROM corp LEFT JOIN bench ON corp.sh = bench.sh
      GROUP BY corp.doc_id ORDER BY corp.doc_id"""))

  val all: Seq[Q] = Seq(q35, q36, q50, q56)
}
