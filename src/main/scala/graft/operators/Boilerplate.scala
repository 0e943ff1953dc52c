package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicated-passage (boilerplate) removal — CCNet/C4-style corpus
  * cleaning at SEGMENT granularity: a passage that recurs across the
  * corpus (headers, footers, navigation chrome, license blurbs) is
  * dropped from every document that carries it, while the documents
  * themselves survive. Complements whole-document dedup
  * ([[Dedup]] — picks one survivor per duplicate CLUSTER): here the
  * unit is the repeated passage, and every document keeps its unique
  * remainder. North-star operator — the reference has no corpus
  * hygiene.
  *
  * A "segment" is `segWords` consecutive whitespace tokens (documents
  * are single-line word streams; a corpus with real line structure
  * would split on newlines instead — the df/drop/reassemble algebra is
  * identical). A segment is boilerplate when its corpus-wide OCCURRENCE
  * count reaches `minDf` — repeats within one document count too (a
  * refrain repeated inside a single doc is removed at minDf = 2), which
  * is C4's any-repeat rule, not a distinct-document frequency.
  *
  * Scale design: ONE narrow segment explode feeds (a) the occurrence
  * count — map-side partial aggregation on the segment's md5 collapses
  * every hot segment per partition before its ONE exchange — and (b)
  * the join-back. The count table is FILTERED to ≥ minDf before the join:
  * boilerplate segments are few by definition, so AQE broadcasts the
  * drop-list and the corpus is never redistributed by segment; the
  * reassembly is the one doc-keyed exchange. The explode is computed
  * once per consumer (twice total) rather than cached — recomputing a
  * narrow projection beats pinning a corpus-scale frame, the same
  * trade [[Decontaminate]] makes. Nothing quadratic, no corpus
  * self-join, no global sort.
  */
object Boilerplate {

  /** Per-document cleaned text after boilerplate-segment removal:
    * (idCol, clean_text, n_segments, n_dropped). `clean_text` is the
    * surviving segments rejoined in document order (empty string when
    * every segment was boilerplate); the counts expose the removal
    * rate for corpus QC. Rows with NULL `textCol` carry no segments
    * and are omitted — gate them upstream
    * ([[graft.functions.QualityRules]]).
    */
  def removeSegments(df: DataFrame, idCol: String, textCol: String,
                     segWords: Int = 8, minDf: Long = 2): DataFrame = {
    require(segWords > 0, s"segWords must be positive, got $segWords")
    // minDf <= 0 would put EVERY segment on the drop-list — a silent
    // corpus wipe, never a sane request
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    // repartition before the CPU-heavy narrow stage (same rationale as
    // Dedup): the upstream scan's partitioning, not the cluster, would
    // otherwise bound explode parallelism
    val segs = df.repartition(graft.Par.n, col(idCol))
      .select(col(idCol), split(col(textCol), " ").as("__w"))
      .select(col(idCol), posexplode(
        transform(
          // integral `div`, not Column `/` (double division): sequence
          // demands integer bounds and the segment count must be exact
          sequence(lit(0),
            expr(s"(size(__w) + ${segWords - 1}) div $segWords") - 1),
          i => array_join(
            slice(col("__w"), i * segWords + 1, lit(segWords)), " ")))
        .as(Seq("__idx", "__seg")))
      .withColumn("__h", md5(col("__seg")))
    val dropList = segs.groupBy(col("__h"))
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minDf)
      .select(col("__h"), lit(1).as("__hit"))
    segs.join(dropList, Seq("__h"), "left")
      .groupBy(col(idCol))
      .agg(
        // collect_list skips NULLs: only kept segments enter; the
        // struct sorts by __idx first, so document order is restored
        // without a window
        array_join(transform(array_sort(collect_list(
          when(col("__hit").isNull,
            struct(col("__idx"), col("__seg"))))),
          x => x("__seg")), " ").as("clean_text"),
        count(lit(1)).as("n_segments"),
        count(col("__hit")).as("n_dropped"))
      .select(col(idCol), col("clean_text"), col("n_segments"),
        col("n_dropped"))
  }

  /** Cross-source overlap matrix — the provenance diagnostic behind
    * "who mirrors whom": for every source pair, how many DISTINCT
    * segments they share, each source's distinct-segment total, and the
    * containment fraction `n_shared / min(n_seg_a, n_seg_b)` (one exact
    * integer division — engine-portable). Segment granularity (same
    * [[removeSegments]] `segWords` blocks) catches partial mirroring
    * that whole-document fingerprints miss; exact-fingerprint overlap
    * is near-empty on most corpora while shared passages are not.
    *
    * Scale design: two corpus-scale map-side-combined exchanges — the
    * (src, segment-hash) distinct and the per-hash source count — and
    * the (src, h) exchange is computed ONCE and reused by all three
    * consumers (ReuseExchange; spec-asserted). Everything after is
    * small by construction: segments shared by ≥ 2 sources are the
    * boilerplate tail, so the prune list BROADCASTS, the self-join runs
    * over pruned rows only, and the pair/total frames are ≤ sources².
    * `maxSources` caps the per-segment pair fan-out (a segment in k
    * sources yields k(k−1)/2 pairs): segments above the cap are global
    * chrome, dropped from the matrix rather than allowed to go
    * quadratic. Rows with NULL text carry no segments; NULL sources
    * drop out of the pair algebra — gate both upstream.
    */
  def sourceOverlapMatrix(df: DataFrame, srcCol: String, textCol: String,
                          segWords: Int = 8,
                          maxSources: Int = 64): DataFrame = {
    require(segWords > 0, s"segWords must be positive, got $segWords")
    require(maxSources >= 2, s"maxSources must be >= 2, got $maxSources")
    val segs = df
      .select(col(srcCol).as("src"), split(col(textCol), " ").as("__w"))
      .select(col("src"), explode(transform(
        sequence(lit(0),
          expr(s"(size(__w) + ${segWords - 1}) div $segWords") - 1),
        i => md5(array_join(
          slice(col("__w"), i * segWords + 1, lit(segWords)), " "))))
        .as("__h"))
      .distinct()
    val shared = segs.groupBy(col("__h")).agg(count(lit(1)).as("__ns"))
      .filter(col("__ns") >= 2 && col("__ns") <= maxSources)
      .select(col("__h"))
    val pruned = segs.join(broadcast(shared), Seq("__h"), "left_semi")
    val tot = segs.groupBy(col("src")).agg(count(lit(1)).as("n_seg"))
    val pairs = pruned.select(col("__h"), col("src").as("src_a"))
      .join(pruned.select(col("__h"), col("src").as("src_b")), Seq("__h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(tot.select(col("src").as("src_a"),
        col("n_seg").as("n_seg_a"))), Seq("src_a"))
      .join(broadcast(tot.select(col("src").as("src_b"),
        col("n_seg").as("n_seg_b"))), Seq("src_b"))
      .withColumn("overlap_frac", col("n_shared").cast("double") /
        least(col("n_seg_a"), col("n_seg_b")).cast("double"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_seg_a"), col("n_seg_b"), col("overlap_frac"))
  }

  /** Cross-document duplicated n-gram coverage — the exact-substring
    * duplication SIGNAL of Lee et al. 2021 ("Deduplicating Training
    * Data Makes Language Models Better", arXiv:2107.06499) at
    * token-window granularity: for every document, how much of it is
    * text that also occurs elsewhere in the corpus. A sliding window of
    * `n` normalized tokens (stride 1 — OVERLAPPING, unlike
    * [[removeSegments]]'s disjoint blocks; a doc shorter than `n`
    * contributes its whole text as one window) is "duplicated" when its
    * corpus-wide occurrence count reaches `minDf` — same-document
    * repeats count, C4's any-repeat rule. Outputs are exact integers
    * per document: `n_tokens`, `n_grams` (windows), `n_dup_grams`
    * (duplicated windows) and `covered_tokens` (tokens under the UNION
    * of duplicated windows — the paper's "fraction that is duplicated
    * text" numerator; divide by `n_tokens` downstream). Complements
    * whole-doc dedup (q16/q18: pick survivors) and [[removeSegments]]
    * (drop repeated blocks): this SCORES partial duplication so a
    * curation pass can threshold on it.
    *
    * Scale design (the [[removeSegments]] trade, window-granular): ONE
    * narrow tokenize+window explode feeds both the occurrence count —
    * map-side partial agg on the window md5, one exchange — and the
    * join-back; the ≥ minDf window set is the duplication tail, so AQE
    * broadcasts it and the corpus is never redistributed by window
    * (SMJ if a pathological corpus makes the tail huge — correct
    * either way). The union-of-windows count explodes ONLY duplicated
    * windows (≤ n rows each) into one doc-keyed distinct aggregate;
    * clean corpora pay ~nothing. Rows with NULL `textCol` carry no
    * windows and are omitted — gate upstream.
    */
  def dupNgramCoverage(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 8, minDf: Long = 2): DataFrame = {
    import graft.functions.TextFunctions
    require(n >= 1, s"n must be positive, got $n")
    // minDf <= 1 would mark EVERY window duplicated — never sane
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val base = df.filter(col(textCol).isNotNull).repartition(graft.Par.n, col(idCol))
    // narrow, recomputed per consumer rather than pinning a
    // corpus-scale frame (the removeSegments/Decontaminate trade)
    def gramRel = base
      .select(col(idCol).as("id"),
        posexplode(TextFunctions.shingles(col(textCol), n))
          .as(Seq("pos", "g")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        md5(col("g")).as("gh"))
    val dupSet = gramRel.groupBy(col("gh"))
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minDf)
      .select(col("gh"))
    // duplicated window positions; tp = covered token index. Both
    // distincts ride ONE doc-keyed aggregate (Expand, two passes over
    // the already-pruned dup rows only).
    val perDup = gramRel.join(dupSet, Seq("gh"))
      .select(col("id"), col("pos"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tp"))
      .groupBy(col("id"))
      .agg(countDistinct(col("pos")).as("n_dup_grams"),
        countDistinct(col("tp")).as("covered_raw"))
    val perDoc = base
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__toks"),
        TextFunctions.normalizeText(col(textCol)).as("__nrm"),
        TextFunctions.shingles(col(textCol), n).as("__sh"))
      .select(col("id"),
        TextFunctions.tokenCountOf(col("__toks"), col("__nrm"))
          .cast("long").as("n_tokens"),
        size(col("__sh")).cast("long").as("n_grams"))
    perDoc.join(perDup, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        // a shorter-than-n doc's single window nominally spans n token
        // slots; its real extent is the whole doc — cap restores it
        least(coalesce(col("covered_raw"), lit(0L)), col("n_tokens"))
          .as("covered_tokens"))
  }

  /** Duplicated-span REMOVAL — the Lee et al. 2021 ExactSubstr dedup
    * proper (keep ONE copy of every duplicated passage, delete the
    * rest), where [[dupNgramCoverage]] only scores: for each
    * duplicated `n`-token window (corpus occurrence ≥ `minDf`), the
    * occurrence with the smallest (doc id, position) is the KEEPER;
    * every other occurrence's token range is dropped, and each
    * document's surviving tokens are rejoined in order. Deterministic
    * and partitioning-invariant (the keeper rule is a total order), at
    * the price of greedy union semantics: overlapping windows' removal
    * ranges union, and a keeper's own text can still lose tokens to a
    * DIFFERENT window's removal — documented, matches the paper's
    * "remove all but one copy" contract at window granularity.
    *
    * Scale shape: the window/df stages are [[dupNgramCoverage]]'s; the
    * keeper rank is a window over `gh` partitions of the DUPLICATED
    * tail only (bounded by definition — clean corpora pay ~nothing);
    * reassembly is ONE token explode + doc-keyed collect (the
    * [[removeSegments]] reassembly shape, token-granular). Rows with
    * NULL `textCol` are omitted; a fully-duplicated document survives
    * as an empty `clean_text` row (drop downstream if wanted).
    *
    * Returns (id, clean_text, n_tokens, n_removed_tokens).
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 8, minDf: Long = 2): DataFrame = {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"n must be positive, got $n")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val base = df.filter(col(textCol).isNotNull).repartition(graft.Par.n, col(idCol))
    def gramRel = base
      .select(col(idCol).as("id"),
        posexplode(TextFunctions.shingles(col(textCol), n))
          .as(Seq("pos", "g")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        md5(col("g")).as("gh"))
    val dupSet = gramRel.groupBy(col("gh"))
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minDf)
      .select(col("gh"))
    // rank over the duplicated tail only; rn 1 = the keeper occurrence
    val w = Window.partitionBy(col("gh")).orderBy(col("id"), col("pos"))
    val removedTok = gramRel.join(dupSet, Seq("gh"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > 1)
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tp"))
      .distinct()
    val perDoc = base
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("__toks"),
        TextFunctions.normalizeText(col(textCol)).as("__nrm"))
      .select(col("id"), col("__toks"),
        TextFunctions.tokenCountOf(col("__toks"), col("__nrm"))
          .cast("long").as("n_tokens"))
    val toks = perDoc.filter(col("n_tokens") > 0)
      .select(col("id"), posexplode(col("__toks")).as(Seq("tp", "tok")))
      .select(col("id"), col("tp").cast("long").as("tp"), col("tok"))
    val rebuilt = toks.join(removedTok, Seq("id", "tp"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(array_sort(collect_list(
          struct(col("tp"), col("tok")))), x => x("tok")), " ")
          .as("__clean"),
        count(lit(1)).as("__kept"))
    perDoc.select(col("id"), col("n_tokens"))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__clean"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0L)))
          .as("n_removed_tokens"))
  }
}
