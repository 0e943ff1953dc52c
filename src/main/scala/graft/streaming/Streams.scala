package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingestion (SURVEY.md §2.10: the reference is
  * batch-only; its incremental patterns — process-only-new flags,
  * lookback windows — map onto file streams + `Trigger.AvailableNow`
  * micro-batch reprocessing, which is the scale-correct form of "run the
  * DAG daily over whatever arrived").
  *
  * All state (dedup keys, window aggregates) lives in the checkpoint;
  * re-running with AvailableNow resumes incrementally — exactly the
  * reference's vectorized/summarized flag semantics without the flags.
  */
object Streams {

  /** File-backed JSONL stream with a declared schema (never inferred). */
  def jsonStream(spark: SparkSession, schema: StructType,
                 dir: String): DataFrame =
    spark.readStream.schema(schema).json(dir)

  /** Event-time windowed counts+sums with a watermark bounding state
    * (late rows beyond `watermark` are dropped — at 100 TB unbounded
    * state is the failure mode this prevents).
    */
  def windowedEventCounts(events: DataFrame, tsCol: String,
                          keyCol: String, window: String,
                          watermark: String,
                          valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(functionsWindow(col(tsCol), window), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col(keyCol), col("n"), col("sum_value"))

  private def functionsWindow(c: org.apache.spark.sql.Column, w: String) =
    org.apache.spark.sql.functions.window(c, w)

  /** Event-time session windows (gap-based, the streaming twin of
    * `operators.Sessionize`): a session closes once the watermark passes
    * its last event + gap, so state stays bounded. Uses Spark's native
    * `session_window` — dynamic-gap merging handled by the engine, no
    * custom `flatMapGroupsWithState` needed.
    */
  def sessionStats(events: DataFrame, tsCol: String, keyCol: String,
                   gap: String, watermark: String,
                   valueCol: String = "value"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Streaming exact dedup on key columns with watermark-bounded state
    * (the streaming form of the K2 upsert / O4 dedup): first row per key
    * wins; state for a key is purged once the watermark passes it.
    */
  def dedupStream(df: DataFrame, tsCol: String, watermark: String,
                  keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming corpus ingest — the batch curation gate applied to a
    * document stream: quality-rule filter (a narrow Column predicate,
    * so it streams unchanged), then watermark-bounded exact dedup on
    * the normalized-text fingerprint (first arrival wins, state purged
    * past the watermark). The aggregation-based stages (repetition
    * measures, decontamination) stay batch: they need chained
    * aggregations that append-mode streams do not support — run them in
    * the AvailableNow micro-batch pass over the drained output instead.
    */
  def corpusIngest(docs: DataFrame, tsCol: String, watermark: String,
                   textCol: String,
                   cfg: graft.functions.QualityRules.Config =
                     graft.functions.QualityRules.Config()): DataFrame = {
    import graft.functions.QualityRules
    QualityRules.gate(docs, textCol, cfg, keepNorm = true)
      .withColumn("fp", md5(col("__nrm")))
      .drop("__nrm")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
  }

  /** Streaming form of [[graft.operators.Dedup.newAgainstCorpus]]: a
    * document stream screened against a STATIC standing corpus — rows
    * whose content fingerprint already exists in the corpus are
    * dropped in flight. The corpus bloom is folded ONCE at plan-build
    * time (a batch aggregate over the static side) and baked into the
    * streaming plan as a literal, so every micro-batch pays only:
    *  - a narrow `might_contain` filter (no state, no join) for the
    *    definitely-new majority, and
    *  - a stream-static LEFT ANTI join — restricted to bloom-positive
    *    rows (true dups + ~fpp) — for exact confirmation.
    * The static side re-reads per micro-batch (Structured Streaming's
    * stream-static contract); the bloom keeps that join's stream side
    * tiny. Intra-stream dups are NOT collapsed here — chain
    * [[dedupStream]]/[[corpusIngest]] for that.
    */
  def screenAgainstCorpus(stream: DataFrame, corpus: DataFrame,
                          textCol: String,
                          estItems: Long = 1000000L): DataFrame = {
    import graft.functions.TextFunctions
    val fp = TextFunctions.fingerprint(col(textCol))
    // ONE bloom-screen construction, shared with the batch twin
    // (Dedup.newAgainstCorpus) so the two specified-identical screens
    // cannot drift
    graft.operators.Dedup.corpusBloomScreen(corpus, textCol,
        estItems) match {
      case None => stream // empty corpus: all rows new
      case Some(mightContain) =>
        val corpusFps = corpus.select(fp.as("__fp")).distinct()
        val confirmedNew = stream.filter(mightContain)
          .join(corpusFps, fp === col("__fp"), "left_anti")
        stream.filter(!mightContain).unionByName(confirmedNew)
    }
  }

  /** Streaming weighted reservoir — the A-ES stream form of
    * [[graft.operators.Sampling.weightedTopK]]: maintain, per stratum,
    * the k rows with the largest content-addressed exponential keys
    * (`⌊10⁶·ln(u)/w⌋`, [[graft.operators.Sampling.wrsKey]]) seen so
    * far. Because the key depends only on (salt, id, weight) — never
    * on arrival order or batch boundaries — the reservoir CONVERGES TO
    * THE BATCH SAMPLE of everything ingested, whatever the split into
    * micro-batches (spec-proven against `weightedTopK` on the union).
    *
    * State is bounded: k (wkey, id) pairs per stratum, nothing else;
    * re-delivered ids collapse (same id → same key). Each micro-batch
    * the touched strata emit a full SNAPSHOT of their current
    * reservoir tagged with a per-stratum version (`ver` increments per
    * emission) — append-sink-friendly (parquet cannot update in
    * place); readers take each stratum's max-`ver` rows. Typed
    * contract: long ids, string strata, positive weights (NULL /
    * non-positive raise, the batch guard).
    *
    * Returns (stratum, id, wkey, rk, ver).
    */
  def weightedReservoir(df: DataFrame, keyCol: String, weightCol: String,
                        strataCol: String, k: Int,
                        salt: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
        col(strataCol).cast("string").as("stratum"),
        col(keyCol).cast("long").as("id"),
        graft.operators.Sampling
          .wrsKey(col(keyCol), col(weightCol), salt).as("wkey"))
      .as[(String, Long, Long)]
    def merge(stratum: String, rows: Iterator[(String, Long, Long)],
              state: GroupState[(Long, Seq[(Long, Long)])])
        : Iterator[(String, Long, Long, Long, Long)] = {
      val (prevVer, prev) = state.getOption.getOrElse((0L, Seq.empty))
      // dedupe by ID (not by (wkey, id) pair): an id re-delivered
      // with a CHANGED weight must collapse to ONE entry — keep the
      // max key, which is arrival-order-independent. Sort with an
      // explicit descending Ordering: negating the key overflows at
      // Long.MinValue (extreme small weights saturate wrsKey there),
      // which would rank the WORST key first.
      val top = (prev.iterator ++ rows.map(r => (r._3, r._2)))
        .toSeq.groupBy { case (_, id) => id }
        .iterator.map { case (id, es) => (es.map(_._1).max, id) }
        .toSeq
        .sortBy { case (wk, id) => (wk, id) }(
          Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long))
        .take(k)
      val ver = prevVer + 1
      state.update((ver, top))
      top.iterator.zipWithIndex.map { case ((wk, id), i) =>
        (stratum, id, wk, i + 1L, ver)
      }
    }
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(merge)
      .toDF("stratum", "id", "wkey", "rk", "ver")
  }

  /** Streaming conversion-funnel maintenance — the online form of
    * [[graft.operators.Funnel.completions]]: greedy-earliest funnel
    * matching IS an online scan (maintain the next-needed step per
    * user, bind the first qualifying event), so per-user state is
    * O(1) — (steps completed, last binding (t, id), first-step t) —
    * and each micro-batch emits the steps it completes, schema-equal
    * to the batch operator. Rows are applied in (t, id) event order
    * WITHIN each batch; the stream equals the batch computation
    * exactly when ingestion is event-ordered across batches
    * (spec-proven), and degrades MONOTONE-CONSERVATIVELY under
    * disorder: a late event can only miss a conversion, never
    * fabricate one or bind out of order. Emits
    * (userCol, step, event_type, t, id) per completion; state rides
    * the checkpoint across AvailableNow runs.
    */
  def funnelMaintain(df: DataFrame, userCol: String, tsMicrosCol: String,
                     idCol: String, typeCol: String, steps: Seq[String],
                     maxSpanMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    maxSpanMicros.foreach(s =>
      require(s > 0, s"maxSpanMicros must be positive, got $s"))
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(userCol).cast("long"),
        col(typeCol).cast("string"), col(tsMicrosCol).cast("long"),
        col(idCol).cast("long"))
      .as[(Long, String, Long, Long)]
    def advance(u: Long, rows: Iterator[(Long, String, Long, Long)],
                state: GroupState[(Int, Long, Long, Long)])
        : Iterator[(Long, Long, String, Long, Long)] = {
      var (s, lastT, lastId, t0) =
        state.getOption.getOrElse((0, Long.MinValue, Long.MinValue, 0L))
      val out =
        scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, String, Long, Long)]
      rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, ty, t, id)
          =>
        val after = t > lastT || (t == lastT && id > lastId)
        val inSpan = s == 0 || maxSpanMicros.forall(t - t0 <= _)
        if (s < steps.length && ty == steps(s) && after && inSpan) {
          if (s == 0) t0 = t
          s += 1; lastT = t; lastId = id
          out += ((u, s.toLong, steps(s - 1), t, id))
        }
      }
      state.update((s, lastT, lastId, t0))
      out.iterator
    }
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(advance)
      .toDF(userCol, "step", "event_type", "t", "id")
  }

  /** Streaming transition-matrix maintenance — the online form of
    * [[graft.operators.Funnel.transitionMatrix]]: O(1) per-user state
    * (the last event's type, t, id) bridges micro-batch boundaries,
    * so a user's first event of batch k pairs with their last event
    * of batch k−1 exactly as the batch window would. Emits (prev_type,
    * next_type, n) pair-count INCREMENTS per batch (append-sink rows;
    * readers SUM n by cell) — under event-ordered ingestion per user
    * the summed cells equal the batch operator's counts for the union
    * of all batches, whatever the split (spec-pinned). Out-of-order
    * arrivals degrade conservatively like [[funnelMaintain]]: a late
    * event is paired after the state's frontier, never re-orders
    * already-emitted pairs.
    */
  def transitionMaintain(df: DataFrame, userCol: String,
                         tsMicrosCol: String, idCol: String,
                         typeCol: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(userCol).cast("long"),
        col(typeCol).cast("string"), col(tsMicrosCol).cast("long"),
        col(idCol).cast("long"))
      .as[(Long, String, Long, Long)]
    def advance(u: Long, rows: Iterator[(Long, String, Long, Long)],
                state: GroupState[(String, Long, Long)])
        : Iterator[(String, String, Long)] = {
      var prev = state.getOption
      val counts =
        scala.collection.mutable.Map.empty[(String, String), Long]
      rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, ty, t, id) =>
        prev.foreach { case (pty, _, _) =>
          val k = (pty, ty)
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
        prev = Some((ty, t, id))
      }
      prev.foreach(state.update)
      counts.iterator.map { case ((p, n), c) => (p, n, c) }
    }
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(advance)
      .toDF("prev_type", "next_type", "n")
  }

  /** Streaming rapid-repeat monitor — the stream form of
    * [[graft.operators.Funnel.rapidRepeats]]: each user's LAST SEEN
    * timestamp PER EVENT TYPE rides the group state, so a double-fire
    * straddling a micro-batch boundary is still caught; each batch
    * emits ADDITIVE (event_type, n, n_rapid) increments, so the
    * summed output converges to the batch screen of everything
    * ingested regardless of the split (spec-proven differential, the
    * [[transitionMaintain]] convention; splits are time-ordered per
    * user — the shared contract of every twin here). State: ≤ |types|
    * longs per user.
    */
  def rapidRepeatMaintain(df: DataFrame, userCol: String,
                          tsMicrosCol: String, idCol: String,
                          typeCol: String,
                          withinMicros: Long): DataFrame = {
    require(withinMicros >= 1, s"withinMicros >= 1, got $withinMicros")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(userCol).cast("long"),
        col(typeCol).cast("string"), col(tsMicrosCol).cast("long"),
        col(idCol).cast("long"))
      .as[(Long, String, Long, Long)]
    def advance(u: Long, rows: Iterator[(Long, String, Long, Long)],
                state: GroupState[Map[String, Long]])
        : Iterator[(String, Long, Long)] = {
      var last = state.getOption.getOrElse(Map.empty[String, Long])
      val acc =
        scala.collection.mutable.Map.empty[String, (Long, Long)]
      rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, ty, t, _) =>
        val (e, r) = acc.getOrElse(ty, (0L, 0L))
        val rapid = last.get(ty).exists(lt => t - lt <= withinMicros)
        acc(ty) = (e + 1L, r + (if (rapid) 1L else 0L))
        last = last.updated(ty, t)
      }
      state.update(last)
      acc.iterator.map { case (ty, (e, r)) => (ty, e, r) }
    }
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(advance)
      .toDF("event_type", "n", "n_rapid")
  }

  /** Streaming expectations accounting — the stream form of
    * [[graft.operators.Expectations.accountingBy]] (the 3am
    * data-quality trend monitor): rule predicates are pure per-row
    * classifications, so every micro-batch emits ADDITIVE
    * (group, rule, n_rows) increments — per declared rule plus the
    * `__total` / `__admitted` synthetics — and the summed output
    * converges to the batch accounting of everything ingested
    * regardless of the split (spec-proven differential, the
    * [[transitionMaintain]] convention; the batch twin's wide
    * one-column-per-rule frame is this long frame pivoted). No
    * cross-batch state is needed; the unused GroupState slot is the
    * price of an Append-mode per-group rollup.
    *
    * The group column keeps its INPUT type: the typed groupByKey
    * internally keys on the string form (injective for the atomic
    * types), but the output re-casts the group column back, so joins
    * and differential comparisons against the batch twin need no
    * hidden cast.
    */
  def accountingByMaintain(df: DataFrame, groupCol: String,
      rules: Seq[graft.operators.Expectations.Rule]): DataFrame = {
    val groupType = df.schema(groupCol).dataType
    require(rules.nonEmpty, "at least one expectation rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"rule names must be distinct, got ${rules.map(_.name)}")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val names = rules.map(_.name)
    val keyed = df.select(col(groupCol).cast("string"),
        array(rules.map(r =>
          (!coalesce(r.cond, lit(false))).cast("long")): _*))
      .as[(String, Seq[Long])]
    def roll(g: String, rows: Iterator[(String, Seq[Long])],
             state: GroupState[Long]): Iterator[(String, String, Long)] = {
      var n = 0L
      var admitted = 0L
      val viol = Array.fill(names.size)(0L)
      rows.foreach { case (_, flags) =>
        n += 1L
        var any = false
        var i = 0
        while (i < viol.length) {
          viol(i) += flags(i)
          if (flags(i) != 0L) any = true
          i += 1
        }
        if (!any) admitted += 1L
      }
      (names.indices.map(i => (g, names(i), viol(i))) ++
        Seq((g, "__admitted", admitted), (g, "__total", n))).iterator
    }
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(roll)
      .toDF(groupCol, "rule", "n_rows")
      .withColumn(groupCol, col(groupCol).cast(groupType))
  }

  /** Streaming SRM observation counter — the stream form of
    * [[graft.operators.Sampling.srmCheck]]: split assignment is the
    * same narrow deterministic md5-bucket projection
    * ([[graft.operators.Sampling.assignSplits]]), so each micro-batch
    * emits ADDITIVE (split, n_obs) increments; the χ² report divides
    * by the grand total and is NOT additive, so the finisher
    * [[graft.operators.Sampling.srmFromCounts]] runs over the SUMMED
    * increments and reproduces the batch report exactly (spec-proven
    * differential). Unassigned rows count under `[HOLDOUT]`, matching
    * the batch twin.
    */
  def srmMaintain(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  salt: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val assigned = graft.operators.Sampling
      .assignSplits(df, keyCol, splits, salt)
      .select(coalesce(col("split"), lit("[HOLDOUT]")).as("split"))
      .as[String]
    def bump(split: String, rows: Iterator[String],
             state: GroupState[Long]): Iterator[(String, Long)] =
      Iterator.single((split, rows.size.toLong))
    assigned.groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(bump)
      .toDF("split", "n_obs")
  }

  /** Streaming bucket counter — the stream form of
    * [[graft.operators.Timeseries.dailyCountsFilled]]: each
    * micro-batch emits ADDITIVE (day, n) increments per touched
    * bucket; the spine fill (which needs the global [min, max]) runs
    * as the batch finisher
    * [[graft.operators.Timeseries.dailyCountsFilledFromCounts]] over
    * the summed increments and reproduces the batch report exactly
    * (spec-proven differential, the [[srmMaintain]] convention).
    */
  def bucketCountsMaintain(df: DataFrame, tsMicrosCol: String,
      bucketMicros: Long = 86400000000L): DataFrame = {
    require(bucketMicros > 0,
      s"bucketMicros must be positive, got $bucketMicros")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
        expr(s"CAST($tsMicrosCol AS BIGINT) div $bucketMicros")
          .as("day")).as[Long]
    def bump(day: Long, rows: Iterator[Long],
             state: GroupState[Long]): Iterator[(Long, Long)] =
      Iterator.single((day, rows.size.toLong))
    keyed.groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(bump)
      .toDF("day", "n")
  }

  /** Streaming count-min sketch maintenance — the stream form of
    * [[graft.operators.Sketches.cmsBuild]]: per-cell running counters
    * in `flatMapGroupsWithState` keyed by (row, bucket). CMS cells are
    * additive and the md5 buckets are content-addressed, so the
    * maintained sketch CONVERGES TO THE BATCH SKETCH of everything
    * ingested regardless of the micro-batch split (spec-proven against
    * `cmsBuild` on the union) — the same mergeability argument that
    * bounds the batch build's exchange bounds the stream's state:
    * ≤ depth·width cells total, one long each. Touched cells emit
    * versioned snapshots per batch (append-sink-friendly, the
    * [[weightedReservoir]] convention); readers take each cell's
    * max-`ver` row. Returns (row, bucket, c, ver).
    */
  def cmsMaintain(df: DataFrame, keyCol: String, depth: Int, width: Int,
                  salt: String): DataFrame = {
    // same loud parameter envelope as the batch twin — a width of 0
    // would otherwise surface as a mid-stream null-bucket crash after
    // the checkpoint exists, and depth 0 as a silently empty sketch
    require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
    require(width >= 2, s"width >= 2, got $width")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df
      .select(explode(graft.operators.Sketches
        .cmsCells(col(keyCol), depth, width, salt)).as("rb"))
      .select(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .as[(Int, Long)]
    // map-side partial counts BEFORE the stateful exchange — the
    // batch build's map-side combine, hand-rolled because a streaming
    // aggregation cannot precede flatMapGroupsWithState but a
    // stateless mapPartitions can: each partition ships ≤ depth·width
    // (cell, n) rows per micro-batch instead of one row per occurrence
    val partials = cells.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
      it.foreach(c => m.update(c, m.getOrElse(c, 0L) + 1L))
      m.iterator.map { case (cell, n) => (cell._1, cell._2, n) }
    }
    def bump(cell: (Int, Long), rows: Iterator[(Int, Long, Long)],
             state: GroupState[(Long, Long)])
        : Iterator[(Int, Long, Long, Long)] = {
      val (prevVer, prevC) = state.getOption.getOrElse((0L, 0L))
      val c = prevC + rows.map(_._3).sum
      val ver = prevVer + 1
      state.update((ver, c))
      Iterator.single((cell._1, cell._2, c, ver))
    }
    partials.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(bump)
      .toDF("row", "bucket", "c", "ver")
  }

  /** Streaming HyperLogLog maintenance — the stream form of
    * [[graft.operators.Sketches.hllRegisters]]: per-register running
    * max-rho in `flatMapGroupsWithState` keyed by bucket. Registers
    * merge by MAX and the (bucket, rho) pair is content-addressed
    * (same md5 convention as the batch form, shared via
    * `hllBucketRho`), so the maintained registers CONVERGE TO THE
    * BATCH SKETCH of everything ingested regardless of the
    * micro-batch split — re-delivered keys are absorbed free (max is
    * idempotent), making the sketch exactly-once-insensitive. State:
    * ≤ 2^p longs total. A stateless per-partition max BEFORE the
    * stateful exchange ships ≤ 2^p (bucket, rho) rows per partition
    * per micro-batch (the batch form's map-side combine, hand-rolled
    * as in [[cmsMaintain]]). Touched registers emit versioned
    * snapshots (append-sink convention); readers take max-`ver` per
    * bucket and feed [[graft.operators.Sketches.hllEstimate]].
    * Returns (bucket, m, ver).
    */
  def hllMaintain(df: DataFrame, keyCol: String, p: Int,
                  salt: String): DataFrame = {
    require(p >= 4 && p <= 14, s"HLL p in [4,14], got $p")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val (bucket, rho) = graft.operators.Sketches
      .hllBucketRho(col(keyCol), p, salt)
    val regs = df.select(bucket.as("bucket"), rho.as("rho"))
      .as[(Long, Long)]
    val partials = regs.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[Long, Long]
      it.foreach { case (b, r) =>
        if (r > m.getOrElse(b, 0L)) m.update(b, r)
      }
      m.iterator
    }
    def bump(b: Long, rows: Iterator[(Long, Long)],
             state: GroupState[(Long, Long)])
        : Iterator[(Long, Long, Long)] = {
      val (prevVer, prevM) = state.getOption.getOrElse((0L, 0L))
      val m = math.max(prevM, rows.map(_._2).max)
      val ver = prevVer + 1
      state.update((ver, m))
      Iterator.single((b, m, ver))
    }
    partials.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(bump)
      .toDF("bucket", "m", "ver")
  }

  /** Streaming maintenance of the bottom-k uniform-sample QUANTILE
    * sketch ([[graft.operators.Sketches.bottomKSample]]): per group,
    * keep the k rows whose key hashes smallest across all micro-
    * batches — converges EXACTLY to the batch sketch of the union
    * under any batch split (bottom-k is a semilattice merge, like
    * [[hllMaintain]]'s register max). Re-delivered (key, value) rows
    * are absorbed free (set semantics on the hash-keyed state); a key
    * re-arriving with a CHANGED value keeps the max value —
    * deterministic regardless of delivery order. State: ≤ k
    * (hash, key, value) triples per group. A stateless per-partition
    * bottom-k BEFORE the stateful exchange ships ≤ k rows per
    * partition per group per micro-batch (the batch form's
    * WindowGroupLimit, hand-rolled). Snapshots are versioned
    * (append-sink convention): readers take max-`ver` per group and
    * feed [[graft.operators.Sketches.quantilesOfSample]] (rename
    * key/v to __key/__val, h to __h).
    * Returns (grp, h, key, v, ver).
    */
  def bottomKMaintain(df: DataFrame, groupCol: String, keyCol: String,
                      valueCol: String, k: Int,
                      salt: String = "bkq"): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val ord = Ordering.Tuple2[Long, Long]
    val rows = df.select(col(groupCol).cast("string").as("grp"),
        graft.operators.Sketches.hash60(col(keyCol), salt).as("h"),
        col(keyCol).cast("long").as("key"),
        col(valueCol).cast("long").as("v"))
      .as[(String, Long, Long, Long)]
    val partials = rows.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.TreeMap[(Long, Long), Long]]
      it.foreach { case (g, h, key, v) =>
        val t = m.getOrElseUpdate(g,
          scala.collection.mutable.TreeMap.empty(ord))
        val hk = (h, key)
        t.get(hk) match {
          case Some(pv) => if (v > pv) t.update(hk, v)
          case None =>
            if (t.size < k) t.update(hk, v)
            else if (ord.lt(hk, t.lastKey)) {
              t.remove(t.lastKey); t.update(hk, v)
            }
        }
      }
      m.iterator.flatMap { case (g, t) =>
        t.iterator.map { case ((h, key), v) => (g, h, key, v) } }
    }
    def merge(g: String, it: Iterator[(String, Long, Long, Long)],
              state: GroupState[(Long, Seq[(Long, Long, Long)])])
        : Iterator[(String, Long, Long, Long, Long)] = {
      val (prevVer, prev) =
        state.getOption.getOrElse((0L, Seq.empty[(Long, Long, Long)]))
      val t = scala.collection.mutable.TreeMap.empty[(Long, Long), Long](ord)
      prev.foreach { case (h, key, v) => t.update((h, key), v) }
      it.foreach { case (_, h, key, v) =>
        val hk = (h, key)
        t.get(hk) match {
          case Some(pv) => if (v > pv) t.update(hk, v)
          case None     => t.update(hk, v)
        }
      }
      while (t.size > k) t.remove(t.lastKey)
      val ver = prevVer + 1
      val snap = t.iterator
        .map { case ((h, key), v) => (h, key, v) }.toSeq
      state.update((ver, snap))
      snap.iterator.map { case (h, key, v) => (g, h, key, v, ver) }
    }
    partials.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(merge)
      .toDF("grp", "h", "key", "v", "ver")
  }

  /** Sliding-window event counting in O(log² W) state per key — the
    * DGIM algorithm (Datar, Gionis, Indyk, Motwani 2002, "Maintaining
    * stream statistics over sliding windows"; MMDS ch. 4): per key, a
    * list of exponentially-sized buckets (ts = the bucket's most
    * recent event, size a power of two, at most TWO buckets per
    * size — a third merges the two oldest into one of double size
    * keeping the newer timestamp), expired when the bucket timestamp
    * leaves the window. The estimate `total − oldest/2` is within 50%
    * of the true last-`windowLen` count — the textbook trade for
    * counting "events in the last hour" per key over an unbounded
    * stream WITHOUT keeping the events: exact windowed counts need
    * the window's raw events in state; DGIM keeps ~2·log₂(W) longs.
    *
    * Event-time discipline: events apply in (ts) order within each
    * micro-batch; an event older than the key's newest-seen ts is
    * DROPPED and counted in `dropped_late` (DGIM has no out-of-order
    * insert — feed it watermark-ordered data). Equal-ts events insert
    * as identical size-1 buckets, so intra-ts order cannot affect the
    * result. Emits one snapshot row per key per micro-batch:
    * (grp, est, total, oldest, newest_ts, n_buckets, dropped_late,
    * ver); `est` estimates events in `(newest_ts − windowLen,
    * newest_ts]`. State rides the checkpoint across AvailableNow
    * runs ([[bottomKMaintain]]'s restart contract).
    */
  def dgimMaintain(df: DataFrame, keyCol: String, tsCol: String,
                   windowLen: Long): DataFrame = {
    require(windowLen >= 1, s"windowLen >= 1, got $windowLen")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(keyCol).cast("string").as("grp"),
        col(tsCol).cast("long").as("ts"))
      .as[(String, Long)]
    // state: (ver, newestTs, droppedLate, buckets newest-first as
    // (ts, size))
    def step(g: String, it: Iterator[(String, Long)],
             state: GroupState[(Long, Long, Long, Seq[(Long, Long)])])
        : Iterator[(String, Long, Long, Long, Long, Long, Long, Long)] = {
      val (prevVer, prevNewest, prevDropped, prevBuckets) =
        state.getOption.getOrElse(
          (0L, Long.MinValue, 0L, Seq.empty[(Long, Long)]))
      var newest = prevNewest
      var dropped = prevDropped
      // newest-first working list
      var buckets = scala.collection.mutable.ListBuffer
        .empty[(Long, Long)]
      buckets ++= prevBuckets
      def cascade(): Unit = {
        // merge from the smallest size up: find any size with 3
        // buckets, merge its two OLDEST (last two in newest-first
        // order), keep the newer timestamp
        var merged = true
        while (merged) {
          merged = false
          val bySize = buckets.zipWithIndex.groupBy(_._1._2)
          bySize.toSeq.sortBy(_._1).foreach { case (size, bs) =>
            if (!merged && bs.size >= 3) {
              val oldestTwo = bs.sortBy(_._2).takeRight(2)
              val keepTs = oldestTwo.map(_._1._1).max
              val idxs = oldestTwo.map(_._2).sorted
              buckets.remove(idxs(1)); buckets.remove(idxs(0))
              // insert the doubled bucket keeping ts order (newest
              // first): position before the first strictly-older ts
              val nb = (keepTs, size * 2L)
              val at = buckets.indexWhere(_._1 < keepTs) match {
                case -1 => buckets.size
                case i  => i
              }
              buckets.insert(at, nb)
              merged = true
            }
          }
        }
      }
      it.toSeq.sortBy(_._2).foreach { case (_, ts) =>
        if (ts < newest) dropped += 1
        else {
          newest = ts
          buckets.prepend((ts, 1L))
          cascade()
          // expire buckets whose most-recent event left the window
          buckets.filterInPlace(_._1 > newest - windowLen)
        }
      }
      val total = buckets.map(_._2).sum
      val oldest = if (buckets.isEmpty) 0L else buckets.last._2
      val est = total - oldest / 2
      val ver = prevVer + 1
      state.update((ver, newest, dropped, buckets.toSeq))
      Iterator((g, est, total, oldest,
        if (newest == Long.MinValue) 0L else newest,
        buckets.size.toLong, dropped, ver))
    }
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(step)
      .toDF("grp", "est", "total", "oldest", "newest_ts", "n_buckets",
        "dropped_late", "ver")
  }

  /** Drain everything currently available into a parquet sink and stop
    * (micro-batch reprocessing; checkpoint carries state across runs).
    */
  def runAvailableNow(df: DataFrame, outDir: String, checkpointDir: String,
                      outputMode: String = "append"): Unit = {
    val q: StreamingQuery = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream → [[graft.sources.TableStore]] with EXACTLY-ONCE batches:
    * `foreachBatch` over [[graft.sources.TableStore.appendExactlyOnce]],
    * whose (streamId, batchId) fence commits ATOMICALLY with the
    * appended files (one manifest CAS). A crash after the table commit
    * but before the checkpoint advance re-delivers the batch on
    * restart; the fence skips it — the table never holds a batch
    * twice, under any kill point, which a plain parquet-sink append
    * cannot promise. Drains everything available, then returns.
    */
  def appendStreamExactlyOnce(df: DataFrame,
                              store: graft.sources.TableStore,
                              table: String, streamId: String,
                              checkpointDir: String,
                              partitionBy: Seq[String] = Nil): Unit = {
    val q: StreamingQuery = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.appendExactlyOnce(table, batch, streamId, batchId,
          partitionBy)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming write expectations — the
    * [[graft.operators.Expectations]] admission gate over a stream:
    * each micro-batch splits on the declared rules; admissible rows
    * land in `table`, violating rows (with the joined `__violations`
    * string) in `quarantine`, BOTH through the exactly-once
    * (streamId, batchId) fence, so a crash-replayed batch can
    * neither double-admit nor double-quarantine (the quarantine
    * fence rides its own stream token `<streamId>#q`). Rules are
    * row-local (stateless), so the union of all micro-batch splits
    * is EXACTLY the batch split of the union — the differential spec
    * pins stream ≡ batch. Admission commits before quarantine within
    * a batch (the batch form's ordering contract: a crash between
    * the two loses only quarantine rows, never admits a bad row).
    */
  def expectIngestExactlyOnce(df: DataFrame,
                              store: graft.sources.TableStore,
                              table: String, quarantine: String,
                              rules: Seq[graft.operators.Expectations.Rule],
                              streamId: String,
                              checkpointDir: String,
                              partitionBy: Seq[String] = Nil): Unit = {
    import graft.operators.Expectations
    require(!streamId.contains('#'),
      s"streamId must not contain '#' (reserved), got $streamId")
    val q: StreamingQuery = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val ann = Expectations.annotate(batch, rules)
        val good = ann.filter(size(col("__violations")) === 0)
          .drop("__violations")
        val bad = ann.filter(size(col("__violations")) > 0)
          .withColumn("__violations",
            org.apache.spark.sql.functions
              .array_join(col("__violations"), ","))
        store.appendExactlyOnce(table, good, streamId, batchId,
          partitionBy)
        store.appendExactlyOnce(quarantine, bad, s"$streamId#q",
          batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming CDC -> corpus table -> INVERTED INDEX, end to end: each
    * micro-batch upserts into the corpus exactly-once (the
    * [[mergeStreamExactlyOnce]] fence riding the merge's own commit
    * CAS), then [[graft.operators.LexIndex.refreshFromCorpus]] catches
    * the index up to whatever generation the corpus now heads — the
    * complete incremental serving loop (ingest → index →
    * `LexIndex.topKServed`) with no full rebuilds.
    *
    * Exactly-once WITHOUT a shared transaction: the two stores advance
    * on INDEPENDENT anchors. A replayed batch is skipped by the merge
    * fence (corpus unchanged) and the index refresh no-ops on an equal
    * generation; a crash BETWEEN merge and refresh is healed on the
    * next batch/restart because `refreshFromCorpus` resumes from the
    * generation anchor in the index's own stats row and its churn
    * application is idempotent. The index table must exist
    * ([[graft.operators.LexIndex.buildFromCorpus]], empty corpus is
    * fine) before the stream starts.
    */
  def lexIndexMaintain(df: DataFrame,
                       store: graft.sources.TableStore,
                       corpusTable: String, lexTable: String,
                       keyCol: String, textCol: String,
                       streamId: String, checkpointDir: String): Unit = {
    val q: StreamingQuery = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.merge(corpusTable, batch, keyCol,
          graft.sources.TableStore.MergeUpdate(Seq(textCol)),
          insertNotMatched = true, txn = Some(streamId -> batchId))
        graft.operators.LexIndex.refreshFromCorpus(store, corpusTable,
          lexTable, keyCol, textCol)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming NEAR-DUP ADMISSION against the persisted band index,
    * end to end: each micro-batch (1) screens its docs against the
    * standing corpus through [[graft.operators.DedupIndex.admit]]
    * (band join on the PERSISTED index + candidate-bounded
    * exact-Jaccard verify + within-batch greedy dedup — corpus text is
    * never re-shingled wholesale), (2) merges only the SURVIVORS into
    * the corpus EXACTLY-ONCE (the (streamId, batchId) fence rides the
    * merge's own commit CAS), and (3)
    * [[graft.operators.DedupIndex.refreshFromCorpus]] re-bands just
    * the admitted churn — so the NEXT batch screens against everything
    * admitted so far, with no full rebuilds: the steady-state 100 TB
    * ingest-dedup loop.
    *
    * Exactly-once on the [[lexIndexMaintain]] protocol — two stores,
    * INDEPENDENT anchors, no shared transaction: a replayed batch may
    * compute a DIFFERENT (even empty) admission set, because its docs
    * already sit in the corpus from the first delivery — but the merge
    * fence discards it and the index refresh no-ops on an equal
    * generation, so state is unaffected; a crash BETWEEN merge and
    * refresh heals on the next batch/restart from the index's own
    * generation anchor. The corpus table and band index must exist
    * ([[graft.operators.DedupIndex.buildFromCorpus]]; empty corpus is
    * fine) before the stream starts; batch keys must be NEW doc ids
    * (admission ingests new docs, it does not re-admit updates).
    */
  def dedupIndexMaintain(df: DataFrame,
                         store: graft.sources.TableStore,
                         corpusTable: String, indexTable: String,
                         keyCol: String, textCol: String,
                         threshold: Double, streamId: String,
                         checkpointDir: String): Unit = {
    val q: StreamingQuery = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          val admitted = graft.operators.DedupIndex.admit(store,
            indexTable, corpusTable, b, keyCol, textCol, threshold)
          store.merge(corpusTable, admitted, keyCol,
            graft.sources.TableStore.MergeUpdate(Seq(textCol)),
            insertNotMatched = true, txn = Some(streamId -> batchId))
          graft.operators.DedupIndex.refreshFromCorpus(store,
            corpusTable, indexTable, keyCol, textCol)
          ()
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming CDC → corpus table → N-GRAM COUNT MODEL, end to end:
    * each micro-batch upserts into the corpus exactly-once (the merge
    * fence riding its commit CAS), then
    * [[graft.operators.LmIndex.refreshFromCorpus]] folds the
    * change-feed count deltas into the persisted model — the
    * [[lexIndexMaintain]] loop for the LM family, so perplexity /
    * stupid-backoff / Kneser–Ney serving stays current with ingest
    * and the target corpus is never re-tokenized wholesale.
    *
    * Exactly-once across the two stores: the merge fence skips
    * replayed batches, and the model refresh is ATOMIC (deltas +
    * stats + anchor in one merge commit — [[graft.operators.LmIndex]]
    * crash contract), so a crash anywhere leaves either the old or
    * the new model and the next batch/restart heals the lag. The
    * corpus and model tables must exist
    * ([[graft.operators.LmIndex.buildFromCorpus]]) before the stream
    * starts.
    */
  def lmIndexMaintain(df: DataFrame,
                      store: graft.sources.TableStore,
                      corpusTable: String, modelTable: String,
                      keyCol: String, textCol: String,
                      streamId: String, checkpointDir: String): Unit = {
    val q: StreamingQuery = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.merge(corpusTable, batch, keyCol,
          graft.sources.TableStore.MergeUpdate(Seq(textCol)),
          insertNotMatched = true, txn = Some(streamId -> batchId))
        graft.operators.LmIndex.refreshFromCorpus(store, corpusTable,
          modelTable, textCol)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming PASSAGE-SCREENED ADMISSION against the persisted
    * winnowing index — [[dedupIndexMaintain]]'s loop with
    * substring-level copy detection in place of MinHash resemblance:
    * each micro-batch (1) admits only docs sharing < minShared
    * winnowing fingerprints with the standing corpus AND no
    * smaller-id within-batch match
    * ([[graft.operators.WinnowIndex.admit]] — fp-pruned index read,
    * corpus text never re-fingerprinted wholesale), (2) merges
    * survivors exactly-once (fence on the merge's commit CAS), and
    * (3) [[graft.operators.WinnowIndex.refreshFromCorpus]]
    * re-fingerprints just the admitted churn — so the next batch
    * screens against everything admitted so far. Same replay/crash
    * reasoning as [[dedupIndexMaintain]] (two stores, independent
    * anchors): a replayed batch's different admission set is
    * discarded by the fence, and refresh no-ops on an equal
    * generation. Corpus table and winnow index must exist before the
    * stream starts; batch keys must be NEW doc ids.
    */
  def winnowIndexMaintain(df: DataFrame,
                          store: graft.sources.TableStore,
                          corpusTable: String, indexTable: String,
                          keyCol: String, textCol: String,
                          minShared: Long, streamId: String,
                          checkpointDir: String): Unit = {
    val q: StreamingQuery = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.persist()
        try {
          val admitted = graft.operators.WinnowIndex.admit(store,
            indexTable, b, keyCol, textCol, minShared)
          store.merge(corpusTable, admitted, keyCol,
            graft.sources.TableStore.MergeUpdate(Seq(textCol)),
            insertNotMatched = true, txn = Some(streamId -> batchId))
          graft.operators.WinnowIndex.refreshFromCorpus(store,
            corpusTable, indexTable, keyCol, textCol)
          ()
        } finally { b.unpersist(); () }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming CDC upsert — stream → [[graft.sources.TableStore.merge]]
    * with the EXACTLY-ONCE (streamId, batchId) fence riding each
    * merge's own commit CAS: a crash between the table commit and the
    * checkpoint advance re-delivers the batch, the fence skips it, and
    * the table never applies a batch twice — the streaming MERGE INTO
    * shape (change feeds folding into a keyed corpus table, updates
    * and inserts in one atomic commit per micro-batch, file-level
    * key-range targeting inside). Batches must carry unique non-null
    * keys ([[graft.sources.TableStore.merge]]'s loud guard).
    */
  def mergeStreamExactlyOnce(df: DataFrame,
                             store: graft.sources.TableStore,
                             table: String, keyCol: String,
                             whenMatched: graft.sources.TableStore.MergeAction,
                             streamId: String,
                             checkpointDir: String,
                             insertNotMatched: Boolean = true): Unit = {
    val q: StreamingQuery = df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.merge(table, batch, keyCol, whenMatched, insertNotMatched,
          txn = Some(streamId -> batchId))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
