package graft

/** One benchmark execution of one query: elapsed seconds plus the
  * error message if the run threw. Every pass — warmup or timed — is
  * a full materializing execution of the same plan, so any successful
  * pass is a valid sample of the query's cost.
  */
final case class PassResult(sec: Double, error: Option[String]) {
  def ok: Boolean = error.isEmpty
}

/** What the protocol decided for the whole run. `results` carries one
  * seconds value per query (failed queries carry the 600 s penalty so
  * a crash can never read as a speedup); `failed` lists queries whose
  * EVERY executed pass errored; `errors` carries their messages;
  * `degraded` lists queries whose schedule was truncated by the wall
  * budget (their numbers are single-pass evidence, not min-of-two).
  */
final case class BenchOutcome(
    results: Map[String, Double],
    failed: Set[String],
    errors: Map[String, String],
    degraded: Set[String])

/** Pass-scheduling protocol for [[graft.Bench]], factored out of the
  * Spark harness so the schedule is unit-testable against a fake
  * clock (BenchSpec). The schedule is load-bearing evidence surface:
  * two consecutive driver rounds (BENCH_r12, BENCH_r13) produced NO
  * parseable bench JSON because the previous schedule overshot the
  * driver's wrapper timeout and was killed at rc=124 — a killed run
  * yields zero evidence, a degraded run yields slightly noisier
  * evidence, so the protocol now degrades instead of dying.
  *
  * Per-query schedule:
  *
  *  1. one warmup pass (absorbs JVM/JIT/codegen cost) — always runs;
  *  2. one timed pass A — always runs (these two are the guaranteed
  *     minimum evidence; only extra passes are budget-gated);
  *  3. "fast" classification happens on pass A (post-JIT), NOT the
  *     cold warmup — the previous schedule classified on the warmup
  *     and only 21/255 queries qualified because even a trivial
  *     filter's first-ever execution lands over 0.5 s under cold
  *     codegen. passA ok && passA < fastCutoff && warmup ok → accept
  *     min(passA, warmup), done (both are identical executions; the
  *     warmup floor guards the one-pass ambient-stall scenario);
  *  4. slow or errored queries get timed pass B (min-of-two), a
  *     variance-triggered third pass (two timed passes disagreeing by
  *     more than 25% of the faster one, above the 0.5 s jitter floor,
  *     means at least one was disturbed), and outlier retries (time
  *     still above 5x the cold warmup or 10x the cross-query median —
  *     the median guard is the real stall detector). No second
  *     warmup: pass A is already post-JIT, so warmup2 was a third
  *     steady-state sample bought at ~180 extra executions per full
  *     run. Every EXTRA pass is skipped once elapsed wall time passes
  *     `wallBudget` — the run keeps whatever evidence it already has
  *     and still prints its JSON line.
  *
  * Failure semantics: a query is FAILED only when every pass that
  * actually executed errored; a one-pass error with a green sibling
  * pass is the transient-absorbed scenario. Failed queries carry a
  * 600 s penalty in both the per-query map and the total.
  */
object BenchProtocol {
  val FailurePenalty = 600.0

  def run(
      names: Seq[String],
      exec: (String, String) => PassResult, // (tag, name) => result
      elapsed: () => Double,                // wall seconds since start
      wallBudget: Double,
      fastCutoff: Double = 0.5,
      jitterFloor: Double = 0.5,
      log: String => Unit = _ => ()): BenchOutcome = {
    def budgetLeft: Boolean = elapsed() < wallBudget
    val degraded = scala.collection.mutable.LinkedHashSet[String]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()

    // Guaranteed evidence: one warmup + one timed pass per query, in
    // name order, all warmups first (early warmups JIT code shared by
    // later queries, so the timed phase starts steady-state).
    val warm1 = names.map(n => n -> exec("warmup", n)).toMap
    val passA = names.map(n => n -> exec("timed", n)).toMap

    val fast = names.filter { n =>
      passA(n).ok && passA(n).sec < fastCutoff && warm1(n).ok
    }.toSet
    val slow = names.filterNot(fast)

    // Extra passes, budget-gated: degraded evidence beats none.
    def gated(tag: String, ns: Seq[String]): Map[String, PassResult] =
      ns.flatMap { n =>
        if (budgetLeft) Some(n -> exec(tag, n))
        else { degraded += n; None }
      }.toMap
    val passB = gated("timed2", slow)

    // Floor per query for outlier detection (never the reported
    // result unless it is also the pass minimum — every pass is a
    // full execution). The cold warmup over-estimates, which only
    // weakens the 5x arm; the 10x-median arm catches what it misses.
    def warmFloor(n: String): Double =
      if (warm1(n).ok) warm1(n).sec else 0.05

    val base = names.map { n =>
      val timedPasses = Seq(passA(n)) ++ passB.get(n)
      val allPasses = Seq(warm1(n), passA(n)) ++ passB.get(n)
      val okTimes = allPasses.filter(_.ok).map(_.sec)
      if (okTimes.isEmpty) {
        // every executed pass errored: persistent failure, penalty
        errors(n) = timedPasses.reverse.flatMap(_.error).headOption
          .getOrElse(warm1(n).error.getOrElse("failed"))
        n -> FailurePenalty
      } else if (fast(n)) {
        n -> math.min(passA(n).sec, warm1(n).sec)
      } else {
        // variance re-entry: two green timed passes disagreeing above
        // jitter scale mean one was disturbed — a third pass decides
        val okTimed = timedPasses.filter(_.ok).map(_.sec)
        val third =
          if (okTimed.size == 2) {
            val (a, b) = (okTimed(0), okTimed(1))
            val lo = math.min(a, b)
            if (lo > jitterFloor && math.abs(a - b) > 0.25 * lo) {
              if (budgetLeft) {
                log(f"[bench:variance] $n $a%.2fs vs $b%.2fs — third pass")
                val c = exec("timed3", n)
                if (c.ok) Some(c.sec) else None
              } else { degraded += n; None }
            } else None
          } else None
        n -> (okTimes ++ third).min
      }
    }.toMap
    val failed = names.filter(n => base(n) == FailurePenalty &&
      errors.contains(n)).toSet

    // Outlier retry: an ambient stall can span both timed passes. The
    // median excludes failures so penalties can't mask a real stall.
    val med = {
      val xs = base.collect { case (n, t) if !failed(n) => t }.toSeq.sorted
      if (xs.isEmpty) 0.0 else xs(xs.size / 2)
    }
    def isOutlier(n: String, t: Double): Boolean =
      !failed(n) && t > 1.0 &&
        (t > 5.0 * math.max(warmFloor(n), 0.05) ||
          t > 10.0 * math.max(med, 0.05))
    val results = names.map { n =>
      var best = base(n)
      var tries = 0
      while (isOutlier(n, best) && tries < 2 && budgetLeft) {
        log(f"[bench:outlier] $n $best%.2fs (warmup ${warmFloor(n)}%.2fs, median $med%.2fs) — retrying")
        val t = exec(s"retry${tries + 1}", n)
        if (t.ok) best = math.min(best, t.sec)
        tries += 1
      }
      if (isOutlier(n, best) && !budgetLeft) degraded += n
      n -> best
    }.toMap

    BenchOutcome(results, failed, errors.toMap, degraded.toSet)
  }
}
