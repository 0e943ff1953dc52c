package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality (no reference counterpart — the reference has
  * no graph stage; PageRank is the public Brin/Page formulation). In
  * the LLM-pipeline frame this is the domain-authority quality prior
  * (CommonCrawl-derived corpora weight documents by host centrality) —
  * it complements [[Dedup.connectedComponents]]'s structure extraction
  * with importance scoring on the same edge shape.
  */
object GraphRank {

  // same owned-release discipline as Dedup: the final round's frame is
  // returned pinned (it feeds the caller's consumption); a long-lived
  // session releases it here once consumed
  private val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
  private def track(df: DataFrame): DataFrame = synchronized {
    pinned += df; df
  }
  // one-line enrollment in the engine-wide release point
  graft.Engine.register("GraphRank")(() => releaseIntermediates())

  /** Unpersist every frame PageRank runs have pinned. */
  def releaseIntermediates(): Unit = synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }

  /** Fixed-iteration PageRank over EXACT INTEGER arithmetic: ranks are
    * longs scaled by `scale`, damping is the rational num/den, and
    * every update is integer division on positive longs — so the
    * trajectory is deterministic, partitioning-invariant, AND immune
    * to floating-point reassociation (an earlier double formulation
    * hash-mismatched its oracle by 1 ulp because DuckDB contracts
    * `a + b·c` into a fused multiply-add where the JVM rounds twice;
    * integers cannot drift, in any engine).
    *
    * Update: r'_q = baseQ + (Σ_in ⌊r_q/deg⌋)·num ÷ den, with
    * baseQ = (scale − scale·num÷den) ÷ n. Floor losses make Σr
    * slightly < 1 (≤ |E|/scale per round) — the standard quantized
    * formulation.
    *
    * Dangling nodes (a dst that never appears as src) would silently
    * leak rank mass; this implementation REJECTS them loudly —
    * symmetrize the edge list or pre-drop sinks (the q90 gate uses the
    * symmetrized form, where none can exist).
    *
    * Scale shape per iteration (the Pregel norm): one ranks⋈edges join
    * shuffled on src, then ONE dst-keyed exact-long aggregation that
    * also carries deg — each node contributes a ZERO-contribution seed
    * row (c=0, deg) unioned into the same exchange, so nodes with no
    * in-edges still emerge and the former per-round deg join-back is
    * folded away (round 8; was join + agg + join per round). All rows
    * are bare (id, deg, rank); lineage truncates per round (the
    * [[Dedup.connectedComponents]] RDD pattern) so round i never
    * re-executes rounds 1..i−1, and the edge list persists for the
    * loop.
    *
    * Returns (id, r_q, r): the exact long rank and its double form
    * (one division — deterministic).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingNum: Long = 85L, dampingDen: Long = 100L,
               scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters >= 1, got $iters")
    require(dampingNum > 0 && dampingNum < dampingDen,
      s"damping $dampingNum/$dampingDen outside (0,1)")
    require(scale >= 1000000L, s"scale >= 1e6, got $scale")
    require(scale <= Long.MaxValue / dampingDen,
      "scale * dampingDen must stay inside Long")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    try {
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val nodes = e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct()
      val dangling = nodes
        .join(deg, nodes("id") === deg("src"), "left_anti").count()
      if (dangling > 0) throw new IllegalArgumentException(
        s"$dangling dangling node(s) (dst with no out-edges) would " +
          "leak rank mass - symmetrize the edge list or drop sinks")
      val n = nodes.count()
      require(n > 0, "empty graph")
      // exact long constants (any engine recomputing them agrees)
      val r0q = scale / n
      val baseQ = (scale - scale * dampingNum / dampingDen) / n
      var cached = deg.select(col("src").as("id"), col("deg"),
        lit(r0q).as("r_q")).persist()
      var ranks = cached
      for (_ <- 1 to iters) {
        val contrib = e.join(ranks, e("src") === ranks("id"))
          .select(col("dst"), expr("r_q div deg").as("c"),
            lit(null).cast("long").as("deg0"))
        // zero-contribution seed per node: adds 0 to the exact sum,
        // carries deg through the SAME aggregate exchange (max over
        // exactly one non-null), and guarantees every node emerges —
        // the former deg join-back per round is gone
        val seeds = ranks.select(col("id").as("dst"), lit(0L).as("c"),
          col("deg").as("deg0"))
        val step = contrib.unionByName(seeds)
          .groupBy(col("dst"))
          .agg(sum(col("c")).as("csum"), max(col("deg0")).as("deg"))
          .select(col("dst").as("id"), col("deg"),
            (lit(baseQ) +
              expr(s"csum * $dampingNum div $dampingDen"))
              .as("r_q"))
          .persist()
        step.count() // materialize before releasing the predecessor
        cached.unpersist(blocking = false)
        cached = step
        ranks = step.sparkSession.createDataFrame(step.rdd, step.schema)
      }
      track(cached) // returned pinned; releaseIntermediates() frees it
      ranks.select(col("id"), col("r_q"),
        (col("r_q").cast("double") / lit(scale.toDouble)).as("r"))
    } finally e.unpersist(blocking = false)
  }
}
