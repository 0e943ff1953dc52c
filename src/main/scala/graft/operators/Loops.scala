package graft.operators

import org.apache.spark.sql.DataFrame

/** Round-loop lineage discipline for the iterative operators
  * (PageRank, label propagation, k-core, BFS, connected components):
  * each round's frame must be (a) materialized before its predecessor
  * is released and (b) LOGICAL-PLAN-truncated, or the round plan —
  * which references its predecessor more than once — doubles per
  * round and the analyzer heap-exhausts near 8–10 rounds.
  *
  * Until round 14 the pattern was `persist() + count() +
  * createDataFrame(df.rdd, schema)`. That works but pays three hidden
  * costs every round (measured on q90: ~40% of the round):
  *   - `df.rdd` converts InternalRow → external Row, and every
  *     downstream consumption converts back through the encoder —
  *     two per-row object conversions outside codegen;
  *   - the rebuilt frame's `outputPartitioning` is unknown, so the
  *     next round's equi-join RE-SHUFFLES the big persisted edge list
  *     even when both sides were already hash-partitioned on the key;
  *   - materialize-then-truncate is two actions (count + first reuse).
  *
  * `localCheckpoint(eager = true)` is the public API that fixes all
  * three at once: one materializing job, InternalRows stored directly,
  * and the checkpointed `LogicalRDD` KEEPS the physical plan's
  * outputPartitioning/outputOrdering, so co-partitioned round joins
  * stay exchange-free. Trade-off (documented upstream too): local
  * checkpoint blocks are not fault-tolerant — an executor loss mid-
  * loop fails the job instead of recomputing. The previous pattern's
  * "recomputable" lineage was already an empty promise at loop depth
  * (recompute walks back through every unpersisted round to source),
  * and these loops are bounded-round batch jobs where a rare mid-loop
  * retry-from-scratch is the cheaper contract than paying conversion +
  * re-shuffle every round of every run.
  */
object Loops {

  // release closures for every live checkpoint, so the engine-wide
  // release point can free blocks that Dataset.unpersist cannot reach
  // (checkpoint storage is RDD-level, not CacheManager-level)
  private val live =
    scala.collection.mutable.ListBuffer.empty[() => Unit]
  graft.Engine.register("Loops")(() => releaseIntermediates())

  /** Free every checkpoint block still pinned by loop rounds. */
  def releaseIntermediates(): Unit = {
    val snapshot = synchronized { val s = live.toList; live.clear(); s }
    snapshot.foreach(f => f())
  }

  /** Materialize `df` (one job), truncate its logical plan, keep its
    * physical partitioning/ordering. Returns the checkpointed frame
    * and a release handle that frees the pinned blocks (idempotent;
    * also enrolled in [[releaseIntermediates]]). The persistent-RDD
    * diff is safe here because the loops run their rounds sequentially
    * on the driver.
    *
    * `eager = false` defers materialization into the caller's NEXT
    * action (fusing checkpoint-write and probe into one job — the
    * convergence-count loops use it). Lazy is only safe when that
    * action runs BEFORE any predecessor's release handle: a lazy
    * checkpoint still reads its (checkpointed, lineage-truncated)
    * predecessor's blocks, so releasing them first loses the data.
    */
  def truncate(df: DataFrame, eager: Boolean = true)
      : (DataFrame, () => Unit) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint(eager)
    val added = (sc.getPersistentRDDs.keySet -- before).toSeq
    val rel: () => Unit = () => added.foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(false))
    }
    synchronized { live += rel }
    (ck, rel)
  }
}
