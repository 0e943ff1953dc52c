package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the standard event-stream operator
  * (north-star; the reference has no event sessions). A session breaks
  * when the gap to the previous event of the same key exceeds
  * `maxGap` (same units as `tsCol`).
  *
  * Both steps are window functions over ONE hash partitioning of the
  * key: lag → new-session flag, running sum → session ordinal. No
  * self-join, no state on the driver; at 100 TB the single shuffle on
  * the key is the floor for any per-key ordering. The batch twin of
  * `streaming.Streams`' watermarked windows.
  *
  * Hot keys: [[AsofJoin.backwardSalted]]'s salt-and-replicate trick
  * does NOT transfer here, deliberately. The session ordinal is a
  * prefix sum over the key's complete time-ordered event sequence —
  * every event's value depends on every earlier event of the key, so
  * any salt split changes gaps at sub-partition boundaries and with
  * them the answer (as-of could replicate the small side; sessions
  * have no small side to replicate). AQE can't help either: skew-join
  * splitting does not apply to a single window partition. The honest
  * scale paths, in preference order: (1) a coarser pre-key — sessions
  * rarely span days, so partitioning by (key, day) with a two-pass
  * boundary stitch bounds any reducer at one key-day; (2) the
  * streaming twin (`Streams.sessionWindows`), whose watermark keeps
  * per-key state bounded regardless of history length. A key hot
  * enough to stall a reducer here is a data-model smell (a bot or a
  * default id), not a partitioning bug.
  */
object Sessionize {

  /** Per-event session ordinal (1-based per key, in ts order). Ties on
    * equal ts break by `tieCol` so the numbering is deterministic.
    */
  def assign(df: DataFrame, keyCol: String, tsCol: String, maxGap: Long,
             tieCol: String, sessionCol: String = "session_ord"): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieCol).asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > maxGap, 1L)
      .otherwise(0L)
    df.withColumn(sessionCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Collapse to one row per session: bounds, size, and an optional
    * value sum. Reuses [[assign]]'s partitioning for the aggregate.
    */
  def stats(df: DataFrame, keyCol: String, tsCol: String, maxGap: Long,
            tieCol: String, valueCol: Option[String] = None): DataFrame = {
    val assigned = assign(df, keyCol, tsCol, maxGap, tieCol)
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("start_ts"),
      max(col(tsCol)).as("end_ts"),
      (max(col(tsCol)) - min(col(tsCol))).as("duration")) ++
      valueCol.map(v => sum(col(v)).as(s"sum_$v"))
    assigned.groupBy(col(keyCol), col("session_ord")).agg(aggs.head, aggs.tail: _*)
  }
}
