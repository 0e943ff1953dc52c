package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Physical-plan audits for the round-12 statistics/health operators:
  * each scaladoc's scale claim ("one map-side rollup", "no self-join",
  * "bounded-frame BNLJ is broadcast") pinned against the executed
  * plan, so a refactor that silently introduces a cartesian product
  * or an unpromised global window fails here rather than at 100 TB.
  */
class PlanShapesSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000000L

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pure-rollup operators: no window, no join of any kind") {
    val ev = Seq((1L, 0L), (2L, day)).toDF("u", "t")
    val p1 = plan(Timeseries.dowHourHeatmap(ev.select($"t"), "t"))
    val dfp = Seq(("a", 1L, 2L)).toDF("g", "k", "v")
    val p2 = plan(Profile.describeNumeric(dfp, Seq("k", "v")))
    val p3 = plan(Profile.groupSizeHistogram(dfp, "g"))
    for (p <- Seq(p1, p2, p3)) {
      assert(!p.contains("Window"), p)
      assert(!p.contains("SortMergeJoin") &&
        !p.contains("CartesianProduct"), p)
    }
  }

  test("broadcast-total operators: the only joins are broadcasts") {
    val dfp = Seq(("a", 1L, 2L)).toDF("g", "k", "v")
    val p1 = plan(Profile.hhiConcentration(dfp, "g", "k", "v"))
    val p2 = plan(Profile.categoryShareChi2(dfp.select($"g"), "g", 4))
    val ev = Seq((1L, 0L)).toDF("u", "t")
    val p3 = plan(Timeseries.dowAdjustedOutliers(ev.select($"t"), "t"))
    for (p <- Seq(p1, p2, p3))
      assert(!p.contains("CartesianProduct"), p)
  }

  test("calendar-lag correlators: lag fan-out broadcasts, day join hashes") {
    val ev = (0L until 6L).map(d => d * day).toDF("t")
    val p = plan(Timeseries.acfDaily(ev, "t", maxLag = 2))
    assert(!p.contains("CartesianProduct"), p)
    // the x-side joins y on an equi day key: a hash join, never a
    // nested loop over the data
    assert(p.contains("Join"), p)
    val p2 = plan(Timeseries.xcfDaily(ev, "t", ev, "t", maxLag = 1))
    assert(!p2.contains("CartesianProduct"), p2)
  }

  test("bounded-frame pair operators: the declared BNLJ is broadcast") {
    // kendallTau2/theilSen pair on a non-equi condition by contract —
    // the physical form must be a BROADCAST nested loop (one bounded
    // side ships), never a shuffle cartesian
    val per = Seq((1L, 1L, 1L), (2L, 2L, 2L), (3L, 3L, 3L))
      .toDF("k", "x", "y")
    val p1 = plan(Profile.kendallTau2(per, "k", "x", "y"))
    assert(p1.contains("BroadcastNestedLoopJoin") &&
      !p1.contains("CartesianProduct"), p1)
    val ev = (0L until 4L).map(d => d * day).toDF("t")
    val p2 = plan(Timeseries.theilSen(ev, "t"))
    assert(p2.contains("BroadcastNestedLoopJoin") &&
      !p2.contains("CartesianProduct"), p2)
  }

  test("q243: dim chain broadcasts; no sort-merge on any dim leg") {
    // the TPC-H Q5 shape: supplier⋈nation⋈region collapse into ONE
    // broadcast side before the fact joins — a stats change must not
    // silently flip a dim leg to a shuffle join
    val q = graft.queries.Registry.queries("q243_local_supplier_revenue")
    val p = plan(q(spark, "/root/testdata/sf0.001"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val smjDimLines = p.linesIterator.filter(_.contains("SortMergeJoin"))
      .filter(l => l.contains("s_suppkey") || l.contains("n_nationkey")
        || l.contains("n_regionkey") || l.contains("r_regionkey"))
      .toSeq
    assert(smjDimLines.isEmpty,
      s"dim leg fell off broadcast:\n${smjDimLines.mkString("\n")}\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q244: global top-10 is TakeOrdered, never a full sort") {
    // the TPC-H Q3 shape: orderBy(...).limit(10) must collapse to
    // TakeOrderedAndProject (per-partition top-10 + driver merge) —
    // a refactor that materializes a global Sort before the limit
    // re-serializes the whole rollup through one range exchange
    val q = graft.queries.Registry.queries("q244_top_unshipped")
    val df = q(spark, "/root/testdata/sf0.001")
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the segment filter is a semi join: customers must never
    // multiply lineitem rows
    assert(p.contains("LeftSemi"), p)
  }

  test("SQL-text twins plan like their DataFrame forms (q260/q261)") {
    // the parsed entry path must reach the same physical shapes the
    // DataFrame gates pin: q260's dim chain broadcasts with no
    // cartesian, and q261's rank filter earns the WindowGroupLimit
    // pushdown — SQL text is not a second-class plan source
    val pJoin = plan(graft.queries.Registry
      .queries("q260_sql_join_surface")(spark, "/root/testdata/sf0.001"))
    assert(pJoin.contains("BroadcastHashJoin"), pJoin)
    assert(!pJoin.contains("CartesianProduct"), pJoin)
    val pWin = plan(graft.queries.Registry
      .queries("q261_sql_window_surface")(spark, "/root/testdata/sf0.001"))
    assert(pWin.contains("WindowGroupLimit"), pWin)
  }

  test("q263/q265: top-20 is TakeOrdered; bracket join stays an equi hash join") {
    // Q10 shape: the global top-20 must collapse to
    // TakeOrderedAndProject, never a full sort; Q19 shape: the
    // disjunctive residual must ride the partkey equi join, never
    // degrade it to a nested loop or cartesian
    val p10 = plan(graft.queries.Registry
      .queries("q263_returned_revenue")(spark, "/root/testdata/sf0.001"))
    assert(p10.contains("TakeOrderedAndProject"), p10)
    assert(!p10.contains("CartesianProduct"), p10)
    val p19 = plan(graft.queries.Registry
      .queries("q265_bracket_join")(spark, "/root/testdata/sf0.001"))
    assert(!p19.contains("CartesianProduct") &&
      !p19.contains("BroadcastNestedLoopJoin"), p19)
    assert(p19.contains("Join"), p19)
  }

  test("markovAccuracy: exactly one window pass over the events") {
    val ev = Seq((1L, 0L, 1L, "A"), (1L, 5L, 2L, "B"))
      .toDF("u", "t", "id", "ty")
    val p = plan(Funnel.markovAccuracy(ev, "u", "t", "id", "ty"))
    // the argmax rank gets the WindowGroupLimit top-1 pushdown (only
    // one row per prev survives the sort), the totals join back as a
    // broadcast hash join, and there is no self-join over the events
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
