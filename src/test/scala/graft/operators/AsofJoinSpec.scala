package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // (id, key, ts) probes; (key, ts, rid, px) references
  private lazy val probe = Seq(
    (1L, "a", 100L), (2L, "a", 250L), (3L, "a", 300L),
    (4L, "b", 50L), (5L, "c", 10L))
    .toDF("id", "k", "ts")
  private lazy val ref = Seq(
    ("a", 90L, 10L, 1.0), ("a", 200L, 11L, 2.0), ("a", 300L, 12L, 3.0),
    ("b", 60L, 13L, 4.0))
    .toDF("k", "ts", "rid", "px")

  test("backward: most recent prior, inclusive, unmatched -> null") {
    val out = AsofJoin.backward(probe, ref, Seq("k"), "ts",
      payloadCols = Seq("rid", "px"), tieCol = "rid")
      .orderBy($"id")
      .select($"id", $"r_rid", $"r_px").collect()
    assert(out(0).getLong(1) == 10L)      // 100 -> ref@90
    assert(out(1).getLong(1) == 11L)      // 250 -> ref@200
    assert(out(2).getLong(1) == 12L)      // 300 -> ref@300 (inclusive)
    assert(out(3).isNullAt(1))            // b@50 precedes ref@60
    assert(out(4).isNullAt(1))            // key c has no refs
  }

  test("equal-ts reference ties: largest tieCol wins") {
    val dup = ref.union(Seq(("a", 200L, 99L, 9.9)).toDF("k", "ts", "rid", "px"))
    val out = AsofJoin.backward(probe.filter($"id" === 2L), dup, Seq("k"),
      "ts", Seq("rid", "px"), tieCol = "rid").head()
    assert(out.getAs[Long]("r_rid") == 99L)
  }

  test("tolerance nulls out stale matches") {
    val out = AsofJoin.backward(probe, ref, Seq("k"), "ts",
      Seq("rid"), tieCol = "rid", tolerance = Some(lit(20L)))
      .orderBy($"id").select($"id", $"r_rid").collect()
    assert(out(0).getLong(1) == 10L)  // delta 10 <= 20
    assert(out(1).isNullAt(1))        // delta 50 > 20
  }

  test("null payload FIELD does not fall back to an older reference row") {
    val refNull = Seq(("a", 90L, 10L, Some(1.0)), ("a", 200L, 11L, None))
      .toDF("k", "ts", "rid", "px")
    val out = AsofJoin.backward(probe.filter($"id" === 2L), refNull,
      Seq("k"), "ts", Seq("rid", "px"), tieCol = "rid").head()
    assert(out.getAs[Long]("r_rid") == 11L) // latest row, not the non-null one
    assert(out.isNullAt(out.fieldIndex("r_px")))
  }

  test("forward: earliest reference at or after the probe ts") {
    val out = AsofJoin.forward(probe, ref, Seq("k"), "ts",
      Seq("rid"), tieCol = "rid")
      .orderBy($"id").select($"id", $"r_rid").collect()
    assert(out(0).getLong(1) == 11L)  // 100 -> next ref@200
    assert(out(1).getLong(1) == 12L)  // 250 -> ref@300
    assert(out(2).getLong(1) == 12L)  // 300 -> ref@300 (inclusive)
    assert(out(3).getLong(1) == 13L)  // b@50 -> ref@60
    assert(out(4).isNullAt(1))        // key c unmatched
    // tolerance: 100 -> ref@200 is 100 away, cut at 50
    val tol = AsofJoin.forward(probe, ref, Seq("k"), "ts",
      Seq("rid"), "rid", tolerance = Some(lit(50L)))
      .orderBy($"id").select($"id", $"r_rid").collect()
    assert(tol(0).isNullAt(1))
    assert(tol(1).getLong(1) == 12L)
  }

  test("null join keys match nothing (SQL join semantics)") {
    val p = Seq((1L, Option.empty[String], 100L), (2L, Some("a"), 100L))
      .toDF("id", "k", "ts")
    val r = Seq((Option.empty[String], 90L, 10L, 1.0),
      (Some("a"), 90L, 11L, 2.0)).toDF("k", "ts", "rid", "px")
    val out = AsofJoin.backward(p, r, Seq("k"), "ts", Seq("rid"), "rid")
      .orderBy($"id").select($"id", $"r_rid").collect()
    // a null-key probe must NOT match the null-key reference (the
    // window would group them; an equi-join never would)
    assert(out(0).isNullAt(1))
    assert(out(1).getLong(1) == 11L)
  }

  // 90%-hot-key differential fixture: 900 of 1000 probes on one key,
  // references on every key (some sharing a ts to exercise tie-breaks)
  private lazy val hotProbe = ((1 to 900).map(i =>
      (i.toLong, "hot", (i * 7 % 499).toLong)) ++
    (901 to 1000).map(i => (i.toLong, s"k${i % 10}", (i * 3 % 499).toLong)))
    .toDF("id", "k", "ts")
  private lazy val hotRef = (for {
      (k, ki) <- ("hot" +: (0 until 10).map(i => s"k$i")).zipWithIndex
      t <- 0 to 480 by 40
    } yield (k, t.toLong, (ki * 1000 + t).toLong, t / 10.0))
    .toDF("k", "ts", "rid", "px")

  test("backwardSalted/forwardSalted: identical to unsalted on hot keys") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val base = AsofJoin.backward(hotProbe, hotRef, Seq("k"), "ts",
      Seq("rid", "px"), "rid", tolerance = Some(lit(60L)))
    val salted = AsofJoin.backwardSalted(hotProbe, hotRef, Seq("k"), "ts",
      Seq("rid", "px"), "rid", saltBy = Seq($"id"), salts = 8,
      tolerance = Some(lit(60L)))
    assert(canon(salted) == canon(base))
    val fwdBase = AsofJoin.forward(hotProbe, hotRef, Seq("k"), "ts",
      Seq("rid"), "rid")
    val fwdSalted = AsofJoin.forwardSalted(hotProbe, hotRef, Seq("k"), "ts",
      Seq("rid"), "rid", saltBy = Seq($"id"), salts = 8)
    assert(canon(fwdSalted) == canon(fwdBase))
  }

  test("plan: salted as-of partitions by (key, salt) — hot key spread") {
    val plan = AsofJoin.backwardSalted(hotProbe, hotRef, Seq("k"), "ts",
      Seq("rid"), "rid", saltBy = Seq($"id"), salts = 8)
      .queryExecution.executedPlan.toString
    // the window exchange must hash on the salt too, and stay
    // deterministic (content-derived salt, no rand())
    assert("hashpartitioning\\([^)]*__asof_salt".r.findFirstIn(plan).isDefined, plan)
    assert(!plan.toLowerCase.contains("rand("), plan)
  }

  test("plan: single exchange on the key — no range join blowup") {
    val plan = AsofJoin.backward(probe, ref, Seq("k"), "ts",
      Seq("rid"), tieCol = "rid").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    assert("hashpartitioning".r.findAllIn(plan).size >= 1)
  }
}
