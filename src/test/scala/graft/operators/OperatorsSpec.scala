package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int) =
    (1 to n).map(i => ("d1", i, s"t$i")).toDF("doc", "ts", "text")

  test("n=5 overlap=2 over 10 rows: stride-3 windows incl. trailing partials") {
    val out = Chunker.slidingChunks(mk(10), "doc", Seq("ts"), "text", 5, 2)
      .orderBy($"chunk_id")
      .select($"chunk_id", $"n_items", $"text")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (0L, 5L, "t1 t2 t3 t4 t5"),
      (1L, 5L, "t4 t5 t6 t7 t8"),
      (2L, 4L, "t7 t8 t9 t10"),
      (3L, 1L, "t10")))
  }

  test("every row lands in at least one chunk; full chunks have n items") {
    val rows = 37; val n = 7; val ov = 3
    val out = Chunker.slidingChunks(mk(rows), "doc", Seq("ts"), "text", n, ov)
    val totalItems = out.agg(sum($"n_items")).as[Long].head()
    // each row appears in (n/stride rounded) chunks; coverage check:
    val distinctTexts = out.select(explode(split($"text", " ")))
      .distinct().count()
    assert(distinctTexts == rows)
    assert(totalItems >= rows)
    assert(out.filter($"n_items" > n).count() == 0)
  }

  test("referenceChunks: full windows + conditional tail, incl. the no-chunk quirk") {
    // hand-checked against transcripts_to_vector_db.py:197-225 semantics
    def run(rows: Int, n: Int, ov: Int) =
      Chunker.referenceChunks(mk(rows), "doc", "ts", "text", n, ov)
        .orderBy($"is_tail", $"chunk_ts")
        .select($"chunk_ts", $"n_items", $"is_tail")
        .as[(Int, Long, Boolean)].collect().toSeq
    // len=12 N=5 stride=3: full starts 0,3,6; 12%3==0 -> no tail
    assert(run(12, 5, 2) == Seq((1, 5, false), (4, 5, false), (7, 5, false)))
    // len=10: full 0,3; tail (10%3=1, (10-5)%3=2) -> last 5 = rows 6..10
    assert(run(10, 5, 2) == Seq((1, 5, false), (4, 5, false), (6, 5, true)))
    // len=3 < N: no fulls; 3%3==0 -> NO tail either (reference quirk)
    assert(run(3, 5, 2) == Seq())
    // len=4 < N: pythonMod(4-5,3)=2 != 0, 4%3=1 != 0 -> tail of all 4
    assert(run(4, 5, 2) == Seq((1, 4, true)))
  }

  test("zero overlap = disjoint partition") {
    val out = Chunker.slidingChunks(mk(9), "doc", Seq("ts"), "text", 3, 0)
    assert(out.count() == 3)
    assert(out.agg(sum($"n_items")).as[Long].head() == 9)
  }
}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq((1, "a", 10), (2, "b", 20))
    .toDF("k", "name", "v")

  test("newRows drops conflicting keys and intra-batch dups") {
    val incoming = Seq((2, "b2", 21), (3, "c", 30), (3, "c2", 31))
      .toDF("k", "name", "v")
    val out = Upsert.newRows(existing, incoming, Seq("k"), Seq("name"))
      .orderBy($"k").as[(Int, String, Int)].collect().toSeq
    assert(out == Seq((3, "c", 30)))
  }

  test("upsert is idempotent") {
    val incoming = Seq((2, "b2", 21), (3, "c", 30)).toDF("k", "name", "v")
    val once = Upsert.upsert(existing, incoming, Seq("k"), Seq("name"))
    val twice = Upsert.upsert(once, incoming, Seq("k"), Seq("name"))
    assert(once.count() == 3 && twice.count() == 3)
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
  }

  test("delisted finds keys missing from current") {
    val current = Seq((2, "x", 0)).toDF("k", "name", "v")
    val out = Upsert.delisted(existing, current, Seq("k"))
      .select($"k").as[Int].collect().toSeq
    assert(out == Seq(1))
  }

  test("antiDelete keeps only non-matching keys") {
    val del = Seq(Tuple1(1)).toDF("k")
    val out = Upsert.antiDelete(existing, del, Seq("k"))
      .select($"k").as[Int].collect().toSeq
    assert(out == Seq(2))
  }
}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("per-group top-k with tie-free ordering") {
    val df = Seq(("g1", 5, 1), ("g1", 5, 2), ("g1", 3, 3),
      ("g2", 9, 4)).toDF("g", "score", "id")
    val out = TopK.perGroup(df, Seq($"g"),
      Seq($"score".desc, $"id"), k = 2)
      .select($"g", $"id", $"rk").orderBy($"g", $"rk")
      .as[(String, Int, Int)].collect().toSeq
    assert(out == Seq(("g1", 1, 1), ("g1", 2, 2), ("g2", 4, 1)))
  }
}

/** O1 limit: deterministic only under a total order — the engine's rule
  * is limit-after-orderBy, which Spark executes as TakeOrderedAndProject
  * (no full sort, no full shuffle).
  */
class LimitSpec extends SparkSpec {
  import spark.implicits._

  test("limit after total order returns the exact k-prefix") {
    val df = (1 to 1000).map(i => (i * 37 % 1000, i)).toDF("k", "v")
    val got = df.orderBy($"k", $"v").limit(5).as[(Int, Int)].collect().toSeq
    val want = df.as[(Int, Int)].collect().sortBy(t => (t._1, t._2))
      .take(5).toSeq
    assert(got == want)
    val plan = df.orderBy($"k", $"v").limit(5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("rollup is one Expand + one aggregate pass (q161's shape)") {
    val q = graft.queries.Registry
      .queries("q161_rollup_subtotals")(spark,
        "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size >= 1,
      s"rollup must Expand, not re-scan per level:\n$plan")
    // exactly one data aggregate exchange (+ the presentation sort's
    // range partitioning) — subtotals do NOT scan the table per level
    assert("hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected one aggregate exchange:\n$plan")
    assert(!plan.contains("Union"), s"no per-level re-scan union:\n$plan")
  }

  test("cube is one Expand + one aggregate pass (q185's shape)") {
    val q = graft.queries.Registry
      .queries("q185_cube_subtotals")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).size >= 1,
      s"cube must Expand, not re-scan per lattice cell:\n$plan")
    assert("hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected one aggregate exchange:\n$plan")
    assert(!plan.contains("Union"), s"no per-cell re-scan union:\n$plan")
  }

  test("pivot with explicit values runs without a discovery pass") {
    val q = graft.queries.Registry
      .queries("q162_pivot_events")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(plan).size <= 2,
      s"pivot should be a grouped aggregate, not a join:\n$plan")
    assert(!plan.contains("Join"), s"pivot must not join:\n$plan")
    // and it returns the declared vocabulary even for absent types
    assert(q.columns.toSeq ==
      Seq("ub", "click", "view", "purchase", "signup", "error"))
  }
}
