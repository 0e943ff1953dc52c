package graft.operators

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  // symmetric star: center 0 <-> leaves 1..4
  private val star = (1L to 4L).flatMap(i =>
    Seq((0L, i), (i, 0L))).toDF("src", "dst")

  test("star graph: center outranks leaves, leaves equal, mass ~ scale") {
    val r = GraphRank.pageRank(star, "src", "dst", iters = 3)
      .select($"id", $"r_q").as[(Long, Long)].collect().toMap
    assert(r.size == 5)
    assert((1L to 4L).forall(i => r(i) == r(1L))) // symmetric leaves
    assert(r(0L) > r(1L)) // hub concentrates rank
    val mass = r.values.sum
    assert(mass <= 1000000000000L && mass > 999999000000L,
      s"mass $mass drifted (floor loss should be < |E|+n per round)")
  }

  test("two-node symmetric pair is the fixpoint: ranks stay equal at 1/2") {
    val pair = Seq((10L, 20L), (20L, 10L)).toDF("src", "dst")
    val r = GraphRank.pageRank(pair, "src", "dst", iters = 5)
      .select($"id", $"r_q").as[(Long, Long)].collect().toMap
    assert(r(10L) == r(20L))
    assert(r(10L) == 500000000000L - 1L || r(10L) == 500000000000L,
      s"expected ~scale/2, got ${r(10L)}") // floor loss at most 1 quantum
  }

  test("partitioning-invariant: identical r_q at 1 and 13 partitions") {
    def run(parts: Int) =
      GraphRank.pageRank(star.repartition(parts), "src", "dst", iters = 3)
        .select($"id", $"r_q").as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }

  test("dangling nodes are rejected loudly") {
    val dangling = Seq((1L, 2L)).toDF("src", "dst") // 2 has no out-edge
    val ex = intercept[IllegalArgumentException] {
      GraphRank.pageRank(dangling, "src", "dst", iters = 1)
    }
    assert(ex.getMessage.contains("dangling"))
    GraphRank.releaseIntermediates()
  }
  test("triangleCounts == brute force on a seeded random graph; dedup/self-loop safe") {
    val rnd = new scala.util.Random(77)
    val n = 40
    val raw = (0 until 300).map(_ => (rnd.nextInt(n).toLong,
      rnd.nextInt(n).toLong))
    // feed DIRTY edges: self-loops, duplicates, both orientations
    val edges = (raw ++ raw.take(50).map(_.swap) ++
      (0 until 5).map(i => (i.toLong, i.toLong))).toDF("src", "dst")
    val got = GraphRank.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    // driver brute force over the canonical simple graph
    val es = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val want = scala.collection.mutable.Map.empty[Long, Long]
    for {
      a <- nodes; b <- nodes if a < b && es((a, b))
      c <- nodes if b < c && es((b, c)) && es((a, c))
    } Seq(a, b, c).foreach(v => want(v) = want.getOrElse(v, 0L) + 1L)
    assert(got == want.toMap)
    assert(want.values.sum % 3 == 0 && want.nonEmpty)
    // partitioning invariance
    assert(GraphRank.triangleCounts(edges.repartition(7), "src", "dst")
      .as[(Long, Long)].collect().toMap == want.toMap)
    GraphRank.releaseIntermediates()
  }

  test("triangleCounts: ring+chords closed form; triangle-free graph is empty") {
    // ring 0..9 with (i, i+2) chords: each i forms triangle (i,i+1,i+2)
    val n = 10L
    val edges = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n))).toDF("src", "dst")
    val got = GraphRank.triangleCounts(edges, "src", "dst")
      .as[(Long, Long)].collect().toMap
    // every node sits in exactly 3 of the n triangles
    assert(got == (0L until n).map(_ -> 3L).toMap)
    // a pure ring (no chords) has none
    assert(GraphRank.triangleCounts(
      (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst"),
      "src", "dst").count() == 0)
    GraphRank.releaseIntermediates()
  }

}
