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
}
