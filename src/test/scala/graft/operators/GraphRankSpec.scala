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

  test("labelPropagation: two cliques with one bridge split into two communities") {
    // cliques {0..3} and {10..13}, bridge 3-10: every node's neighbor
    // majority stays inside its clique, so labels converge to the
    // clique minimum (0 and 10) and the bridge cannot flip either side
    val c1 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val c2 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = (c1 ++ c2 :+ (3L, 10L)).toDF("src", "dst")
    val got = GraphRank.labelPropagation(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert((0L to 3L).forall(got(_) == 0L), got.toString)
    assert((10L to 13L).forall(got(_) == 10L), got.toString)
    GraphRank.releaseIntermediates()
  }

  test("labelPropagation == driver-side synchronous reference on a seeded graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val raw = (0 until 120).map(_ => (rnd.nextInt(n).toLong,
      rnd.nextInt(n).toLong))
    // driver reference: symmetrized simple graph, synchronous rounds,
    // (count DESC, label ASC) winner
    val und = raw.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lbl = nbrs.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = nbrs.map { case (v, ns) =>
        val votes = ns.map(lbl).groupBy(identity).view
          .mapValues(_.size).toSeq
        v -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = GraphRank.labelPropagation(
      raw.toDF("src", "dst").repartition(13), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == lbl, s"diff: ${got.toSet.diff(lbl.toSet)}")
    // partitioning invariance
    val got1 = GraphRank.labelPropagation(
      raw.toDF("src", "dst").coalesce(1), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got1 == got)
    GraphRank.releaseIntermediates()
  }

  test("raLinkPrediction: exact 1/deg sums, non-edges only, hub cap") {
    import spark.implicits._
    // path 1-2-3-4 plus spoke 2-5: candidates via common neighbors
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L),
      (2L, 1L) /* reverse dup collapses */).toDF("s", "d")
    val got = GraphRank.raLinkPrediction(e, "s", "d", k = 10)
      .as[(Long, Long, Long, Long)].collect().toSet
    // deg: 1->1, 2->3, 3->2, 4->1, 5->1
    // wedges at 2 (deg 3): (1,3),(1,5),(3,5) each 1/3 -> 333333
    // wedges at 3 (deg 2): (2,4) but 2-4 not an edge -> 1/2 = 500000
    assert(got == Set((2L, 4L, 500000L, 1L), (1L, 3L, 333333L, 1L),
      (1L, 5L, 333333L, 1L), (3L, 5L, 333333L, 1L)), got.toString)
    // hub cap: maxDeg=2 removes node 2 as a wedge center
    val capped = GraphRank.raLinkPrediction(e, "s", "d", k = 10,
        maxDeg = 2).as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == Set((2L, 4L, 500000L, 1L)), capped.toString)
    // existing edges never predicted
    assert(!got.exists(p => (p._1, p._2) == ((1L, 2L))))
    intercept[IllegalArgumentException] {
      GraphRank.raLinkPrediction(e, "s", "d", k = 0)
    }
    intercept[IllegalArgumentException] {
      GraphRank.raLinkPrediction(e, "s", "d", k = 1, maxDeg = 1)
    }
    GraphRank.releaseIntermediates()
  }

  test("kcore: cascading peel, canonicalization, degenerate cases") {
    import spark.implicits._
    // triangle 1-2-3 (the 2-core) with a chain 3-4-5-6 hanging off:
    // 6 peels (deg 1), then 5, then 4 — a 3-round cascade
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L),
      (2L, 1L), /* reverse dup collapses */
      (4L, 4L) /* self-loop dropped */).toDF("s", "d")
    val core2 = GraphRank.kcore(e, "s", "d", k = 2)
      .as[(Long, Long)].collect().toSet
    assert(core2 == Set((1L, 2L), (2L, 2L), (3L, 2L)), core2.toString)
    // k=3: the triangle's internal degree is 2 — nothing survives
    assert(GraphRank.kcore(e, "s", "d", k = 3).count() == 0L)
    // k=1: any edge endpoint survives (no peeling needed); chain
    // degrees reported within the full graph
    val core1 = GraphRank.kcore(e, "s", "d", k = 1)
      .as[(Long, Long)].collect().toMap
    assert(core1 == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L,
      5L -> 2L, 6L -> 1L), core1.toString)
    // partitioning invariance
    val repart = GraphRank.kcore(e.repartition(7), "s", "d", k = 2)
      .as[(Long, Long)].collect().toSet
    assert(repart == core2)
    // maxRounds fails loudly before the fixpoint
    intercept[IllegalArgumentException] {
      GraphRank.kcore(e, "s", "d", k = 2, maxRounds = 1)
    }
    intercept[IllegalArgumentException] {
      GraphRank.kcore(e, "s", "d", k = 0)
    }
    GraphRank.releaseIntermediates()
  }

  test("clusteringCoeff: triangle membership over C(deg,2) exactly") {
    import spark.implicits._
    // triangle 1-2-3 with tail 3-4-5-6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("s", "d")
    val got = GraphRank.clusteringCoeff(e, "s", "d")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L)), 4L -> ((2L, 0L, 0L)),
      5L -> ((2L, 0L, 0L)), 6L -> ((1L, 0L, 0L))), got.toString)
    GraphRank.releaseIntermediates()
  }

  test("assortativity: star is perfectly disassortative, cycle degenerates") {
    import spark.implicits._
    // star K1,3: every directed slot pairs degree 3 with degree 1 —
    // endpoint degrees are perfectly ANTI-correlated -> -10^6
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val gotS = GraphRank.assortativity(star, "s", "d")
      .as[(Long, Long)].collect().head
    assert(gotS == ((6L, -1000000L)), gotS.toString)
    // 4-cycle: all degrees 2 -> zero variance -> 0, not a crash
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("s", "d")
    val gotC = GraphRank.assortativity(cyc, "s", "d")
      .as[(Long, Long)].collect().head
    assert(gotC == ((8L, 0L)), gotC.toString)
    // dup/reversed/self-loop edges canonicalize first
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 0L), (0L, 2L), (0L, 3L))
      .toDF("s", "d")
    val gotM = GraphRank.assortativity(messy, "s", "d")
      .as[(Long, Long)].collect().head
    assert(gotM == gotS, gotM.toString)
  }

  test("bfsLayers: min hop distance, depth cap, multi-seed, early exit") {
    import spark.implicits._
    // path 1-2-3-4-5, plus island 8-9 no seed can reach
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("s", "d")
    val seed1 = Seq(1L).toDF("id")
    val got = GraphRank.bfsLayers(e, "s", "d", seed1, "id",
      maxDepth = 3).as[(Long, Long)].collect().toMap
    // node 5 is 4 hops out -> absent under the cap; island absent
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      got.toString)
    // two seeds: distances are MINIMUM over seeds (edges undirected)
    val got2 = GraphRank.bfsLayers(e, "s", "d",
      Seq(1L, 5L).toDF("id"), "id", maxDepth = 3)
      .as[(Long, Long)].collect().toMap
    assert(got2 == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L,
      3L -> 2L), got2.toString)
    // early exit: whole component exhausted before the cap — extra
    // depth budget changes nothing; an edge-less seed still labels 0
    val got3 = GraphRank.bfsLayers(e, "s", "d",
      Seq(8L, 42L).toDF("id"), "id", maxDepth = 10)
      .as[(Long, Long)].collect().toMap
    assert(got3 == Map(8L -> 0L, 42L -> 0L, 9L -> 1L), got3.toString)
    intercept[IllegalArgumentException] {
      GraphRank.bfsLayers(e, "s", "d", seed1, "id", maxDepth = 0)
    }
    GraphRank.releaseIntermediates()
  }
}
