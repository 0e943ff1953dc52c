package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct estimate lands near the true cardinality") {
    // 8000 distinct keys in one group, k=256 → stderr ≈ 1/√k ≈ 6%
    val df = (1 to 8000).map(i => ("g", s"key$i")).toDF("grp", "key")
    val r = Sketches.kmvDistinct(df, Seq("grp"), "key", k = 256,
      salt = "t").head()
    val est = r.getAs[Double]("est")
    assert(r.getAs[Long]("n_exact") == 8000L)
    assert(math.abs(est - 8000.0) / 8000.0 < 0.2, s"est=$est")
  }

  test("groups under k report the exact count, duplicates collapse") {
    val df = Seq("a", "a", "a", "b", "c").map(("g", _)).toDF("grp", "key")
    val r = Sketches.kmvDistinct(df, Seq("grp"), "key", k = 16, "t").head()
    assert(r.getAs[Long]("n_exact") == 3L)
    assert(r.getAs[Double]("est") == 3.0)
  }

  test("deterministic across partitionings; salt changes the sketch") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"k$i")).toDF("grp", "key")
    val a = Sketches.kmvDistinct(df, Seq("grp"), "key", 32, "s1")
      .collect().map(_.toSeq).toSet
    val b = Sketches.kmvDistinct(df.repartition(7), Seq("grp"), "key", 32, "s1")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    val c = Sketches.kmvDistinct(df, Seq("grp"), "key", 32, "s2")
      .collect().map(r => r.getAs[Long]("kth_min")).toSet
    assert(c != a.map(_(2)))
  }

  test("plan: bottom-k gets the WindowGroupLimit rewrite") {
    val df = (1 to 100).map(i => ("g", s"k$i")).toDF("grp", "key")
    val plan = Sketches.kmvDistinct(df, Seq("grp"), "key", 8, "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("kmvEstimate matches kmvDistinct's estimate, exact under k") {
    val df = (1 to 2000).map(i => (s"g${i % 4}", s"k${i % (400 * (i % 4 + 1))}"))
      .toDF("grp", "key")
      .union(Seq(("tiny", "a"), ("tiny", "a"), ("tiny", "b")).toDF("grp", "key"))
    val audit = Sketches.kmvDistinct(df, Seq("grp"), "key", 64, "s")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("kth_min"), r.getAs[Double]("est")))).toMap
    val prod = Sketches.kmvEstimate(df, Seq("grp"), "key", 64, "s")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("kth_min"), r.getAs[Double]("est")))).toMap
    assert(prod == audit)
    assert(prod("tiny")._2 == 2.0) // below k: exact, not estimated
  }

  test("plan: kmvEstimate has WindowGroupLimit and no unbounded-frame window") {
    val df = (1 to 100).map(i => ("g", s"k$i")).toDF("grp", "key")
    val plan = Sketches.kmvEstimate(df, Seq("grp"), "key", 8, "t")
      .queryExecution.executedPlan.toString
    // the row_number bottom-k window must be prunable…
    assert(plan.contains("WindowGroupLimit"))
    // …and the exact-count window (unboundedPreceding→unboundedFollowing,
    // which forces each group's whole distinct set through one window
    // partition) must be gone from the production path
    assert(!plan.contains("UNBOUNDED FOLLOWING"), plan)
  }


  test("HLL: registers merge by max across any split; partitioning-invariant") {
    val df = (1 to 3000).map(i => (s"g${i % 2}", s"k$i")).toDF("grp", "key")
    val full = Sketches.hllRegisters(df, Seq("grp"), "key", p = 8, "t")
      .collect().map(_.toSeq).toSet
    val half1 = Sketches.hllRegisters(df.filter($"key" < "k5"),
      Seq("grp"), "key", p = 8, "t")
    val half2 = Sketches.hllRegisters(df.filter($"key" >= "k5"),
      Seq("grp"), "key", p = 8, "t")
    val merged = half1.unionByName(half2)
      .groupBy("grp", "bucket").agg(max("m").as("m"))
      .collect().map(_.toSeq).toSet
    assert(merged == full) // the HLL mergeability law, exactly
    val reparted = Sketches.hllRegisters(df.repartition(7), Seq("grp"),
      "key", p = 8, "t").collect().map(_.toSeq).toSet
    assert(reparted == full)
    // registers are sane: bucket in [0, 256), rank in [1, 49]
    full.foreach { r =>
      val b = r(1).asInstanceOf[Long]; val m = r(2).asInstanceOf[Long]
      assert(b >= 0 && b < 256 && m >= 1 && m <= 49)
    }
  }

  test("HLL: estimate accuracy in the raw-estimate regime (n >> 2.5m)") {
    // n = 60000 distinct, p = 10 (m = 1024): stderr ~ 1.04/32 = 3.3 pct
    val df = (1 to 60000).map(i => ("g", i)).toDF("grp", "key")
    val regs = Sketches.hllRegisters(df, Seq("grp"), "key", p = 10, "t")
    val r = Sketches.hllEstimate(regs, Seq("grp"), p = 10).head()
    val est = r.getAs[Long]("est")
    assert(math.abs(est - 60000.0) / 60000.0 < 0.1, s"est=$est")
    // duplicates change nothing (distinct semantics)
    val dup = df.unionByName(df.limit(10000))
    val r2 = Sketches.hllEstimate(
      Sketches.hllRegisters(dup, Seq("grp"), "key", p = 10, "t"),
      Seq("grp"), p = 10).head()
    assert(r2.getAs[Long]("est") == est)
  }

  test("HLL: small-m exact-alpha path and v_empty accounting") {
    val df = (1 to 500).map(i => ("g", i)).toDF("grp", "key")
    val regs = Sketches.hllRegisters(df, Seq("grp"), "key", p = 4, "t")
    val r = Sketches.hllEstimate(regs, Seq("grp"), p = 4).head()
    val present = regs.count()
    assert(r.getAs[Long]("v_empty") == 16 - present)
    assert(r.getAs[Long]("est") > 0)
    // s_scaled is the exact integer harmonic sum: recompute on driver
    val ms = regs.select("m").as[Long].collect()
    val expectS = ms.map(m => BigInt(2).pow((49 - m).toInt)).sum +
      BigInt(16 - present) * BigInt(2).pow(49)
    assert(BigInt(r.getAs[java.math.BigDecimal]("s_scaled")
      .toBigInteger) == expectS)
  }

  test("CMS: est >= exact always; no-collision keys read exactly") {
    val df = (1 to 300).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i"))
      .toDF("key")
    val exact = df.groupBy($"key").agg(count(lit(1)).as("n"))
    val sketch = Sketches.cmsBuild(df, "key", depth = 4, width = 4096,
      salt = "t")
    val est = Sketches.cmsEstimate(sketch, exact, "key", 4, 4096, "t")
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("est")))
    assert(est.forall { case (n, e) => e >= n })
    // width 4096 >> 300 keys: the overwhelming majority collide nowhere
    assert(est.count { case (n, e) => e == n } > 250)
  }

  test("CMS: forced collisions overestimate, never under; partitioning-invariant") {
    val df = (1 to 500).map(i => s"k$i").toDF("key") // width 8 → heavy collisions
    val exact = df.groupBy($"key").agg(count(lit(1)).as("n"))
    val sk = Sketches.cmsBuild(df, "key", 4, 8, "t")
    val est = Sketches.cmsEstimate(sk, exact, "key", 4, 8, "t")
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("est")))
    assert(est.forall { case (n, e) => e >= n })
    assert(est.exists { case (n, e) => e > n }) // collisions really bite
    val a = sk.collect().map(_.toSeq).toSet
    val b = Sketches.cmsBuild(df.repartition(13), "key", 4, 8, "t")
      .collect().map(_.toSeq).toSet
    assert(a == b) // mergeable: partial cells sum identically
  }

  test("CMS: unseen key reads the collision mass (0 when none)") {
    val df = Seq("a", "b", "c").toDF("key")
    val sk = Sketches.cmsBuild(df, "key", 4, 4096, "t")
    val unseen = Seq("zzz-not-inserted").toDF("key")
    val e = Sketches.cmsEstimate(sk, unseen, "key", 4, 4096, "t")
      .head().getAs[Long]("est")
    assert(e == 0L)
  }

  test("CMS plan: sketch side broadcasts; build has map-side partial agg") {
    val df = (1 to 100).map(i => s"k$i").toDF("key")
    val sk = Sketches.cmsBuild(df, "key", 4, 64, "t")
    val keys = df.limit(5)
    val plan = Sketches.cmsEstimate(sk, keys, "key", 4, 64, "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
    val build = sk.queryExecution.executedPlan.toString
    assert(build.contains("partial_count") || build.contains("HashAggregate"),
      build)
  }

  test("bottomK: merge of shard sketches == sketch of the union") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), col("doc_id"), col("n_chars"))
    val k = 8
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("lang"), col("__key").cast("long"),
          col("__val").cast("long"), col("__h"))
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
    val direct = Sketches.bottomKSample(docs, Seq("lang"), "doc_id",
      "n_chars", k)
    // three arbitrary shards; per-shard sketches union, then the SAME
    // selection re-runs over the union — the merge contract
    val parts = (0 until 3).map(i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i))
    val shardSketches = parts.map(p =>
      Sketches.bottomKSample(p, Seq("lang"), "doc_id", "n_chars", k))
    val merged = Sketches.bottomKSample(
      shardSketches.reduce(_ unionByName _), Seq("lang"), "__key",
      "__val", k)
    assert(canon(merged) == canon(direct))
    // and the derived quantiles agree too
    val qs = Seq(("p50", 1, 2), ("p90", 9, 10))
    val a = Sketches.quantilesOfSample(merged, Seq("lang"), qs)
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    val b = Sketches.quantilesOfSample(direct, Seq("lang"), qs)
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("bottomK quantiles: exact when the group fits in k; close at k << n") {
    // group of 20 values 1..20 with k=64: the sample IS the group, so
    // the rank-discrete quantiles are exact
    val tiny = (1L to 20L).map(v => ("g", v, v)).toDF("g", "id", "v")
    val exact = Sketches.bottomKQuantiles(tiny, Seq("g"), "id", "v",
        k = 64, quantiles = Seq(("p25", 1, 4), ("p50", 1, 2),
          ("p95", 19, 20)))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(exact == Seq(("g", 20L, 5L, 10L, 19L)), exact.toString)
    // 10k uniform values, k=256: p50 within 10% of the true median
    val big = spark.range(10000)
      .select(lit("g").as("g"), col("id"), col("id").as("v"))
    val Seq((_, m, p50)) = Sketches.bottomKQuantiles(big, Seq("g"),
        "id", "v", k = 256, quantiles = Seq(("p50", 1, 2)))
      .as[(String, Long, Long)].collect().toSeq
    assert(m == 256L)
    assert(math.abs(p50 - 5000L) < 1000L, s"p50 estimate $p50")
  }

  test("kmvResemblance: exact when union fits in k; bounds and order hold") {
    import org.apache.spark.sql.functions.col
    // three groups over a small key universe: with k >= |union| the
    // estimate IS the exact Jaccard of the key sets
    val rows =
      (1 to 10).map(i => ("a", i)) ++            // A = 1..10
      (6 to 15).map(i => ("b", i)) ++            // B = 6..15, J(A,B)=5/15
      (1 to 10).map(i => ("c", i)) ++            // C == A, J=1
      Seq(("d", 99))                             // D disjoint from A
    val df = rows.toDF("g", "key")
    val got = Sketches.kmvResemblance(df, "g", "key", k = 32, salt = "t")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got(("a", "b")) == ((15L, 5L, 1000000L * 5 / 15)))
    assert(got(("a", "c")) == ((10L, 10L, 1000000L)))
    assert(got(("a", "d"))._3 == 0L)
    // g_a < g_b on every pair, all pairs present
    assert(got.keySet == Set(("a","b"),("a","c"),("a","d"),
      ("b","c"),("b","d"),("c","d")))
    // at k << |union| the estimate stays in [0, 1e6] and m == k
    val big = ((1 to 500).map(i => ("x", i)) ++
      (250 to 750).map(i => ("y", i))).toDF("g", "key")
    val (m, inter, ppm) = Sketches
      .kmvResemblance(big, "g", "key", k = 16, salt = "t")
      .as[(String, String, Long, Long, Long)].collect().head match {
        case (_, _, a, b, c) => (a, b, c)
      }
    assert(m == 16L && inter <= m && ppm >= 0L && ppm <= 1000000L)
  }
}
