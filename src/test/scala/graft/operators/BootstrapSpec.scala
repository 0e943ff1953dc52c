package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("poissonOneWeight: threshold ladder maps uniforms exactly") {
    val ths = Bootstrap.PoissonOneThresholds
    // probe one tick below/at each threshold + the cap region
    val probes = ths.flatMap(t => Seq(t - 1, t)) :+ (1L << 60) - 1
    val got = probes.toDF("u")
      .select(col("u"), Bootstrap.poissonOneWeight(col("u")).as("w"))
      .as[(Long, Int)].collect().toMap
    ths.zipWithIndex.foreach { case (t, k) =>
      assert(got(t - 1) == k, s"u=${t - 1} should be weight $k")
      assert(got(t) == k + 1, s"u=$t should be weight ${k + 1}")
    }
    assert(got((1L << 60) - 1) == 8) // cap
    // thresholds are CDF-monotone and below 2^60
    assert(ths == ths.sorted && ths.last < (1L << 60))
  }

  test("replicateMeans matches a driver-side replay of the hash chain") {
    val rows = (1L to 40L).map(k => (k, k * 7L))
    val df = rows.toDF("k", "x")
    val got = Bootstrap.replicateMeans(df, "k", "x", replicates = 5,
        salt = "s").orderBy($"b")
      .as[(Long, Long, Long)].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(key: Long, b: Int): Long = {
      val hex = md.digest(s"s:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val seed = java.lang.Long.parseLong(hex.take(15), 16)
      // independent splitmix64 replay (the reference recurrence),
      // NOT a call into the kernel under test
      var z = seed + (b + 1L) * 0x9E3779B97F4B9F19L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      z >>> 4
    }
    def w(uu: Long): Long =
      Bootstrap.PoissonOneThresholds.count(_ <= uu).toLong
    val want = (0 until 5).map { b =>
      val ws = rows.map { case (k, x) => (w(u(k, b)), x) }
      val n = ws.map(_._1).sum
      val wx = ws.map { case (wt, x) => wt * x }.sum
      (b.toLong, n, 1000000L * wx / n)
    }
    assert(got == want, s"got $got want $want")
  }

  test("replicateMeansBy/ciBy: grouped pass == per-group single pass") {
    val rows = (1L to 30L).map(k =>
      (if (k % 2 == 0) "even" else "odd", k, k * 3L))
    val df = rows.toDF("g", "k", "x")
    val grouped = Bootstrap.replicateMeansBy(df, "g", "k", "x", 7, "s")
      .as[(String, Long, Long, Long)].collect().toSet
    // each group's replicate frame equals replicateMeans run on that
    // group alone (weights depend only on (salt, key, b))
    Seq("even", "odd").foreach { g =>
      val solo = Bootstrap.replicateMeans(df.filter($"g" === g)
          .select($"k", $"x"), "k", "x", 7, "s")
        .as[(Long, Long, Long)].collect()
        .map(r => (g, r._1, r._2, r._3)).toSet
      assert(grouped.filter(_._1 == g) == solo, g)
    }
    // ciBy rank semantics on a hand frame: two groups, alpha=0.1
    val means = ((0L until 10L).map(b => ("a", b, 1L, (b + 1) * 10L))
      ++ (0L until 4L).map(b => ("b", b, 1L, (b + 1) * 100L)))
      .toDF("g", "b", "n_eff", "mean_micro")
    val ci = Bootstrap.ciBy(means, "g", alpha = 0.1)
      .as[(String, Long, Long, Long)].collect().toSet
    // a: ranks 1..10 -> lo rank 1 = 10, hi rank 9 = 90
    // b: n=4 -> lo rank max(1, ceil(.4))=1 = 100, hi ceil(3.6)=4 = 400
    assert(ci == Set(("a", 10L, 10L, 90L), ("b", 4L, 100L, 400L)),
      ci.toString)
    intercept[IllegalArgumentException] { Bootstrap.ciBy(means, "g", 0.5) }
    intercept[IllegalArgumentException] {
      Bootstrap.replicateMeansBy(df, "g", "k", "x", 0, "s")
    }
  }

  test("ci: rank-based discrete interval, deterministic ties") {
    // 10 replicate means 10,20,...,100; alpha=0.1 -> lo rank 1, hi rank 9
    val means = (0L until 10L).map(b => (b, 1L, (b + 1) * 10L))
      .toDF("b", "n_eff", "mean_micro")
    val got = Bootstrap.ci(means, alpha = 0.1)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((10L, 10L, 90L)), got.toString)
    intercept[IllegalArgumentException] { Bootstrap.ci(means, 0.5) }
  }

  test("replicateMeans: guards and corpus-shape plan") {
    val df = Seq((1L, 2L)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      Bootstrap.replicateMeans(df, "k", "x", 0, "s")
    }
    intercept[IllegalArgumentException] {
      Bootstrap.replicateMeans(df, "k", "x", 4097, "s")
    }
    val plan = Bootstrap.replicateMeans(df, "k", "x", 8, "s")
      .queryExecution.executedPlan.toString
    // single-pass: no join of the corpus with itself, partial agg
    assert(!plan.contains("Join"), s"bootstrap must not join:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial"),
      s"bootstrap aggregate must map-side combine:\n$plan")
  }
}
