package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private val parts: Map[String, Int] =
    (0 until 20).map(n => s"src$n" -> ((n % 4) + 1)).toMap

  test("differential: stratified rank equals the single-window rank") {
    val sched = Interleave.scheduleMix(docs, "doc_id", "source", parts,
      salt = "il-spec", strata = 8)
    // the audit twin: ONE window partition per source over the same
    // composite (stratum, bucket, id) hash order
    val b = Sampling.hashBucket(col("doc_id"), "il-spec")
    val twin = docs
      .filter(col("source").isin(parts.keys.toSeq.sorted: _*))
      .withColumn("__b", b)
      .withColumn("__s", pmod(col("__b"), lit(8L)))
      .withColumn("rank_twin", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("__s"), col("__b"), col("doc_id"))))
      .select(col("doc_id"), col("rank_twin"))
    val diff = sched.join(twin, "doc_id")
      .filter(col("src_rank") =!= col("rank_twin"))
    assert(diff.isEmpty, "stratified rank diverged from the plain window")
  }

  test("every prefix of the schedule holds each source within one row") {
    val small: Map[String, Int] =
      Map("src0" -> 5, "src1" -> 3, "src2" -> 2)
    val wTotal = small.values.sum.toDouble
    val rows = Interleave.scheduleMix(docs, "doc_id", "source", small,
        salt = "il-spec", strata = 4)
      .orderBy(col("sched_key"), col("source"), col("doc_id"))
      .select(col("source")).as[String].collect()
    assert(rows.nonEmpty)
    val totals = rows.groupBy(identity).view.mapValues(_.length).toMap
    // the stride bound models infinite streams; once the most-demanded
    // source runs dry the remainder back-fills. Assert the bound up to
    // the first exhaustion, exact totals after.
    val seen = scala.collection.mutable.Map.empty[String, Int]
    var dry = false
    rows.zipWithIndex.foreach { case (s, i) =>
      seen(s) = seen.getOrElse(s, 0) + 1
      dry = dry || seen(s) == totals(s)
      val n = i + 1
      if (!dry) small.foreach { case (src, w) =>
        val expect = n * w / wTotal
        val got = seen.getOrElse(src, 0)
        // stride-schedule discrepancy bound (+1 slack for key ties
        // resolved by the (source, id) tie-break)
        assert(math.abs(got - expect) <= 2.0,
          s"prefix $n: $src has $got, expected ~$expect")
      }
    }
    assert(seen.size == small.size, "a source never entered the schedule")
    val inCounts = docs.filter(col("source").isin(small.keys.toSeq: _*))
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    small.keys.foreach { s =>
      assert(totals.getOrElse(s, 0).toLong == inCounts.getOrElse(s, 0L))
    }
  }

  test("sources without a part and NULL sources are excluded") {
    val extra = docs.limit(2)
      .withColumn("source", lit(null).cast("string"))
      .unionByName(docs.limit(3).withColumn("source", lit("rogue")))
      .unionByName(docs.filter(col("source") === "src0"))
    val out = Interleave.scheduleMix(extra, "doc_id", "source",
      Map("src0" -> 1), salt = "il-spec")
    assert(out.select("source").distinct().as[String].collect()
      .toSeq == Seq("src0"))
  }

  test("equal parts reduce to a balanced round-robin of the hash order") {
    val out = Interleave.scheduleMix(docs, "doc_id", "source",
        Map("src0" -> 1, "src1" -> 1), salt = "il-spec")
      .orderBy(col("sched_key"), col("source"), col("doc_id"))
      .select(col("source")).as[String].collect()
    // equal strides → keys pair up (2r-1 each): every adjacent pair
    // holds one row of each source until the shorter one runs dry
    val n = math.min(out.count(_ == "src0"), out.count(_ == "src1"))
    out.take(2 * n).grouped(2).foreach { p =>
      assert(p.toSet == Set("src0", "src1"), p.mkString(","))
    }
  }

  test("plan: no global window; the offset map broadcasts") {
    val sched = Interleave.scheduleMix(docs, "doc_id", "source", parts,
      salt = "il-spec", strata = 8)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = sched.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "found a global (unpartitioned) window in the schedule plan")
    val plan = sched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan)
  }
}
