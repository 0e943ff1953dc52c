package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class BucketedTablesSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed join runs without a shuffle on either side") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    BucketedTables.save(spark, "b_orders", orders, 8, Seq("o_orderkey"))
    BucketedTables.save(spark, "b_lineitem", lineitem, 8, Seq("l_orderkey"))

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = BucketedTables.table(spark, "b_lineitem")
        .join(BucketedTables.table(spark, "b_orders"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val n = j.count()
      assert(n > 0)
      val executed = j.queryExecution.executedPlan
      val plan = executed match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // the JOIN itself must consume bucketed scans directly; the only
      // exchange allowed is the one introduced by the groupBy when it
      // regroups on a different key
      val joinNode = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joinNode.isDefined, s"expected SMJ in:\n$plan")
      val shufflesUnderJoin = joinNode.get.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join should not shuffle:\n${joinNode.get}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Similarity

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ivfTopK recall vs brute force") {
    val k = 10
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id",
      "embedding", k).select($"qid", $"nid")
      .as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(q, emb, "vec_id", "vec_id",
      "embedding", k, centroidEvery = 16, nprobe = 8)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"IVF recall@$k = $recall")
    assert(recall >= 0.3)
    // each query's own vector is always found (probes its own cell)
    assert((0L until 20L).forall(i => approx.contains((i, i))))
  }
}
