package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: batched decode, deterministic features") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "aaaa"))
      .toDF("doc_id", "text")
      .withColumn("payload", $"text".cast("binary"))
    val out = Multimodal.extractFeatures(docs, "doc_id", "payload",
      batchSize = 2)
      .orderBy($"doc_id")
    val rows = out.collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getAs[Long]("n_bytes") == 11)
    // md5("hello world") well-known digest
    assert(r1.getAs[String]("checksum") ==
      "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(r1.getAs[Seq[Long]]("histogram").sum == 11)
    val r2 = rows(1)
    assert(r2.getAs[Long]("n_bytes") == 0)
    assert(r2.getAs[Double]("byte_entropy") == 0.0)
    val r3 = rows(2)
    assert(r3.getAs[Double]("byte_entropy") == 0.0) // single distinct byte
    // deterministic across runs
    val again = Multimodal.extractFeatures(docs, "doc_id", "payload")
      .orderBy($"doc_id").collect()
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }

  test("partition count is preserved (decoder instances bounded by partitions)") {
    val docs = spark.range(100).toDF("doc_id")
      .withColumn("payload", concat(lit("p"), $"doc_id").cast("binary"))
      .repartition(7)
    val out = Multimodal.extractFeatures(docs, "doc_id", "payload",
      batchSize = 8)
    assert(out.rdd.getNumPartitions == 7)
    assert(out.count() == 100)
  }
}
