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

  test("frameSample emits every Nth fixed-size frame with correct bytes") {
    val payload = (0 until 1000).map(i => (i % 256).toByte).toArray
    val docs = Seq((1L, payload)).toDF("doc_id", "payload")
    val out = Multimodal.frameSample(docs, "doc_id", "payload", everyN = 2,
      Multimodal.FixedSizeFrames(256)).orderBy($"frame_idx").collect()
    // 1000 bytes -> frames 0..3 (256,256,256,232); sampled: 0 and 2
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(out(0).getAs[Array[Byte]]("frame").length == 256)
    assert(out(1).getAs[Array[Byte]]("frame").toSeq ==
      payload.slice(512, 768).toSeq)
    // tail frame shorter than frameBytes is kept when sampled
    val out3 = Multimodal.frameSample(docs, "doc_id", "payload", everyN = 3)
      .orderBy($"frame_idx").collect()
    assert(out3.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 3))
    assert(out3(1).getAs[Array[Byte]]("frame").length == 232)
  }

  test("resizeTo: deterministic stride subsample + refreshed metadata") {
    val payload = (0 until 1000).map(i => (i % 256).toByte).toArray
    val docs = Seq((1L, payload), (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeTo(docs, "doc_id", "payload", w = 8, h = 8)
      .orderBy($"doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Array[Byte]]("payload").length == 64)
    val meta = r1.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("width") == 8 && meta.getAs[Int]("height") == 8)
    assert(meta.getAs[Long]("n_bytes") == 64L)
    // payloads already below target pass through untouched
    assert(out(1).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2, 3))
    // deterministic
    val again = Multimodal.resizeTo(docs, "doc_id", "payload", 8, 8)
      .orderBy($"doc_id").head().getAs[Array[Byte]]("payload")
    assert(again.toSeq == r1.getAs[Array[Byte]]("payload").toSeq)
  }
}
