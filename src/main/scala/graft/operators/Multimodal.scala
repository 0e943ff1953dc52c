package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal columns at pipeline scale (north-star operator): media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs as a BATCHED per-partition
  * stage, the Scala analog of `mapInPandas` — one decoder instance and
  * one batch buffer per partition, never per row.
  *
  * The decode step itself is a STUB (this container has no image/audio
  * codecs): [[FakeDecoder]] derives deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — schema, encoder, batching,
  * partition distribution — is the production shape; swapping in a JNI
  * decoder touches only [[MediaDecoder]].
  */
object Multimodal {

  /** Typed media metadata carried next to the payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  val featureType: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType),
    StructField("byte_entropy", DoubleType),
    StructField("histogram", ArrayType(LongType))))

  /** Decoder interface: one instance per partition, batch-in batch-out
    * (the mapInPandas batch contract).
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row]
  }

  /** Deterministic stand-in for a real codec: md5 checksum, 16-bucket
    * byte histogram, byte entropy. Real decode would go here (???-grade
    * stub by design).
    */
  object FakeDecoder extends MediaDecoder {
    def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[Row] =
      batch.map { case (id, bytes) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val checksum = md.digest(bytes).map("%02x".format(_)).mkString
        val hist = new Array[Long](16)
        bytes.foreach(b => hist((b & 0xFF) / 16) += 1)
        val n = bytes.length.toDouble
        val entropy = if (n == 0) 0.0 else
          -hist.filter(_ > 0).map { c =>
            val p = c / n; p * math.log(p) / math.log(2)
          }.sum
        Row(id, bytes.length.toLong, checksum, entropy, hist.toSeq)
      }
  }

  /** Batched feature extraction over (idCol: long, payloadCol: binary).
    * Batches of `batchSize` rows per decoder call within each partition —
    * the partition count (not row count) bounds decoder instances.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      decoder: MediaDecoder = FakeDecoder,
                      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(df(idCol).cast("long"), df(payloadCol))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
        .grouped(batchSize)
        .flatMap(b => decoder.decodeBatch(b))
    }
    spark.createDataFrame(rdd, featureType)
  }
}
