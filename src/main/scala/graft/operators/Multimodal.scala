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

  // ------------------------------------------------------- frame sampling

  /** Frame extraction contract: payload → (frameIdx, frameBytes) stream.
    * Real video/audio needs a codec behind this seam (same policy as
    * [[MediaDecoder]]); [[FixedSizeFrames]] is the deterministic
    * stand-in that treats the payload as contiguous fixed-size frames.
    */
  trait FrameDecoder extends Serializable {
    def frames(payload: Array[Byte]): Iterator[(Int, Array[Byte])]
  }

  final case class FixedSizeFrames(frameBytes: Int) extends FrameDecoder {
    def frames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] =
      payload.grouped(frameBytes).zipWithIndex.map { case (b, i) => (i, b) }
  }

  val frameType: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType)))

  /** Every `everyN`th frame of each payload as its own row — the
    * frame-sampling stage of a video pipeline. Table-generating,
    * per-partition streaming (no payload is ever materialized twice),
    * and the sampled-out frames are dropped before any downstream
    * exchange — at 100 TB the post-sample data volume is 1/everyN of
    * the scan, which is the point.
    */
  def frameSample(df: DataFrame, idCol: String, payloadCol: String,
                  everyN: Int,
                  decoder: FrameDecoder = FixedSizeFrames(256)): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val spark = df.sparkSession
    val input = df.select(df(idCol).cast("long"), df(payloadCol))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        decoder.frames(r.getAs[Array[Byte]](1))
          .filter(_._1 % everyN == 0)
          .map { case (i, b) => Row(r.getLong(0), i, b) }
      }
    }
    spark.createDataFrame(rdd, frameType)
  }

  // --------------------------------------------------------------- resize

  /** Resize contract — the image-resize stage. [[StrideResizer]] is the
    * deterministic stand-in: byte subsampling at a fixed stride down to
    * w*h bytes (a real implementation decodes, scales, re-encodes).
    */
  trait Resizer extends Serializable {
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  object StrideResizer extends Resizer {
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = w * h
      if (payload.length <= target) payload
      else {
        val stride = payload.length.toDouble / target
        Array.tabulate(target)(i => payload((i * stride).toInt))
      }
    }
  }

  /** Payloads resized to (w, h) with refreshed metadata — batched per
    * partition like [[extractFeatures]]. Output: (doc_id, payload,
    * meta struct per [[mediaMetaType]]).
    */
  def resizeTo(df: DataFrame, idCol: String, payloadCol: String,
               w: Int, h: Int, resizer: Resizer = StrideResizer): DataFrame = {
    val spark = df.sparkSession
    val outType = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", mediaMetaType)))
    val input = df.select(df(idCol).cast("long"), df(payloadCol))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.map { r =>
        val out = resizer.resize(r.getAs[Array[Byte]](1), w, h)
        Row(r.getLong(0), out, Row("raw", w, h, out.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outType)
  }
}
