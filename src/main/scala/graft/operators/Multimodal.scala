package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal columns at pipeline scale (north-star operator): media
  * payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs as a BATCHED per-partition
  * stage, the Scala analog of `mapInPandas` — one decoder instance and
  * one batch buffer per partition, never per row.
  *
  * The PIXEL decode step is a STUB (this container has no image/audio
  * codecs): [[FakeDecoder]] derives deterministic pseudo-features from
  * the bytes. The Spark-side plumbing — schema, encoder, batching,
  * partition distribution — is the production shape; swapping in a JNI
  * decoder touches only [[MediaDecoder]]. CONTAINER-header decode is
  * real: [[parseImageHeader]]/[[imageHeaders]] read actual PNG IHDR
  * and JPEG SOF0/SOF2 headers (public formats, zero dependencies),
  * quarantining corrupt payloads instead of throwing.
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

  // -------------------------------------------------------- image headers

  /** Parsed container-header fields of an image payload. */
  final case class ImgHeader(format: String, width: Int, height: Int,
                             bitDepth: Int, channels: Int)

  val imageHeaderType: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("channels", IntegerType),
    StructField("ok", BooleanType)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private val pngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  private val pngChannels =
    Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)

  /** Pure-Scala parse of the REAL public image container headers — no
    * codec dependency, because only the header is read:
    *  - PNG (RFC 2083): 8-byte signature, then the IHDR chunk (width,
    *    height as BE32; bit depth; color type → channel count).
    *  - JPEG (ITU T.81): marker scan from SOI past tables/APPn segments
    *    to any start-of-frame marker SOF0–SOF15 (excluding DHT/JPG/DAC
    *    which share the 0xC* range) — covers baseline (SOF0) and
    *    progressive (SOF2); frame header carries precision, height,
    *    width, component count.
    * Returns None for anything truncated, corrupt, or neither format —
    * callers quarantine, never throw: at 100 TB some payloads WILL be
    * garbage and one bad row must not kill a stage.
    */
  def parseImageHeader(bytes: Array[Byte]): Option[ImgHeader] = {
    val n = bytes.length
    if (n >= 33 && bytes.take(8).sameElements(pngSig)) {
      // IHDR must be first: length(4) "IHDR"(4) data(13) crc(4)
      val isIhdr = be32(bytes, 8) == 13L &&
        bytes(12) == 'I' && bytes(13) == 'H' &&
        bytes(14) == 'D' && bytes(15) == 'R'
      if (!isIhdr) None
      else {
        val w = be32(bytes, 16)
        val h = be32(bytes, 20)
        val depth = bytes(24) & 0xFF
        val colorType = bytes(25) & 0xFF
        if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
            !Set(1, 2, 4, 8, 16).contains(depth) ||
            !pngChannels.contains(colorType)) None
        else Some(ImgHeader("png", w.toInt, h.toInt, depth,
          pngChannels(colorType)))
      }
    } else if (n >= 4 && (bytes(0) & 0xFF) == 0xFF &&
               (bytes(1) & 0xFF) == 0xD8) {
      var i = 2
      while (i + 1 < n) {
        if ((bytes(i) & 0xFF) != 0xFF) return None // lost marker sync
        var j = i + 1
        while (j < n && (bytes(j) & 0xFF) == 0xFF) j += 1 // fill bytes
        if (j >= n) return None
        val marker = bytes(j) & 0xFF
        if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD8)) {
          i = j + 1 // standalone: TEM / RSTn / SOI
        } else if (marker == 0xD9 || marker == 0xDA) {
          return None // EOI or SOS reached without a frame header
        } else {
          if (j + 2 >= n) return None
          val len = be16(bytes, j + 1)
          if (len < 2) return None
          val isSof = marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC
          if (isSof) {
            if (j + 8 >= n) return None // truncated frame header
            val precision = bytes(j + 3) & 0xFF
            val h = be16(bytes, j + 4)
            val w = be16(bytes, j + 6)
            val nc = bytes(j + 8) & 0xFF
            return if (w <= 0 || h <= 0 || nc <= 0) None
            else Some(ImgHeader("jpeg", w, h, precision, nc))
          }
          i = j + 1 + len
        }
      }
      None
    } else None
  }

  /** Container-header fields of (idCol: long, payloadCol: binary) as
    * real columns — batched per partition like [[extractFeatures]].
    * Unparseable payloads are QUARANTINED as (ok=false, null fields)
    * rows, never thrown: filter `ok` downstream, audit `!ok`.
    */
  def imageHeaders(df: DataFrame, idCol: String,
                   payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(df(idCol).cast("long"), df(payloadCol))
    val rdd = input.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        parseImageHeader(r.getAs[Array[Byte]](1)) match {
          case Some(hd) =>
            Row(id, hd.format, hd.width, hd.height, hd.bitDepth,
              hd.channels, true)
          case None => Row(id, null, null, null, null, null, false)
        }
      }
    }
    spark.createDataFrame(rdd, imageHeaderType)
  }

  /** Minimal VALID image payloads (the encode side of the public
    * formats above) — real signatures, chunk CRCs, marker segments; a
    * header-reading tool accepts them. Used by the oracle fixture
    * (encode→parse round-trip) and anywhere a placeholder payload must
    * still be format-valid.
    */
  object ImageBytes {
    private def u16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    private def u32(v: Long) = Array(((v >> 24) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

    /** PNG with a correct IHDR (+CRC) and an IEND chunk. */
    def png(w: Int, h: Int, bitDepth: Int = 8, colorType: Int = 2): Array[Byte] = {
      val ihdrData = "IHDR".getBytes("US-ASCII") ++ u32(w) ++ u32(h) ++
        Array(bitDepth.toByte, colorType.toByte, 0.toByte, 0.toByte, 0.toByte)
      val crc = new java.util.zip.CRC32
      crc.update(ihdrData)
      val iendType = "IEND".getBytes("US-ASCII")
      val iendCrc = new java.util.zip.CRC32
      iendCrc.update(iendType)
      pngSig ++ u32(13) ++ ihdrData ++ u32(crc.getValue) ++
        u32(0) ++ iendType ++ u32(iendCrc.getValue)
    }

    /** JPEG: SOI, JFIF APP0, SOF0 (baseline) or SOF2 (progressive)
      * frame header, EOI.
      */
    def jpeg(w: Int, h: Int, channels: Int = 3,
             progressive: Boolean = false): Array[Byte] = {
      val soi = Array(0xFF.toByte, 0xD8.toByte)
      val app0 = Array(0xFF.toByte, 0xE0.toByte) ++ u16(16) ++
        "JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      val sofMarker = if (progressive) 0xC2 else 0xC0
      val comps = (1 to channels).flatMap(c =>
        Seq(c.toByte, 0x11.toByte, 0.toByte)).toArray
      val sof = Array(0xFF.toByte, sofMarker.toByte) ++
        u16(8 + 3 * channels) ++ Array(8.toByte) ++ u16(h) ++ u16(w) ++
        Array(channels.toByte) ++ comps
      val eoi = Array(0xFF.toByte, 0xD9.toByte)
      soi ++ app0 ++ sof ++ eoi
    }
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
