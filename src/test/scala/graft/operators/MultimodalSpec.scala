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

  test("parseImageHeader: PNG / baseline JPEG / progressive JPEG round-trip") {
    val png = Multimodal.ImageBytes.png(640, 480)
    assert(Multimodal.parseImageHeader(png).contains(
      Multimodal.ImgHeader("png", 640, 480, 8, 3)))
    // grayscale+alpha, 16-bit
    val png16 = Multimodal.ImageBytes.png(3, 7, bitDepth = 16, colorType = 4)
    assert(Multimodal.parseImageHeader(png16).contains(
      Multimodal.ImgHeader("png", 3, 7, 16, 2)))
    val base = Multimodal.ImageBytes.jpeg(1920, 1080, channels = 3)
    assert(Multimodal.parseImageHeader(base).contains(
      Multimodal.ImgHeader("jpeg", 1920, 1080, 8, 3)))
    val prog = Multimodal.ImageBytes.jpeg(31, 17, channels = 1,
      progressive = true)
    assert(Multimodal.parseImageHeader(prog).contains(
      Multimodal.ImgHeader("jpeg", 31, 17, 8, 1)))
  }

  test("parseImageHeader: corrupt/truncated payloads return None, never throw") {
    val png = Multimodal.ImageBytes.png(640, 480)
    val jpg = Multimodal.ImageBytes.jpeg(640, 480)
    val bad = Seq(
      Array.empty[Byte],                       // empty
      Array[Byte](1, 2, 3),                    // garbage
      png.take(8),                             // PNG signature only
      png.take(20),                            // truncated inside IHDR
      jpg.take(2),                             // bare SOI
      jpg.take(6),                             // truncated inside APP0
      jpg.takeWhile(_ != 0xC0.toByte),         // SOI+APP0, no SOF
      Array.fill(64)(0xFF.toByte),             // marker soup
      {                                        // PNG sig + wrong chunk
        val b = png.clone(); b(12) = 'X'.toByte; b
      })
    bad.foreach { b =>
      assert(Multimodal.parseImageHeader(b).isEmpty,
        s"accepted corrupt payload of ${b.length} bytes")
    }
  }

  test("parseImageHeader: GIF and BMP round-trip") {
    assert(Multimodal.parseImageHeader(Multimodal.ImageBytes.gif(320, 200))
      .contains(Multimodal.ImgHeader("gif", 320, 200, 8, 3)))
    assert(Multimodal.parseImageHeader(Multimodal.ImageBytes.bmp(64, 48))
      .contains(Multimodal.ImgHeader("bmp", 64, 48, 24, 3)))
    assert(Multimodal.parseImageHeader(
        Multimodal.ImageBytes.bmp(10, 20, bitCount = 8))
      .contains(Multimodal.ImgHeader("bmp", 10, 20, 8, 1)))
    // truncated variants quarantine
    assert(Multimodal.parseImageHeader(
      Multimodal.ImageBytes.gif(320, 200).take(6)).isEmpty)
    assert(Multimodal.parseImageHeader(
      Multimodal.ImageBytes.bmp(64, 48).take(20)).isEmpty)
  }

  test("parseWavHeader: round-trip, chunk walk, corrupt quarantine") {
    val w = Multimodal.AudioBytes.wav(2, 44100, 16, 1000L)
    assert(Multimodal.parseWavHeader(w).contains(
      Multimodal.WavHeader(2, 44100, 16, Some(1000L))))
    val mono8 = Multimodal.AudioBytes.wav(1, 8000, 8, 997L)
    assert(Multimodal.parseWavHeader(mono8).contains(
      Multimodal.WavHeader(1, 8000, 8, Some(997L))))
    // truncated / corrupt / non-wav
    assert(Multimodal.parseWavHeader(w.take(10)).isEmpty)
    assert(Multimodal.parseWavHeader(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseWavHeader(
      Multimodal.ImageBytes.png(2, 2)).isEmpty)
    // fmt chunk truncated mid-body
    assert(Multimodal.parseWavHeader(w.take(20)).isEmpty)
    // bad bits-per-sample rejected
    val broken = w.clone(); broken(34) = 7 // bits field low byte
    assert(Multimodal.parseWavHeader(broken).isEmpty)
  }

  test("parseMp4Header: box walk round-trip, corrupt quarantine") {
    val v = Multimodal.VideoBytes.mp4(timescale = 30000, duration = 90000L)
    assert(Multimodal.parseMp4Header(v).contains(
      Multimodal.Mp4Header(30000, 90000L, 3000L)))
    // integer-ms truncation: 1001/1000 s -> 1001 ms at ts=1000
    assert(Multimodal.parseMp4Header(
        Multimodal.VideoBytes.mp4(1000, 1001L))
      .contains(Multimodal.Mp4Header(1000, 1001L, 1001L)))
    // truncated / corrupt / non-mp4
    assert(Multimodal.parseMp4Header(v.take(5)).isEmpty)
    assert(Multimodal.parseMp4Header(v.take(30)).isEmpty) // no moov yet
    assert(Multimodal.parseMp4Header(Array.empty[Byte]).isEmpty)
    assert(Multimodal.parseMp4Header(
      Multimodal.AudioBytes.wav(1, 8000, 8, 4L)).isEmpty)
    // corrupted box size must not loop or throw
    val broken = v.clone(); broken(0) = 0x7F.toByte
    assert(Multimodal.parseMp4Header(broken).isEmpty)
  }

  test("adversarial sizes and NULL payloads quarantine, never crash") {
    def le32b(v: Long) = Array[Byte]((v & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 24) & 0xFF).toByte)
    // WAV chunk declaring a size near Int.MaxValue: the cursor must
    // walk past the end, not overflow Int into a negative index
    val evilWav = "RIFF".getBytes("US-ASCII") ++ le32b(100L) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      le32b(0x7FFFFFF0L) ++ new Array[Byte](8)
    assert(Multimodal.parseWavHeader(evilWav).isEmpty)
    // MP4 box with a huge declared size: bounds-checked walk
    val evilMp4 = le32b(0).reverse ++ "ftyp".getBytes("US-ASCII") ++
      new Array[Byte](4)
    assert(Multimodal.parseMp4Header(evilMp4).isEmpty)
    // NULL payloads quarantine as ok=false in all three operators
    val rows = Seq(
      (1L, Option(Multimodal.ImageBytes.png(4, 4))),
      (2L, Option.empty[Array[Byte]]))
      .toDF("doc_id", "payload")
    assert(Multimodal.imageHeaders(rows, "doc_id", "payload")
      .filter($"ok").count() == 1)
    assert(Multimodal.audioHeaders(rows, "doc_id", "payload")
      .filter(!$"ok").count() == 2) // png is not wav; null quarantines
    assert(Multimodal.videoHeaders(rows, "doc_id", "payload")
      .filter(!$"ok").count() == 2)
  }

  test("audioHeaders quarantines corrupt rows as ok=false") {
    val rows = Seq(
      (1L, Multimodal.AudioBytes.wav(1, 16000, 16, 10L)),
      (2L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = Multimodal.audioHeaders(rows, "doc_id", "payload")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[String]("format") == "wav" &&
      out(0).getAs[Int]("sample_rate") == 16000 &&
      out(0).getAs[Long]("n_samples") == 10L &&
      out(0).getAs[Boolean]("ok"))
    assert(!out(1).getAs[Boolean]("ok") && out(1).isNullAt(1))
  }

  test("imageHeaders quarantines corrupt rows as ok=false") {
    val rows = Seq(
      (1L, Multimodal.ImageBytes.png(12, 34)),
      (2L, Multimodal.ImageBytes.jpeg(56, 78)),
      (3L, Array[Byte](9, 9, 9)))
      .toDF("doc_id", "payload")
    val out = Multimodal.imageHeaders(rows, "doc_id", "payload")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[String]("format") == "png" &&
      out(0).getAs[Int]("width") == 12 && out(0).getAs[Boolean]("ok"))
    assert(out(1).getAs[String]("format") == "jpeg" &&
      out(1).getAs[Int]("height") == 78 && out(1).getAs[Boolean]("ok"))
    assert(!out(2).getAs[Boolean]("ok") && out(2).isNullAt(1))
  }

  test("parsePngPixels: encode-decode round trip, all filters and color types") {
    // ≥5 rows exercises every filter (pngFull stamps filter y % 5)
    for (ch <- Seq(1, 2, 3, 4); (w, h) <- Seq((7, 9), (1, 6), (13, 5))) {
      def px(x: Int, y: Int, c: Int): Int = (x * 7 + y * 13 + c * 31 + 5) % 256
      val bytes = Multimodal.ImageBytes.pngFull(w, h, ch, px)
      val st = Multimodal.parsePngPixels(bytes).getOrElse(
        fail(s"decode failed for ch=$ch ${w}x$h"))
      assert(st.width == w && st.height == h && st.channels == ch)
      assert(st.nPx == w.toLong * h)
      // direct recomputation of the expected stats, no PNG involved
      val vals = for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        yield px(x, y, c)
      assert(st.sumV == vals.map(_.toLong).sum, s"ch=$ch ${w}x$h")
      assert(st.sumSqV == vals.map(v => v.toLong * v).sum)
      assert(st.minV == vals.min && st.maxV == vals.max)
      for (c <- 0 until ch) {
        val cv = for (y <- 0 until h; x <- 0 until w) yield px(x, y, c)
        assert(st.chSum(c) == cv.map(_.toLong).sum)
        assert(st.chSumSq(c) == cv.map(v => v.toLong * v).sum)
      }
      assert(!st.allBlack && !st.allWhite)
    }
    // all-black / all-white detection
    val black = Multimodal.parsePngPixels(
      Multimodal.ImageBytes.pngFull(6, 6, 3, (_, _, _) => 0)).get
    assert(black.allBlack && !black.allWhite && black.sumV == 0)
    val white = Multimodal.parsePngPixels(
      Multimodal.ImageBytes.pngFull(6, 6, 1, (_, _, _) => 255)).get
    assert(white.allWhite && !white.allBlack &&
      white.sumV == 36L * 255)
  }

  test("parsePngPixels: corrupt, adversarial, and unsupported inputs quarantine") {
    val good = Multimodal.ImageBytes.pngFull(9, 7, 3,
      (x, y, c) => x + y + c)
    assert(Multimodal.parsePngPixels(good).nonEmpty)
    // truncated anywhere: mid-IDAT, mid-IEND, mid-signature
    for (cut <- Seq(4, 20, good.length / 2, good.length - 3))
      assert(Multimodal.parsePngPixels(good.take(cut)).isEmpty,
        s"cut=$cut parsed")
    // one flipped IDAT byte: the chunk CRC catches it
    val flip = good.clone()
    flip(45) = (flip(45) ^ 0x5A).toByte
    assert(Multimodal.parsePngPixels(flip).isEmpty)
    // forged IHDR claiming absurd dims must quarantine WITHOUT
    // allocating (maxPixels guard precedes allocation); re-CRC the
    // forged chunk so only the size guard can reject it
    val forged = good.clone()
    // width bytes at offset 16 (BE32): claim 2^30
    forged(16) = 0x40.toByte; forged(17) = 0; forged(18) = 0; forged(19) = 0
    val crc = new java.util.zip.CRC32
    crc.update(forged, 12, 4 + 13)
    val cv = crc.getValue
    forged(29) = ((cv >> 24) & 0xFF).toByte
    forged(30) = ((cv >> 16) & 0xFF).toByte
    forged(31) = ((cv >> 8) & 0xFF).toByte
    forged(32) = (cv & 0xFF).toByte
    assert(Multimodal.parsePngPixels(forged).isEmpty)
    // header-only PNG (no IDAT rows): stream ends short -> quarantine
    assert(Multimodal.parsePngPixels(
      Multimodal.ImageBytes.png(5, 5)).isEmpty)
    // non-PNG bytes and NULL-ish input
    assert(Multimodal.parsePngPixels(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parsePngPixels(Array.emptyByteArray).isEmpty)
  }

  test("pngPixelStats: typed operator quarantines corrupt rows; stats match") {
    val ok1 = Multimodal.ImageBytes.pngFull(4, 6, 3, (x, y, c) => x + 10 * c)
    val ok2 = Multimodal.ImageBytes.pngFull(3, 3, 1, (_, _, _) => 255)
    val rows = Seq((1L, ok1), (2L, ok2),
      (3L, ok1.take(30)), (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.pngPixelStats(rows, "doc_id", "payload")
      .orderBy($"doc_id").collect()
    assert(out(0).getAs[Boolean]("ok") &&
      out(0).getAs[Int]("width") == 4 &&
      out(0).getAs[Long]("n_px") == 24L)
    val exp1 = (for (y <- 0 until 6; x <- 0 until 4; c <- 0 until 3)
      yield (x + 10 * c).toLong).sum
    assert(out(0).getAs[Long]("sum_v") == exp1)
    assert(out(1).getAs[Boolean]("ok") &&
      out(1).getAs[Boolean]("all_white"))
    assert(!out(2).getAs[Boolean]("ok") && out(2).isNullAt(1))
    assert(!out(3).getAs[Boolean]("ok"))
    // per-channel arrays carried for the downstream quality filters
    assert(out(0).getAs[scala.collection.Seq[Long]]("ch_sum").length == 3)
  }


  test("parseWavPcm: exact stats round-trip against a driver brute force") {
    val ch = 2; val frames = 37
    def sample(f: Int, c: Int): Int = ((f * 31 + c * 17 + 5) % 65536) - 32768
    val bytes = Multimodal.AudioBytes.wavPcm(ch, 8000, frames, sample)
    val st = Multimodal.parseWavPcm(bytes).get
    val vs = for (f <- 0 until frames; c <- 0 until ch) yield sample(f, c)
    assert(st.channels == ch && st.sampleRate == 8000)
    assert(st.nSamples == vs.size.toLong)
    assert(st.sumS == vs.map(_.toLong).sum)
    assert(st.sumSqS == vs.map(v => v.toLong * v).sum)
    assert(st.minS == vs.min && st.maxS == vs.max)
    assert(st.nClipped ==
      vs.count(v => v == 32767 || v == -32768).toLong)
    // full-scale rails register as clipping
    val railed = Multimodal.AudioBytes.wavPcm(1, 8000, 4,
      (f, _) => if (f % 2 == 0) 32767 else -32768)
    assert(Multimodal.parseWavPcm(railed).get.nClipped == 4L)
  }

  test("parseWavPcm: truncation, non-PCM, wrong depth, size cap quarantine") {
    val good = Multimodal.AudioBytes.wavPcm(1, 8000, 20, (f, _) => f)
    assert(Multimodal.parseWavPcm(good).isDefined)
    // data chunk overruns the payload: partial stats must NOT be returned
    assert(Multimodal.parseWavPcm(good.take(good.length - 2)).isEmpty)
    // zero-fill 8-bit wav (wrong depth for the PCM16 decoder)
    assert(Multimodal.parseWavPcm(
      Multimodal.AudioBytes.wav(1, 8000, 8, 20)).isEmpty)
    // zero-length data
    assert(Multimodal.parseWavPcm(
      Multimodal.AudioBytes.wavPcm(1, 8000, 0, (_, _) => 0)).isEmpty)
    // adversarial declared size is rejected before any pass
    assert(Multimodal.parseWavPcm(good, maxSamples = 10).isEmpty)
    // non-WAV bytes and NULL-ish short arrays
    assert(Multimodal.parseWavPcm(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.parseWavPcm("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("wavPcmStats: typed operator quarantines corrupt rows; stats match") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0L until 30L).map { id =>
      val full = Multimodal.AudioBytes.wavPcm((id % 2 + 1).toInt, 8000,
        (id % 5 + 1).toInt, (f, c) => ((id * 7 + f * 3 + c) % 100).toInt)
      Row(id, if (id % 9 == 0) full.take(full.length - 4) else full)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("payload", BinaryType))))
    val got = Multimodal.wavPcmStats(df, "doc_id", "payload").collect()
    assert(got.length == 30)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id % 9 == 0) {
        assert(!r.getAs[Boolean]("ok") && r.isNullAt(r.fieldIndex("sum_s")))
      } else {
        assert(r.getAs[Boolean]("ok"))
        assert(r.getAs[Long]("n_samples") == (id % 2 + 1) * (id % 5 + 1))
        val vs = for (f <- 0 until (id % 5 + 1).toInt;
                      c <- 0 until (id % 2 + 1).toInt)
          yield ((id * 7 + f * 3 + c) % 100).toInt
        assert(r.getAs[Long]("sum_s") == vs.map(_.toLong).sum)
        assert(r.getAs[Int]("min_s") == vs.min)
      }
    }
  }


  test("parsePngPixels: forged IHDR dims that overflow Long quarantine") {
    // width = height = 0xF0000000: the dim PRODUCT wraps Long negative;
    // a bare product guard would pass and crash the allocation
    val good = Multimodal.ImageBytes.pngFull(2, 2, 3,
      (x, y, c) => (x + y + c) % 256)
    // splice forged BE32 dims into the IHDR (offset 16: width, 20:
    // height) and fix nothing else — CRC now wrong, which is ALSO a
    // quarantine path; craft with correct CRC via pngFull internals
    // being unavailable, so instead check the guard directly at the
    // API level with a structurally-valid-but-huge header built from
    // the real encoder at the largest craftable size
    val forged = good.clone()
    def put32(at: Int, v: Long): Unit = {
      forged(at) = ((v >> 24) & 0xFF).toByte
      forged(at + 1) = ((v >> 16) & 0xFF).toByte
      forged(at + 2) = ((v >> 8) & 0xFF).toByte
      forged(at + 3) = (v & 0xFF).toByte
    }
    put32(16, 0xF0000000L); put32(20, 0xF0000000L)
    // recompute the IHDR CRC so the SIZE GUARD (not the CRC check) is
    // the line that rejects — the overflow would hide behind a bad CRC
    val crc = new java.util.zip.CRC32()
    crc.update(forged, 12, 17) // chunk type + 13 data bytes
    put32(29, crc.getValue)
    assert(Multimodal.parsePngPixels(forged).isEmpty) // never throws
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

  private def hamming64(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("parsePngDHash: identity, brightness invariance, noise locality") {
    // a smooth gradient image, values kept in [20, 200] so a +40
    // brightness shift cannot wrap mod 256
    def base(x: Int, y: Int, c: Int): Int =
      20 + (x * 7 + y * 11 + c * 3) % 180
    val img = Multimodal.ImageBytes.pngFull(40, 30, 3, base)
    val Some((w, h, h0)) = Multimodal.parsePngDHash(img)
    assert((w, h) == (40, 30))
    // identical bytes -> identical hash
    assert(Multimodal.parsePngDHash(
      Multimodal.ImageBytes.pngFull(40, 30, 3, base)).get._3 == h0)
    // uniform brightness shift -> SAME hash (gradient signs unchanged)
    val brighter = Multimodal.ImageBytes.pngFull(40, 30, 3,
      (x, y, c) => base(x, y, c) + 40)
    assert(Multimodal.parsePngDHash(brighter).get._3 == h0,
      "dHash must be brightness-shift invariant")
    // a few corrupted pixels -> small Hamming distance
    val noisy = Multimodal.ImageBytes.pngFull(40, 30, 3,
      (x, y, c) => if (x == 5 && y == 7) 255 else base(x, y, c))
    val hn = Multimodal.parsePngDHash(noisy).get._3
    assert(hamming64(h0, hn) <= 6,
      s"single-pixel noise moved ${hamming64(h0, hn)} bits")
    // a genuinely different image -> far hash
    val other = Multimodal.ImageBytes.pngFull(40, 30, 3,
      (x, y, c) => 20 + (x * 13 + (y % 3) * 91 + c) % 180)
    assert(hamming64(h0, Multimodal.parsePngDHash(other).get._3) > 12,
      "different image hashed too close")
    // gray path replicates channels
    val gray = Multimodal.ImageBytes.pngFull(40, 30, 1,
      (x, y, _) => 20 + (x * 7 + y * 11) % 180)
    assert(Multimodal.parsePngDHash(gray).isDefined)
    // truncated quarantines
    assert(Multimodal.parsePngDHash(img.take(img.length - 8)).isEmpty)
  }

  test("pngDHash feeds simhashPairs: near-dup images pair, others do not") {
    def base(x: Int, y: Int, c: Int): Int =
      20 + (x * 7 + y * 11 + c * 3) % 180
    val imgs = Seq(
      (1L, Multimodal.ImageBytes.pngFull(40, 30, 3, base)),
      (2L, Multimodal.ImageBytes.pngFull(40, 30, 3,
        (x, y, c) => base(x, y, c) + 30)), // brightness twin of 1
      (3L, Multimodal.ImageBytes.pngFull(40, 30, 3,
        (x, y, c) => if (x == 11 && y == 3) 0 else base(x, y, c))),
      (4L, Multimodal.ImageBytes.pngFull(40, 30, 3,
        (x, y, c) => 20 + (x * 13 + (y % 3) * 91 + c) % 180)),
      (5L, Array[Byte](1, 2, 3)) // corrupt: excluded by ok filter
    ).toDF("doc_id", "payload")
    val sigs = Multimodal.pngDHash(imgs, "doc_id", "payload")
      .filter($"ok").select($"doc_id", $"dhash")
    val pairs = Dedup.simhashPairs(sigs, "doc_id", "dhash",
        maxDist = 3, bands = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)),
      s"near-dup images not paired: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"distinct image paired: $pairs")
  }

  test("parseWavEnvelopeHash: identity, gain invariance, noise locality") {
    // a wrapping multi-tone-ish integer signal, headroom for 2x gain
    def sig(f: Int, c: Int): Int =
      ((f * 37 + c * 11) * 97) % 8192 - 4096
    val a = Multimodal.AudioBytes.wavPcm(2, 8000, 400, sig)
    val Some((ch, nf, h0)) = Multimodal.parseWavEnvelopeHash(a)
    assert((ch, nf) == (2, 400L))
    assert(Multimodal.parseWavEnvelopeHash(
      Multimodal.AudioBytes.wavPcm(2, 8000, 400, sig)).get._3 == h0)
    // exact 2x gain -> SAME hash (every comparison scales together)
    val louder = Multimodal.AudioBytes.wavPcm(2, 8000, 400,
      (f, c) => 2 * sig(f, c))
    assert(Multimodal.parseWavEnvelopeHash(louder).get._3 == h0,
      "envelope hash must be gain invariant")
    // a short corrupted burst -> small Hamming distance
    val noisy = Multimodal.AudioBytes.wavPcm(2, 8000, 400,
      (f, c) => if (f >= 100 && f < 106) 4000 else sig(f, c))
    val hn = Multimodal.parseWavEnvelopeHash(noisy).get._3
    assert(hamming64(h0, hn) <= 6,
      s"6-frame burst moved ${hamming64(h0, hn)} bits")
    // a different signal -> far hash
    val other = Multimodal.AudioBytes.wavPcm(2, 8000, 400,
      (f, c) => ((f * 53 + c * 29) * 71) % 8192 - 4096)
    assert(hamming64(h0,
      Multimodal.parseWavEnvelopeHash(other).get._3) > 12)
    // fewer frames than windows still hashes deterministically
    val tiny = Multimodal.AudioBytes.wavPcm(1, 8000, 7, sig)
    assert(Multimodal.parseWavEnvelopeHash(tiny).isDefined)
    // truncation quarantines
    assert(Multimodal.parseWavEnvelopeHash(a.take(a.length - 8)).isEmpty)
  }

  test("parsePngBorders: planted letterbox widths measured exactly") {
    def mk(w: Int, h: Int, top: Int, bot: Int, lef: Int, rig: Int) =
      Multimodal.ImageBytes.pngFull(w, h, 3, (x, y, c) =>
        if (y < top || y >= h - bot || x < lef || x >= w - rig) 0
        else 20 + (x * 7 + y * 11 + c) % 200)
    assert(Multimodal.parsePngBorders(mk(20, 16, 2, 3, 4, 1)).get
      == ((20, 16, 2L, 3L, 4L, 1L)))
    // no borders at all
    assert(Multimodal.parsePngBorders(mk(20, 16, 0, 0, 0, 0)).get
      == ((20, 16, 0L, 0L, 0L, 0L)))
    // an entirely uniform image: full-height runs, full-width left
    val flat = Multimodal.ImageBytes.pngFull(9, 7, 3, (_, _, _) => 5)
    assert(Multimodal.parsePngBorders(flat).get
      == ((9, 7, 7L, 7L, 9L, 0L)))
    // a COLORED bar (r!=g) is not monochrome-uniform -> no border
    val colored = Multimodal.ImageBytes.pngFull(12, 10, 3, (x, y, c) =>
      if (y < 2) (if (c == 0) 200 else 0)
      else 20 + (x * 7 + y * 11 + c) % 200)
    assert(Multimodal.parsePngBorders(colored).get._3 == 0L)
    // truncation quarantines
    val g = mk(20, 16, 2, 3, 4, 1)
    assert(Multimodal.parsePngBorders(g.take(g.length - 8)).isEmpty)
  }

  test("parseWavSilenceRuns: run accounting on planted silence") {
    // 100 frames: silence in [10,30) and [50,90), loud elsewhere
    def sig(f: Int, c: Int): Int =
      if ((f >= 10 && f < 30) || (f >= 50 && f < 90)) c // sub-threshold
      else 5000 + c
    val a = Multimodal.AudioBytes.wavPcm(2, 8000, 100, sig)
    // both runs qualify at minRun 10: lengths 20 and 40
    assert(Multimodal.parseWavSilenceRuns(a, 100, 10L).get
      == ((2L, 40L, 60L)))
    // minRun 25: only the 40-frame run counts
    assert(Multimodal.parseWavSilenceRuns(a, 100, 25L).get
      == ((1L, 40L, 40L)))
    // a run touching the END of the stream closes correctly
    val tail = Multimodal.AudioBytes.wavPcm(1, 8000, 50,
      (f, _) => if (f >= 35) 0 else 9999)
    assert(Multimodal.parseWavSilenceRuns(tail, 100, 10L).get
      == ((1L, 15L, 15L)))
    // all-loud: zero runs; truncation quarantines; loud envelopes
    val loud = Multimodal.AudioBytes.wavPcm(1, 8000, 50,
      (_, _) => 9999)
    assert(Multimodal.parseWavSilenceRuns(loud, 100, 1L).get
      == ((0L, 0L, 0L)))
    assert(Multimodal.parseWavSilenceRuns(a.take(a.length - 8), 100,
      10L).isEmpty)
    intercept[IllegalArgumentException] {
      Multimodal.parseWavSilenceRuns(a, 0, 10L)
    }
    intercept[IllegalArgumentException] {
      Multimodal.parseWavSilenceRuns(a, 100, 0L)
    }
  }

  test("wavEnvelopeHash quarantines corrupt rows; near-dup audio pairs") {
    def sig(f: Int, c: Int): Int =
      ((f * 37 + c * 11) * 97) % 8192 - 4096
    val rows = Seq(
      (1L, Multimodal.AudioBytes.wavPcm(2, 8000, 400, sig)),
      (2L, Multimodal.AudioBytes.wavPcm(2, 8000, 400,
        (f, c) => 3 * sig(f, c))), // gain twin
      (3L, Multimodal.AudioBytes.wavPcm(2, 8000, 400,
        (f, c) => ((f * 53 + c * 29) * 71) % 8192 - 4096)),
      (4L, Array[Byte](9, 9, 9))
    ).toDF("doc_id", "payload")
    val out = Multimodal.wavEnvelopeHash(rows, "doc_id", "payload")
    assert(out.filter(!$"ok").select($"doc_id").as[Long].collect()
      .toSeq == Seq(4L))
    val pairs = Dedup.simhashPairs(
        out.filter($"ok").select($"doc_id", $"ehash"),
        "doc_id", "ehash", maxDist = 3, bands = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"expected only the gain twin: $pairs")
  }
}
