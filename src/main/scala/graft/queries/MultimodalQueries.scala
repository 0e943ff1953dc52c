package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.operators.Multimodal

/** Multimodal-column coverage: payloads as opaque binary + batched
  * per-partition decode (north-star). The decode stub is deterministic
  * (md5/length), so the batch plumbing itself is oracle-checkable.
  */
object MultimodalQueries {

  /** q27 — binary payload -> batched feature extraction (mapPartitions,
    * one decoder per partition). Entropy/histogram are spec-verified;
    * the oracle checks the byte-exact features.
    */
  private val q27 = Q("q27_multimodal_features",
    (s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.extractFeatures(media, "doc_id", "payload")
        .select(col("doc_id"), col("n_bytes"), col("checksum"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes,
      MD5(text) AS checksum FROM documents ORDER BY doc_id"""))

  /** q39 — frame sampling: every 3rd fixed-size frame of each payload
    * as its own row (the video frame-sample shape; decode is the
    * declared deterministic stub). The oracle replays the byte slicing
    * over the hex encoding (DuckDB 1.0 has no BLOB substring/md5, so
    * both engines fingerprint the lowercase hex of the frame).
    */
  private val q39 = Q("q39_multimodal_framesample",
    (s, dir) => {
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.frameSample(media, "doc_id", "payload", everyN = 3)
        .select(col("doc_id"),
          col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame")).cast("long").as("n_bytes"),
          md5(lower(hex(col("frame")))).as("frame_md5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some("""WITH d AS (SELECT doc_id, LOWER(hex(ENCODE(text))) AS hx
        FROM documents),
      f AS (SELECT doc_id,
          UNNEST(RANGE(CAST(CEIL(LENGTH(hx) / 512.0) AS BIGINT)))
            AS frame_idx, hx
        FROM d)
      SELECT doc_id, frame_idx,
        CAST(LENGTH(SUBSTRING(hx, CAST(frame_idx * 512 + 1 AS BIGINT),
          512)) / 2 AS BIGINT) AS n_bytes,
        MD5(SUBSTRING(hx, CAST(frame_idx * 512 + 1 AS BIGINT), 512))
          AS frame_md5
      FROM f WHERE frame_idx % 3 = 0 ORDER BY doc_id, frame_idx"""))

  /** q78 — REAL image-container header decode (round 7): a
    * deterministic encode→parse round-trip. Payloads are minimal VALID
    * PNG / baseline-JPEG / progressive-JPEG / GIF / BMP bytes built
    * per doc_id ([[graft.operators.Multimodal.ImageBytes]] — real
    * signatures, IHDR CRC, SOF marker segments, screen descriptors,
    * DIB headers), with every 11th payload truncated to 6 bytes;
    * [[graft.operators.Multimodal.imageHeaders]] parses the actual
    * bytes back and quarantines the corrupt rows as ok=false. The
    * oracle replays the construction arithmetic analytically, so the
    * gate verifies the whole byte-level round trip.
    */
  private val q78 = Q("q78_image_headers",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val w = (id % 509 + 1).toInt
        val h = (id % 331 + 1).toInt
        val full = (id % 5) match {
          case 0 => Multimodal.ImageBytes.png(w, h)
          case 1 => Multimodal.ImageBytes.jpeg(w, h, channels = 3)
          case 2 => Multimodal.ImageBytes.jpeg(w, h, channels = 1,
            progressive = true)
          case 3 => Multimodal.ImageBytes.gif(w, h)
          case _ => Multimodal.ImageBytes.bmp(w, h)
        }
        Row(id, if (id % 11 == 0) full.take(6) else full)
      }), payloadType)
      Multimodal.imageHeaders(payloads, "doc_id", "payload")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE WHEN doc_id % 11 = 0 THEN NULL
             WHEN doc_id % 5 = 0 THEN 'png'
             WHEN doc_id % 5 = 3 THEN 'gif'
             WHEN doc_id % 5 = 4 THEN 'bmp'
             ELSE 'jpeg' END AS format,
        CASE WHEN doc_id % 11 = 0 THEN NULL
             ELSE CAST(doc_id % 509 + 1 AS INT) END AS width,
        CASE WHEN doc_id % 11 = 0 THEN NULL
             ELSE CAST(doc_id % 331 + 1 AS INT) END AS height,
        CASE WHEN doc_id % 11 = 0 THEN NULL
             WHEN doc_id % 5 = 4 THEN CAST(24 AS INT)
             ELSE CAST(8 AS INT) END AS bit_depth,
        CASE WHEN doc_id % 11 = 0 THEN NULL
             WHEN doc_id % 5 = 2 THEN CAST(1 AS INT)
             ELSE CAST(3 AS INT) END AS channels,
        doc_id % 11 <> 0 AS ok
      FROM documents ORDER BY doc_id"""))

  /** q79 — REAL WAV audio-header decode
    * ([[graft.operators.Multimodal.parseWavHeader]]): the audio twin of
    * q78, same encode→parse round-trip discipline — valid RIFF/WAVE
    * bytes with a correct `fmt ` chunk and a sized `data` chunk built
    * per doc_id, every 13th payload truncated inside the RIFF header;
    * the parser walks the chunk list and the oracle replays the
    * construction analytically.
    */
  private val q79 = Q("q79_audio_headers",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val full = Multimodal.AudioBytes.wav(
          channels = (id % 2 + 1).toInt,
          sampleRate = (8000 * (id % 5 + 1)).toInt,
          bits = if (id % 3 == 0) 8 else 16,
          nSamples = id % 997 + 1)
        Row(id, if (id % 13 == 0) full.take(10) else full)
      }), payloadType)
      Multimodal.audioHeaders(payloads, "doc_id", "payload")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE WHEN doc_id % 13 = 0 THEN NULL ELSE 'wav' END AS format,
        CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE CAST(doc_id % 2 + 1 AS INT) END AS channels,
        CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE CAST(8000 * (doc_id % 5 + 1) AS INT) END AS sample_rate,
        CASE WHEN doc_id % 13 = 0 THEN NULL
             WHEN doc_id % 3 = 0 THEN CAST(8 AS INT)
             ELSE CAST(16 AS INT) END AS bit_depth,
        CASE WHEN doc_id % 13 = 0 THEN NULL
             ELSE CAST(doc_id % 997 + 1 AS BIGINT) END AS n_samples,
        doc_id % 13 <> 0 AS ok
      FROM documents ORDER BY doc_id"""))

  /** q80 — REAL MP4 movie-header decode
    * ([[graft.operators.Multimodal.parseMp4Header]]): the video leg of
    * the container-header family. Valid ISO-BMFF bytes (ftyp + moov/
    * mvhd v0) built per doc_id, every 9th payload truncated inside the
    * ftyp box; the parser walks the box tree and the oracle replays
    * the arithmetic — duration_ms = duration·1000 // timescale is
    * exact integer division on both engines.
    */
  private val q80 = Q("q80_video_headers",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val full = Multimodal.VideoBytes.mp4(
          timescale = (1000 * (id % 4 + 1)).toInt,
          duration = id % 100000 + 1)
        Row(id, if (id % 9 == 0) full.take(5) else full)
      }), payloadType)
      Multimodal.videoHeaders(payloads, "doc_id", "payload")
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE WHEN doc_id % 9 = 0 THEN NULL ELSE 'mp4' END AS format,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(1000 * (doc_id % 4 + 1) AS INT) END AS timescale,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(doc_id % 100000 + 1 AS BIGINT) END AS duration,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(((doc_id % 100000 + 1) * 1000)
               // (1000 * (doc_id % 4 + 1)) AS BIGINT) END AS duration_ms,
        doc_id % 9 <> 0 AS ok
      FROM documents ORDER BY doc_id"""))

  /** q106 — REAL PNG PIXEL decode (round 8,
    * [[graft.operators.Multimodal.parsePngPixels]]): the
    * encode→decode round trip now covers the full pixel path —
    * per-doc payloads are COMPLETE depth-8 RGB PNGs
    * ([[graft.operators.Multimodal.ImageBytes.pngFull]]: real
    * filtered scanlines cycling all five PNG filters, zlib IDAT,
    * correct CRCs), dims `(doc_id % 13 + 1) × (doc_id % 11 + 1)`,
    * sample value `(x + 2y + 3c + doc_id) % 256`; every 9th payload
    * is truncated (IEND chopped) and must quarantine. The decoder
    * inflates, DEFILTERS (Sub/Up/Average/Paeth reconstruction), and
    * accumulates exact-long pixel statistics; the oracle recomputes
    * the expected sums analytically by enumerating the (small) pixel
    * grid in SQL — any inflate/defilter/accounting bug shifts the
    * sums and fails the hash.
    */
  private val q106 = Q("q106_png_pixel_stats",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val w = (id % 13 + 1).toInt
        val h = (id % 11 + 1).toInt
        val full = Multimodal.ImageBytes.pngFull(w, h, channels = 3,
          (x, y, c) => ((x + 2L * y + 3L * c + id) % 256).toInt)
        Row(id, if (id % 9 == 0) full.take(full.length - 8) else full)
      }), payloadType)
      Multimodal.pngPixelStats(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("width"), col("height"),
          col("channels"), col("n_px"), col("sum_v"), col("sumsq_v"),
          col("min_v"), col("max_v"), col("all_black"),
          col("all_white"), col("ok"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
          CAST(doc_id % 13 + 1 AS BIGINT) AS w,
          CAST(doc_id % 11 + 1 AS BIGINT) AS h FROM documents),
      xs AS (SELECT doc_id, w, h, UNNEST(RANGE(w)) AS x FROM d),
      ys AS (SELECT doc_id, w, h, x, UNNEST(RANGE(h)) AS y FROM xs),
      pc AS (SELECT doc_id, w, h, x, y, UNNEST(RANGE(3)) AS c FROM ys),
      v AS (SELECT doc_id, w, h,
          (x + 2*y + 3*c + doc_id) % 256 AS v FROM pc),
      st AS (SELECT doc_id, MIN(w) AS w, MIN(h) AS h,
          SUM(v) AS sum_v, SUM(v*v) AS sumsq_v,
          MIN(v) AS min_v, MAX(v) AS max_v
        FROM v GROUP BY doc_id)
      SELECT doc_id,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(w AS INT) END AS width,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(h AS INT) END AS height,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(3 AS INT) END AS channels,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(w * h AS BIGINT) END AS n_px,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(sum_v AS BIGINT) END AS sum_v,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(sumsq_v AS BIGINT) END AS sumsq_v,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(min_v AS INT) END AS min_v,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(max_v AS INT) END AS max_v,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE max_v = 0 END AS all_black,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE min_v = 255 END AS all_white,
        doc_id % 9 <> 0 AS ok
      FROM st ORDER BY doc_id"""))

  /** q109 — REAL 16-bit PCM WAV sample decode (round 8,
    * [[graft.operators.Multimodal.parseWavPcm]]): the audio member of
    * the real-decode family — per-doc payloads are COMPLETE PCM WAVs
    * ([[graft.operators.Multimodal.AudioBytes.wavPcm]]: interleaved
    * little-endian samples, correct RIFF/fmt/data chunks), channels
    * `doc_id % 2 + 1`, frames `doc_id % 50 + 1`, sample value
    * `(7·doc_id + 31·f + 17·c) % 65536 − 32768` (spans the FULL int16
    * range incl. both clipping rails); every 9th payload is truncated
    * (data chunk overruns) and must quarantine. The decoder's byte
    * walk, sign handling, and exact-long accumulation are pinned by
    * an oracle that re-derives every statistic analytically from the
    * (frame, channel) grid in SQL.
    */
  private val q109 = Q("q109_wav_pcm_stats",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val ch = (id % 2 + 1).toInt
        val frames = (id % 50 + 1).toInt
        val full = Multimodal.AudioBytes.wavPcm(ch, 8000, frames,
          (f, c) => ((7 * id + 31L * f + 17L * c) % 65536).toInt - 32768)
        Row(id, if (id % 9 == 0) full.take(full.length - 8) else full)
      }), payloadType)
      Multimodal.wavPcmStats(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("channels"), col("sample_rate"),
          col("n_samples"), col("sum_s"), col("sumsq_s"), col("min_s"),
          col("max_s"), col("n_clipped"), col("ok"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id,
          CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
          CAST(doc_id % 50 + 1 AS BIGINT) AS frames FROM documents),
      fs AS (SELECT doc_id, ch, frames, UNNEST(RANGE(frames)) AS f FROM d),
      cs AS (SELECT doc_id, ch, frames, f, UNNEST(RANGE(ch)) AS c FROM fs),
      v AS (SELECT doc_id, ch, frames,
          (7*doc_id + 31*f + 17*c) % 65536 - 32768 AS v FROM cs),
      st AS (SELECT doc_id, MIN(ch) AS ch, MIN(frames) AS frames,
          SUM(v) AS sum_s, SUM(v*v) AS sumsq_s,
          MIN(v) AS min_s, MAX(v) AS max_s,
          SUM(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END)
            AS n_clipped
        FROM v GROUP BY doc_id)
      SELECT doc_id,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(ch AS INT) END AS channels,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(8000 AS INT) END AS sample_rate,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(ch * frames AS BIGINT) END AS n_samples,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(sum_s AS BIGINT) END AS sum_s,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(sumsq_s AS BIGINT) END AS sumsq_s,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(min_s AS INT) END AS min_s,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(max_s AS INT) END AS max_s,
        CASE WHEN doc_id % 9 = 0 THEN NULL
             ELSE CAST(n_clipped AS BIGINT) END AS n_clipped,
        doc_id % 9 <> 0 AS ok
      FROM st ORDER BY doc_id"""))

  /** q153 — perceptual dHash over REAL decoded PNGs
    * ([[graft.operators.Multimodal.pngDHash]], round 11): q106's
    * complete-PNG fixture (dims `(id%13+4)×(id%11+4)`, sample value
    * `(x+2y+3c+id)%256`, every 9th truncated → quarantine) pushed
    * through the full decode → 9×8 nearest-neighbor luma grid →
    * horizontal-gradient-sign bits → 64-bit signature. The oracle
    * re-derives every bit analytically from the pixel formula — exact
    * integer luma (Rec.601 `div 1000`), exact grid coordinates
    * (`(i·w) div 9` ⇄ `//`), row bytes assembled into the signed
    * 64-bit hash via HUGEINT mod-2^64 wrap (the q51 convention) — so
    * a drifted sample coordinate, luma rounding, bit order, or sign
    * handling all fail the hash compare. The signature feeds
    * [[graft.operators.Dedup.simhashPairs]] unchanged (spec-gated).
    */
  private val q153 = Q("q153_png_dhash",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val w = (id % 13 + 4).toInt
        val h = (id % 11 + 4).toInt
        val full = Multimodal.ImageBytes.pngFull(w, h, channels = 3,
          (x, y, c) => ((x + 2L * y + 3L * c + id) % 256).toInt)
        Row(id, if (id % 9 == 0) full.take(full.length - 8) else full)
      }), payloadType)
      Multimodal.pngDHash(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("dhash"), col("ok"))
        .orderBy(col("doc_id"))
    },
    Some {
      val multCase = "CASE j " + (0 until 8).map(j =>
        s"WHEN $j THEN CAST(${1L << (8 * j)} AS HUGEINT)")
        .mkString(" ") + " END"
      s"""WITH d AS (SELECT doc_id, CAST(doc_id % 13 + 4 AS BIGINT) AS w,
          CAST(doc_id % 11 + 4 AS BIGINT) AS h FROM documents),
        g AS (SELECT doc_id, w, h, UNNEST(RANGE(9)) AS i FROM d),
        gj AS (SELECT doc_id, w, h, i, UNNEST(RANGE(8)) AS j FROM g),
        lum AS (SELECT doc_id, i, j,
            (299*((x + 2*y + doc_id) % 256)
             + 587*((x + 2*y + 3 + doc_id) % 256)
             + 114*((x + 2*y + 6 + doc_id) % 256)) // 1000 AS L
          FROM (SELECT doc_id, i, j, (i*w)//9 AS x, (j*h)//8 AS y
            FROM gj)),
        bits AS (SELECT a.doc_id, a.j, a.i,
            CASE WHEN b.L > a.L THEN 1 ELSE 0 END AS bit
          FROM lum a JOIN lum b ON b.doc_id = a.doc_id AND b.j = a.j
            AND b.i = a.i + 1
          WHERE a.i < 8),
        rowb AS (SELECT doc_id, j, SUM(bit * (1 << i)) AS rb
          FROM bits GROUP BY doc_id, j),
        hsh AS (SELECT doc_id, SUM(CAST(rb AS HUGEINT) * $multCase) AS hu
          FROM rowb GROUP BY doc_id)
      SELECT doc_id,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
            THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END
            AS BIGINT) END AS dhash,
        doc_id % 9 <> 0 AS ok
      FROM hsh ORDER BY doc_id"""
    })

  /** q154 — audio energy-envelope hash over REAL decoded PCM
    * ([[graft.operators.Multimodal.wavEnvelopeHash]], round 11): the
    * audio member of the near-dup-signature family. Complete PCM WAVs
    * (channels `id%2+1`, frames `id%211+40`, sample value
    * `((7·id+31·f+17·c)·131) % 65536 − 32768` — the ·131 makes the
    * sawtooth WRAP repeatedly so window energies are non-monotone;
    * q109's unwrapped ramp is monotone within a payload and would
    * hash everything to 0), every 9th truncated → quarantine. The
    * oracle re-derives the envelope windows (`(f·65) div nFrames` ⇄
    * `//`), the cross-multiplied mean comparisons (HUGEINT), and the
    * signed 64-bit assembly analytically from the sample formula.
    */
  private val q154 = Q("q154_wav_envelope_hash",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val ch = (id % 2 + 1).toInt
        val frames = (id % 211 + 40).toInt
        val full = Multimodal.AudioBytes.wavPcm(ch, 8000, frames,
          (f, c) =>
            (((7 * id + 31L * f + 17L * c) * 131) % 65536).toInt - 32768)
        Row(id, if (id % 9 == 0) full.take(full.length - 8) else full)
      }), payloadType)
      Multimodal.wavEnvelopeHash(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("ehash"), col("ok"))
        .orderBy(col("doc_id"))
    },
    Some {
      val multCase = "CASE j " + (0 until 8).map(j =>
        s"WHEN $j THEN CAST(${1L << (8 * j)} AS HUGEINT)")
        .mkString(" ") + " END"
      s"""WITH d AS (SELECT doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
          CAST(doc_id % 211 + 40 AS BIGINT) AS frames FROM documents),
        fs AS (SELECT doc_id, ch, frames, UNNEST(RANGE(frames)) AS f
          FROM d),
        cs AS (SELECT doc_id, ch, frames, f, UNNEST(RANGE(ch)) AS c
          FROM fs),
        v AS (SELECT doc_id, frames, (f * 65) // frames AS b,
            ABS(((7*doc_id + 31*f + 17*c) * 131) % 65536 - 32768) AS av
          FROM cs),
        e AS (SELECT doc_id, b, SUM(av) AS env, COUNT(*) AS cnt
          FROM v GROUP BY doc_id, b),
        grid AS (SELECT d.doc_id, g.b, COALESCE(e.env, 0) AS env,
            COALESCE(e.cnt, 0) AS cnt
          FROM d CROSS JOIN (SELECT UNNEST(RANGE(65)) AS b) g
          LEFT JOIN e ON e.doc_id = d.doc_id AND e.b = g.b),
        bits AS (SELECT a.doc_id, CAST(a.b // 8 AS BIGINT) AS j,
            CAST(a.b % 8 AS BIGINT) AS i,
            CASE WHEN CAST(x.env AS HUGEINT) * a.cnt
                    > CAST(a.env AS HUGEINT) * x.cnt
              THEN 1 ELSE 0 END AS bit
          FROM grid a JOIN grid x ON x.doc_id = a.doc_id
            AND x.b = a.b + 1
          WHERE a.b < 64),
        rowb AS (SELECT doc_id, j, SUM(bit * (1 << i)) AS rb
          FROM bits GROUP BY doc_id, j),
        hsh AS (SELECT doc_id, SUM(CAST(rb AS HUGEINT) * $multCase) AS hu
          FROM rowb GROUP BY doc_id)
      SELECT doc_id,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(CASE WHEN hu >= CAST('9223372036854775808' AS HUGEINT)
            THEN hu - CAST('18446744073709551616' AS HUGEINT) ELSE hu END
            AS BIGINT) END AS ehash,
        doc_id % 9 <> 0 AS ok
      FROM hsh ORDER BY doc_id"""
    })

  /** q160 — PCM silence-run analysis
    * ([[graft.operators.Multimodal.wavSilenceRuns]], round 11): the
    * audio-quality screen over really-decoded samples — q154's WAV
    * fixture with silence PLANTED in every third 16-frame block
    * (sample value 0 there, the wrapping signal elsewhere); runs of
    * ≥ 8 frames whose cross-channel peak |sample| < 500 are counted.
    * The decoder's sequential run-length walk is replayed relationally
    * by the oracle as a gaps-and-islands window (f − ROW_NUMBER
    * island keys) over the analytic frame peaks.
    */
  private val q160 = Q("q160_wav_silence_runs",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val ch = (id % 2 + 1).toInt
        val frames = (id % 211 + 40).toInt
        val full = Multimodal.AudioBytes.wavPcm(ch, 8000, frames,
          (f, c) => if ((f / 16) % 3 == 0) 0
            else (((7 * id + 31L * f + 17L * c) * 131) % 65536).toInt
              - 32768)
        Row(id, if (id % 9 == 0) full.take(full.length - 8) else full)
      }), payloadType)
      Multimodal.wavSilenceRuns(payloads, "doc_id", "payload",
          threshold = 500, minRunFrames = 8L)
        .select(col("doc_id"), col("n_runs"), col("longest_run"),
          col("n_silent_frames"), col("ok"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, CAST(doc_id % 2 + 1 AS BIGINT) AS ch,
          CAST(doc_id % 211 + 40 AS BIGINT) AS frames FROM documents),
      fs AS (SELECT doc_id, ch, frames, UNNEST(RANGE(frames)) AS f
        FROM d),
      cs AS (SELECT doc_id, ch, f, UNNEST(RANGE(ch)) AS c FROM fs),
      v AS (SELECT doc_id, f,
          CASE WHEN (f // 16) % 3 = 0 THEN 0
            ELSE ABS(((7*doc_id + 31*f + 17*c) * 131) % 65536 - 32768)
            END AS av
        FROM cs),
      pk AS (SELECT doc_id, f, MAX(av) AS peak FROM v
        GROUP BY doc_id, f),
      sil AS (SELECT doc_id, f,
          f - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f) AS isl
        FROM pk WHERE peak < 500),
      runs AS (SELECT doc_id, isl, COUNT(*) AS len FROM sil
        GROUP BY doc_id, isl),
      agg AS (SELECT doc_id, COUNT(*) AS n_runs, MAX(len) AS longest,
          SUM(len) AS n_silent
        FROM runs WHERE len >= 8 GROUP BY doc_id)
    SELECT d.doc_id,
      CASE WHEN d.doc_id % 9 = 0 THEN NULL
        ELSE CAST(COALESCE(a.n_runs, 0) AS BIGINT) END AS n_runs,
      CASE WHEN d.doc_id % 9 = 0 THEN NULL
        ELSE CAST(COALESCE(a.longest, 0) AS BIGINT) END AS longest_run,
      CASE WHEN d.doc_id % 9 = 0 THEN NULL
        ELSE CAST(COALESCE(a.n_silent, 0) AS BIGINT) END
        AS n_silent_frames,
      d.doc_id % 9 <> 0 AS ok
    FROM d LEFT JOIN agg a ON a.doc_id = d.doc_id
    ORDER BY d.doc_id"""))

  /** q163 — letterbox/pillarbox border detection
    * ([[graft.operators.Multimodal.pngBorders]], round 11): complete
    * PNGs with borders PLANTED analytically — uniform value 17 in the
    * top `id%4` rows, bottom `id%3` rows, left `id%5` and right
    * `id%2` columns, a varying body elsewhere — decoded for real and
    * measured; the oracle re-derives the expected border widths from
    * the planting rule (the body varies with x within every interior
    * row and with y within every interior column, so measured runs
    * equal planted widths exactly). Every 9th payload truncated →
    * quarantine.
    */
  private val q163 = Q("q163_png_borders",
    (s, dir) => {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val payloadType = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("payload", BinaryType)))
      val payloads = s.createDataFrame(ids.rdd.mapPartitions(_.map { r =>
        val id = r.getLong(0)
        val w = (id % 13 + 8).toInt
        val h = (id % 11 + 8).toInt
        val (top, bot) = ((id % 4).toInt, (id % 3).toInt)
        val (lef, rig) = ((id % 5).toInt, (id % 2).toInt)
        val full = Multimodal.ImageBytes.pngFull(w, h, channels = 3,
          (x, y, c) =>
            if (y < top || y >= h - bot || x < lef || x >= w - rig) 17
            else (20 + (x + 2L * y + 3L * c + id) % 200).toInt)
        Row(id, if (id % 9 == 0) full.take(full.length - 8) else full)
      }), payloadType)
      Multimodal.pngBorders(payloads, "doc_id", "payload")
        .select(col("doc_id"), col("width"), col("height"),
          col("top_rows"), col("bottom_rows"), col("left_cols"),
          col("right_cols"), col("ok"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(doc_id % 13 + 8 AS INT) END AS width,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(doc_id % 11 + 8 AS INT) END AS height,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(doc_id % 4 AS BIGINT) END AS top_rows,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(doc_id % 3 AS BIGINT) END AS bottom_rows,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(doc_id % 5 AS BIGINT) END AS left_cols,
        CASE WHEN doc_id % 9 = 0 THEN NULL
          ELSE CAST(doc_id % 2 AS BIGINT) END AS right_cols,
        doc_id % 9 <> 0 AS ok
      FROM documents ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(q27, q39, q78, q79, q80, q106, q109, q153, q154,
    q160, q163)
}
