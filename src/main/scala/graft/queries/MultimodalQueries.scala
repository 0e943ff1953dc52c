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

  val all: Seq[Q] = Seq(q27, q39)
}
