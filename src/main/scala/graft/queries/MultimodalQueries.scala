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

  val all: Seq[Q] = Seq(q27)
}
