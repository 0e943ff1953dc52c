package graft.pipelines

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** External-service enrichment seams (SURVEY.md §2.8 U5): the reference
  * calls OpenAI (brochure/metric extraction, summaries), an embedding
  * API, and a geocoder per row-batch. The engine models each as a
  * deterministic Column/batch transform behind an interface so pipelines
  * are testable offline; production swaps the impl, the plan shape
  * (mapPartitions batching, partition = request batch) is identical.
  */
object Enrichment {

  /** Deterministic pseudo-embedding standing in for a text-embedding
    * API: `dim` doubles in [-0.5, 0.5) derived from seeded hashes of the
    * text. Preserves the only property the engine's operators rely on:
    * equal text -> equal vector.
    */
  def hashEmbedding(text: Column, dim: Int): Column =
    call_function("graft_hash_embedding", text, lit(dim))

  /** Composed-builtin form the native expression is validated against. */
  def hashEmbeddingHof(text: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(text, i), lit(1000000L)).cast("double") /
        lit(1000000.0)) - lit(0.5))

  /** Keyword "summarizer" standing in for the LLM summary (L4): first
    * `n` distinct normalized tokens longer than 3 chars, joined. The
    * reference's summary prompt instructs the LLM to answer the literal
    * sentinel `[NONE]` when it finds nothing relevant
    * (transcript_summaries.py:285) — the stub honors the same contract
    * when it has no qualifying tokens, so the sentinel-skip path is
    * drivable offline.
    */
  def keywordSummary(text: Column, n: Int): Column = {
    val s = array_join(slice(array_distinct(
      filter(TextFunctions.tokens(text), t => length(t) > 3)), 1, n), " ")
    when(length(s) === 0, lit("[NONE]")).otherwise(s)
  }

  /** Topic extraction stub (L5): top distinct long tokens as topics. */
  def topics(text: Column, n: Int): Column =
    slice(array_distinct(
      filter(TextFunctions.tokens(text), t => length(t) > 5)), 1, n)

  /** Prompt templating (F26, transcript_summaries.py / REIT_metrics.py
    * prompt builders): `{name}` placeholders filled from bound columns.
    * The template is parsed ONCE at plan-build time into a concat chain
    * of literals and columns — codegen'd, no regex at row time, no UDF.
    * Null bindings render as "" (a null would otherwise null the whole
    * prompt).
    */
  def promptTemplate(template: String, bindings: Map[String, Column]): Column = {
    val ph = "\\{([A-Za-z0-9_]+)\\}".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var pos = 0
    for (m <- ph.findAllMatchIn(template)) {
      if (m.start > pos) parts += lit(template.substring(pos, m.start))
      val name = m.group(1)
      require(bindings.contains(name), s"unbound placeholder {$name}")
      parts += coalesce(bindings(name).cast("string"), lit(""))
      pos = m.end
    }
    if (pos < template.length) parts += lit(template.substring(pos))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Geocoder stub: deterministic jittered point from the address hash
    * (get_edm_building_permits.py:49-80 fallback geocode). Hash is the
    * md5+hex-parse kit (not xxhash64) so a DuckDB oracle can replay the
    * point exactly (q256 gates the geocode-fallback leg end-to-end);
    * lat lands in [53.5, 53.6), lon in [-113.6, -113.5).
    */
  def geocode(address: Column): Column = {
    def h(salt: String) = call_function("graft_md5_prefix",
      concat_ws(":", lit(salt), coalesce(address, lit(""))), lit(8))
    struct(
      (lit(53.5) + ((h("geo_lat") % 1000L).cast("double") /
        lit(10000.0))).as("lat"),
      (lit(-113.6) + ((h("geo_lon") % 1000L).cast("double") /
        lit(10000.0))).as("lon"))
  }
}
