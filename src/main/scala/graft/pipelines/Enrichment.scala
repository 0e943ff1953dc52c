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
    * `n` distinct normalized tokens longer than 3 chars, joined.
    */
  def keywordSummary(text: Column, n: Int): Column =
    array_join(slice(array_distinct(
      filter(TextFunctions.tokens(text), t => length(t) > 3)), 1, n), " ")

  /** Topic extraction stub (L5): top distinct long tokens as topics. */
  def topics(text: Column, n: Int): Column =
    slice(array_distinct(
      filter(TextFunctions.tokens(text), t => length(t) > 5)), 1, n)

  /** Geocoder stub: deterministic jittered point from the address hash
    * (get_edm_building_permits.py:49-80 fallback geocode).
    */
  def geocode(address: Column): Column = struct(
    (lit(53.5) + (pmod(xxhash64(address), lit(1000L)).cast("double") /
      lit(10000.0))).as("lat"),
    (lit(-113.6) + (pmod(xxhash64(address, lit(1)), lit(1000L)).cast("double") /
      lit(10000.0))).as("lon"))
}
