package graft

import graft.operators.{Collocations, Dedup, Similarity}

/** One lifecycle call releases every operator family's pinned
  * intermediates — a long-lived session no longer needs to know each
  * owner object.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("releaseAll drops every family's pins after a multi-family run") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "entirely different content to keep the fixture honest")
    ).toDF("doc_id", "text")
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    // RELATIVE assertion: other suites in the same session may hold
    // their own (unregistered, e.g. pipeline) pins — only the pins
    // CREATED by this test's family calls must vanish
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // run three pin-owning families (materialize so the pins fill)
    Similarity.semDedup(emb, "vec_id", "embedding", 0.3, 16).count()
    Dedup.lshCandidatePairs(docs, "doc_id", "text").count()
    Collocations.topPmi(docs, "text", k = 5, minCount = 2).count()
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.nonEmpty,
      "fixture produced no pins — the release assertion would be vacuous")
    Engine.releaseAll()
    // unpersist is async; poll
    def remaining =
      spark.sparkContext.getPersistentRDDs.keySet intersect mine
    val deadline = System.currentTimeMillis + 15000
    while (System.currentTimeMillis < deadline && remaining.nonEmpty)
      Thread.sleep(100)
    assert(remaining.isEmpty, s"pins survived releaseAll: $remaining")
    // all built-in owners enrolled (class-load forced by releaseAll)
    assert(Set("Similarity", "Dedup", "Collocations", "GraphRank",
      "Bpe").subsetOf(Engine.ownerNames.toSet), Engine.ownerNames)
  }
}
