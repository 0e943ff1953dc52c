package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TableStore
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index ([[LexIndex]]): every serving path
  * must equal the inline corpus-scan [[Bm25]] bit-for-bit, change-feed
  * refresh must equal a fresh rebuild, pinned generations must
  * re-serve identically after refreshes, and the vocab-predicated
  * read must actually prune files.
  */
class LexIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  private val queries: Seq[(Long, String)] = Seq(
    0L -> "spark join fast",
    1L -> "hash table scan",
    2L -> "slow query window")
  private val k = 10

  private def freshStore() = new TableStore(spark,
    Files.createTempDirectory("graft_lex").toString,
    retainGenerations = 10)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("qid").cast("long"), col("doc_id").cast("long"),
        col("score_q").cast("long"), col("rk").cast("long"))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

  private def indexContent(store: TableStore, table: String) =
    store.read(table)
      .select(col("component"), col("term"), col("doc_id"), col("tf"),
        col("dl"), col("n_docs"), col("sum_dl"))
      .as[(String, Option[String], Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long])]
      .collect().sorted.toSeq

  test("served == inline Bm25.topK on every serving path") {
    val store = freshStore()
    val gen = LexIndex.buildAndSave(store, "lex", docs, "doc_id", "text")
    val inline = rows(Bm25.topK(docs, "doc_id", "text", queries, k,
      minQuantMargin = Some(5e-4)))
    assert(rows(LexIndex.topK(store.read("lex"), queries, k,
      minQuantMargin = Some(5e-4))) == inline, "topK(read)")
    assert(rows(LexIndex.topKServed(store, "lex", queries, k,
      minQuantMargin = Some(5e-4))) == inline, "topKServed")
    assert(rows(LexIndex.topKAt(store, "lex", gen, queries, k,
      minQuantMargin = Some(5e-4))) == inline, "topKAt")
  }

  test("change-feed refresh == fresh rebuild of the live corpus") {
    val store = freshStore()
    val base = docs.select(col("doc_id"), col("text"))
    store.append("corpus", base.filter(col("doc_id") < 400))
    val g1 = store.generations("corpus").last
    LexIndex.buildAndSave(store, "lex", store.read("corpus"),
      "doc_id", "text")
    // churn: append new docs, delete some, update others' text
    store.append("corpus",
      base.filter(col("doc_id") >= 400 && col("doc_id") < 450))
    store.deleteByKeys("corpus", (0L until 25L).toDF("doc_id"),
      Seq("doc_id"))
    store.merge("corpus",
      base.filter(col("doc_id") >= 30 && col("doc_id") < 40)
        .select(col("doc_id"),
          concat(col("text"), lit(" zebra quux")).as("text")),
      "doc_id", TableStore.MergeUpdate(Seq("text")))
    val g2 = store.generations("corpus").last
    LexIndex.refresh(store, "lex",
      store.changesBetween("corpus", g1, g2), "doc_id", "text")
    val full = freshStore()
    LexIndex.buildAndSave(full, "lex", store.read("corpus"),
      "doc_id", "text")
    assert(indexContent(store, "lex") == indexContent(full, "lex"))
    // and the refreshed index serves == inline over the live corpus
    val inline = rows(Bm25.topK(store.read("corpus"), "doc_id", "text",
      queries, k))
    assert(rows(LexIndex.topKServed(store, "lex", queries, k)) == inline)
  }

  test("generation pinning: topKAt re-serves pre-refresh results") {
    val store = freshStore()
    val base = docs.select(col("doc_id"), col("text"))
    store.append("corpus", base.filter(col("doc_id") < 300))
    val g1 = store.generations("corpus").last
    val lexGen = LexIndex.buildAndSave(store, "lex",
      store.read("corpus"), "doc_id", "text")
    val want = rows(LexIndex.topKServed(store, "lex", queries, k))
    store.deleteByKeys("corpus", (0L until 150L).toDF("doc_id"),
      Seq("doc_id"))
    val g2 = store.generations("corpus").last
    LexIndex.refresh(store, "lex",
      store.changesBetween("corpus", g1, g2), "doc_id", "text")
    val live = rows(LexIndex.topKServed(store, "lex", queries, k))
    val pinned = rows(LexIndex.topKAt(store, "lex", lexGen, queries, k))
    assert(pinned == want, "pinned generation must re-serve exactly")
    assert(live != want, "the refresh must actually have changed results")
  }

  test("vocab-predicated serve prunes postings files") {
    val store = freshStore()
    LexIndex.buildAndSave(store, "lex", docs, "doc_id", "text",
      clusterFiles = Some(8))
    val allFiles = store.read("lex").inputFiles.length
    val pruned = store.readWhere("lex",
        col("component") === "posting" &&
          col("term").isin("spark", "join", "fast"))
      .inputFiles.length
    assert(allFiles > 1, s"fixture must span files, got $allFiles")
    assert(pruned < allFiles,
      s"readWhere kept $pruned of $allFiles files - no pruning")
  }

  test("refreshFromCorpus: resumes from the recorded anchor, no-ops when current") {
    val store = freshStore()
    val base = docs.select(col("doc_id"), col("text"))
    store.append("corpus", base.filter(col("doc_id") < 300))
    LexIndex.buildFromCorpus(store, "corpus", "lex", "doc_id", "text")
    // churn TWICE before any refresh: the anchor must span generations
    store.append("corpus",
      base.filter(col("doc_id") >= 300 && col("doc_id") < 330))
    store.deleteByKeys("corpus", (0L until 20L).toDF("doc_id"),
      Seq("doc_id"))
    val g = LexIndex.refreshFromCorpus(store, "corpus", "lex",
      "doc_id", "text")
    assert(g == store.generations("corpus").last)
    val want = freshStore()
    want.append("corpus", store.read("corpus"))
    LexIndex.buildAndSave(want, "lex", want.read("corpus"),
      "doc_id", "text")
    // compare everything except the anchor column (the rebuild store's
    // generation numbering differs by construction)
    def content(s: TableStore) = s.read("lex").drop("corpus_gen")
      .as[(String, Option[String], Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long])].collect().sorted.toSeq
    assert(content(store) == content(want))
    // already current: no new lex generations
    val gensBefore = store.generations("lex")
    LexIndex.refreshFromCorpus(store, "corpus", "lex", "doc_id", "text")
    assert(store.generations("lex") == gensBefore, "must no-op")
  }

  test("refresh is idempotent: re-applying the same feed leaves identical content") {
    val store = freshStore()
    val base = docs.select(col("doc_id"), col("text"))
    store.append("corpus", base.filter(col("doc_id") < 200))
    val g1 = store.generations("corpus").last
    LexIndex.buildAndSave(store, "lex", store.read("corpus"),
      "doc_id", "text")
    store.append("corpus",
      base.filter(col("doc_id") >= 200 && col("doc_id") < 220))
    store.deleteByKeys("corpus", (0L until 10L).toDF("doc_id"),
      Seq("doc_id"))
    val g2 = store.generations("corpus").last
    val feed = store.changesBetween("corpus", g1, g2)
    LexIndex.refresh(store, "lex", feed, "doc_id", "text")
    val once = indexContent(store, "lex")
    // a crash between the postings append and the stats swap replays
    // the WHOLE refresh: content must not duplicate
    LexIndex.refresh(store, "lex",
      store.changesBetween("corpus", g1, g2), "doc_id", "text")
    assert(indexContent(store, "lex") == once)
  }

  test("serve guards: missing stats row and empty vocabulary fail loudly") {
    val store = freshStore()
    LexIndex.buildAndSave(store, "lex", docs, "doc_id", "text")
    val noStats = store.read("lex").filter(col("component") =!= "stats")
    val boom = intercept[IllegalArgumentException] {
      LexIndex.topK(noStats, queries, k)
    }
    assert(boom.getMessage.contains("stats row"), boom.getMessage)
    val boom2 = intercept[IllegalArgumentException] {
      LexIndex.topKServed(store, "lex", Seq(0L -> "!!!"), k)
    }
    assert(boom2.getMessage.contains("normalization"), boom2.getMessage)
  }

  test("public refresh PRESERVES the corpus-generation anchor") {
    val store = freshStore()
    val base = docs.select(col("doc_id"), col("text"))
    store.append("corpus", base.filter(col("doc_id") < 200))
    val corpusG = store.generations("corpus").last
    LexIndex.buildFromCorpus(store, "corpus", "lex", "doc_id", "text")
    // out-of-band churn through the PUBLIC refresh (no anchor known):
    // the stats row's corpus_gen must survive, not get nulled
    val churn = base
      .filter(col("doc_id") >= 200 && col("doc_id") < 220)
      .withColumn("__change_type", lit("insert"))
    LexIndex.refresh(store, "lex", churn, "doc_id", "text")
    val anchor = store.readWhere("lex", col("component") === "stats")
      .select(col("corpus_gen")).as[Option[Long]].collect().toSeq
    assert(anchor == Seq(Some(corpusG)), s"anchor destroyed: $anchor")
    // and the serving loop still works: commit the same churn to the
    // corpus, catch up from the (now lagging) anchor — the replay of
    // the already-applied span is idempotent — and the index equals a
    // fresh rebuild of the live corpus
    store.append("corpus",
      base.filter(col("doc_id") >= 200 && col("doc_id") < 220))
    LexIndex.refreshFromCorpus(store, "corpus", "lex", "doc_id", "text")
    val full = freshStore()
    LexIndex.buildAndSave(full, "lex", store.read("corpus"),
      "doc_id", "text")
    assert(indexContent(store, "lex") == indexContent(full, "lex"))
  }
}
