package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.TableStore
import org.apache.spark.sql.functions._

/** Persisted tokenizer artifacts ([[TokenizerIndex]]): the served
  * unigram model must equal inline training bit-for-bit, the delta
  * refresh must equal a rebuild across churn, pinned generations must
  * reproduce their epoch's tokenizer, and BPE serving must replay the
  * exact persisted merge chain.
  */
class TokenizerIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def freshStore() = new TableStore(spark,
    Files.createTempDirectory("graft_tokix").toString,
    retainGenerations = 10)

  test("served unigram model == inline training; scores bit-identical") {
    val store = freshStore()
    store.append("corpus", docs)
    TokenizerIndex.buildUnigramFromCorpus(store, "corpus", "uni",
      "text", vocabSize = 40)
    val served = TokenizerIndex.unigramModel(store, "uni",
      minQuantMargin = Some(1e-6))
    val inline = Unigram.trainModel(docs, "text", 40,
      minQuantMargin = Some(1e-6))
    assert(served == inline)
    val a = TokenizerIndex.unigramScoreServed(store, "uni", docs,
        "doc_id", "text")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Unigram.scoreDocs(docs, "doc_id", "text", inline)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("unigram delta refresh == rebuild; pinned gen reproduces; replay no-ops") {
    val store = freshStore()
    store.append("corpus", docs.filter(col("doc_id") < 30))
    val g1 = TokenizerIndex.buildUnigramFromCorpus(store, "corpus",
      "uni", "text", vocabSize = 25)
    val modelG1 = TokenizerIndex.unigramModel(store, "uni")
    // churn: append + delete + update
    store.append("corpus",
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 40))
    store.deleteByKeys("corpus", (0L until 5L).toDF("doc_id"),
      Seq("doc_id"))
    store.merge("corpus",
      docs.filter(col("doc_id") >= 10 && col("doc_id") < 15)
        .select(col("doc_id"),
          concat(col("text"), lit(" zebra quux")).as("text")),
      "doc_id", TableStore.MergeUpdate(Seq("text")))
    val to = TokenizerIndex.refreshUnigramFromCorpus(store, "corpus",
      "uni", "text")
    assert(to == store.generations("corpus").last)
    assert(TokenizerIndex.refreshUnigramFromCorpus(store, "corpus",
      "uni", "text") == to)
    val full = freshStore()
    full.append("corpus", store.read("corpus"))
    TokenizerIndex.buildUnigramFromCorpus(full, "corpus", "uni",
      "text", vocabSize = 25)
    assert(TokenizerIndex.unigramModel(store, "uni") ==
      TokenizerIndex.unigramModel(full, "uni"))
    // live freq rows (tombstones excluded) == rebuild's rows
    def freqs(s: TableStore): Seq[(String, Long)] =
      s.read("uni").filter(col("component") === "pfreq" &&
          col("freq") > 0L)
        .select(col("piece"), col("freq"))
        .as[(String, Long)].collect().sorted.toSeq
    assert(freqs(store) == freqs(full))
    // pinned generation reproduces the pre-churn model exactly
    assert(TokenizerIndex.unigramModelAt(store, "uni", g1) == modelG1)
  }

  test("unigram tombstones: a vanished piece zeroes, never mis-serves") {
    val store = freshStore()
    store.append("corpus", Seq(
      (1L, "qqqq unique"), (2L, "common words"), (3L, "common words"))
      .toDF("doc_id", "text"))
    TokenizerIndex.buildUnigramFromCorpus(store, "corpus", "uni",
      "text", vocabSize = 10)
    store.deleteByKeys("corpus", Seq(1L).toDF("doc_id"), Seq("doc_id"))
    TokenizerIndex.refreshUnigramFromCorpus(store, "corpus", "uni",
      "text")
    val zeros = store.read("uni")
      .filter(col("component") === "pfreq" && col("freq") === 0L)
      .select(col("piece")).as[String].collect().toSet
    assert(zeros.contains("qqqq") && zeros.contains("q"),
      zeros.toString)
    // derived model == a rebuild on the post-delete corpus (the
    // zeroed pieces are filtered before the top-V selection)
    val full = freshStore()
    full.append("corpus", store.read("corpus"))
    TokenizerIndex.buildUnigramFromCorpus(full, "corpus", "uni",
      "text", vocabSize = 10)
    assert(TokenizerIndex.unigramModel(store, "uni") ==
      TokenizerIndex.unigramModel(full, "uni"))
  }

  test("served BPE merges and segmentation == inline; pinned across retrain") {
    val store = freshStore()
    val half = docs.filter(col("doc_id") < 40)
    store.append("corpus", half)
    val g1 = TokenizerIndex.buildBpeFromCorpus(store, "corpus", "bpe",
      "text", numMerges = 6)
    val inline = Bpe.trainMerges(half, "text", 6)
      .orderBy(col("step")).select(col("left"), col("right"))
      .as[(String, String)].collect().toSeq
    assert(TokenizerIndex.bpeMerges(store, "bpe") == inline)
    val kept = docs.filter(col("text").isNotNull &&
      length(graft.functions.TextFunctions.normalizeText(col("text")))
        > 0)
    val a = TokenizerIndex.bpeSegmentServed(store, "bpe", kept, "text")
      .select(col("doc_id"), col("bpe_tokens"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    val b = Bpe.segment(kept, "text", inline)
      .select(col("doc_id"), col("bpe_tokens"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    assert(a == b && a.nonEmpty)
    // retrain on a churned corpus rewrites; the old generation still
    // serves the old tokenizer
    store.append("corpus", docs.filter(col("doc_id") >= 40))
    TokenizerIndex.buildBpeFromCorpus(store, "corpus", "bpe", "text",
      numMerges = 6)
    assert(TokenizerIndex.bpeMergesAt(store, "bpe", g1) == inline)
    assert(TokenizerIndex.bpeMerges(store, "bpe") ==
      Bpe.trainMerges(store.read("corpus"), "text", 6)
        .orderBy(col("step")).select(col("left"), col("right"))
        .as[(String, String)].collect().toSeq)
  }
}
