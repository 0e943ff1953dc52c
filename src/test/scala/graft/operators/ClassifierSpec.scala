package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // docs where label correlates with bag-of-words ("spam spam" vs
  // prose) so GD has signal; one empty-text doc to pin the "no tokens
  // -> excluded from training and scoring" contract
  private val docs = Seq(
    (1L, "buy cheap pills now buy cheap pills now buy now", 0L),
    (2L, "the cat sat on the mat with a hat", 1L),
    (3L, "cheap pills cheap pills buy buy buy now now", 0L),
    (4L, "the dog ran over the hill with the ball", 1L),
    (5L, "pills now pills now cheap buy cheap", 0L),
    (6L, "the sun rose over the quiet green field", 1L),
    (7L, "   ", 1L)
  ).toDF("doc_id", "text", "y")

  private val cfg = Classifier.Config(dim = 32, iters = 4)

  /** Driver-side BigInt reference of the exact training contract:
    * md5-bucket features, hard sigmoid, truncating division, halving
    * schedule.
    */
  private def reference(rows: Seq[(Long, String, Long)],
                        c: Classifier.Config)
      : Map[Long, (Long, Long, Long, Long)] = {
    def norm(t: String) =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").replaceAll("\\s+", " ").trim
    def bucket(w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${c.salt}:$w".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % c.dim).toInt
    }
    def tdiv(a: BigInt, b: BigInt): BigInt =
      a.abs / b * (if (a.signum < 0) -1 else 1)
    val feats = rows.flatMap { case (id, text, y) =>
      val toks = norm(text).split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else Some((id, y, toks.groupBy(bucket).map { case (b, ws) =>
        (b, ws.length.toLong) }))
    }
    val n = BigInt(feats.size)
    val s = BigInt(c.scale)
    var w = Vector.fill(c.dim)(BigInt(0)); var bias = BigInt(0)
    def sig(z: BigInt) = (s / 2 + tdiv(z, 4)).max(0).min(s)
    for (it <- 0 until c.iters) {
      val g = Array.fill(c.dim)(BigInt(0)); var gb = BigInt(0)
      feats.foreach { case (_, y, fc) =>
        val z = bias + fc.map { case (b, cnt) => w(b) * cnt }.sum
        val err = sig(z) - s * y
        fc.foreach { case (b, cnt) => g(b) += err * cnt }
        gb += err
      }
      val den = n << (it + 1)
      w = w.zipWithIndex.map { case (x, b) => x - tdiv(g(b), den) }
      bias -= tdiv(gb, den)
    }
    feats.map { case (id, y, fc) =>
      val z = bias + fc.map { case (b, cnt) => w(b) * cnt }.sum
      val p = sig(z)
      (id, (y, z.toLong, p.toLong,
        if (p * 2 > s) 1L else 0L))
    }.toMap
  }

  test("trainAndScore matches the BigInt reference exactly") {
    val got = Classifier.trainAndScore(docs, "doc_id", "text", $"y" === 1L,
      cfg.copy(salt = "clf"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, y, z, p, pred) => id -> (y, z, p, pred) }.toMap
    val want = reference(
      docs.as[(Long, String, Long)].collect().toSeq, cfg)
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(!got.contains(7L)) // empty text: no features, no score
    // the model learned: predictions beat the majority class
    val acc = got.values.count { case (y, _, _, pred) => y == pred }
    assert(acc >= 5, s"acc $acc of ${got.size}")
  }

  test("training is partitioning-invariant") {
    val a = Classifier.trainAndScore(docs.repartition(7), "doc_id",
      "text", $"y" === 1L, cfg).orderBy($"id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val b = Classifier.trainAndScore(docs.repartition(3), "doc_id",
      "text", $"y" === 1L, cfg).orderBy($"id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("model persistence: save/load round-trip, pinned generation survives retrain") {
    val store = new graft.sources.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_clf").toString,
      retainGenerations = 10)
    val feats = Classifier.hashedFeatures(docs, "doc_id", "text",
      $"y" === 1L, cfg)
    val (w, b) = Classifier.train(feats, cfg)
    val g1 = Classifier.saveModel(store, "model", w, b, cfg)
    val (w2, b2, cfg2) = Classifier.loadModelAt(store, "model", g1)
    assert(w2.toSeq == w.toSeq && b2 == b && cfg2 == cfg)
    // retrain on flipped labels commits a NEW generation; the pinned
    // one still re-serves the original scores
    val (wFlip, bFlip) = Classifier.train(
      Classifier.hashedFeatures(docs, "doc_id", "text", $"y" === 0L, cfg),
      cfg)
    Classifier.saveModel(store, "model", wFlip, bFlip, cfg)
    val (wLive, _, _) = Classifier.loadModel(store, "model")
    assert(wLive.toSeq != w.toSeq)
    val (wPin, bPin, _) = Classifier.loadModelAt(store, "model", g1)
    val pinScores = Classifier.score(feats, wPin, bPin, cfg)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val origScores = Classifier.score(feats, w, b, cfg)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(pinScores == origScores)
  }

  test("refreshScores: change-feed refresh == full rescore of the live corpus") {
    val store = new graft.sources.TableStore(spark,
      java.nio.file.Files.createTempDirectory("graft_clfs").toString,
      retainGenerations = 10)
    val corpus = docs.select($"doc_id", $"text")
    store.append("corpus", corpus.filter($"doc_id" <= 4))
    val g1 = store.generations("corpus").last
    val (w, b) = Classifier.train(
      Classifier.hashedFeatures(docs, "doc_id", "text", $"y" === 1L, cfg),
      cfg)
    Classifier.scoreAndSave(store, "scores", store.read("corpus"),
      "doc_id", "text", w, b, cfg)
    // churn: insert docs 5-6, delete 1, update 2's text
    store.append("corpus", corpus.filter($"doc_id".isin(5L, 6L)))
    store.deleteByKeys("corpus", Seq(1L).toDF("doc_id"), Seq("doc_id"))
    store.merge("corpus",
      Seq((2L, "the new cat sat with the old hat")).toDF("doc_id", "text"),
      "doc_id", graft.sources.TableStore.MergeUpdate(Seq("text")))
    val g2 = store.generations("corpus").last
    Classifier.refreshScores(store, "scores",
      store.changesBetween("corpus", g1, g2), "doc_id", "text", w, b, cfg)
    val got = store.read("scores")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Classifier.scoreDocs(store.read("corpus"), "doc_id",
      "text", w, b, cfg)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"\ngot  $got\nwant $want")
    // at-least-once replay: the SAME feed re-applied (crash-retry)
    // leaves the scores table unchanged, never duplicated
    Classifier.refreshScores(store, "scores",
      store.changesBetween("corpus", g1, g2), "doc_id", "text", w, b, cfg)
    assert(store.read("scores").count() == want.size,
      "replayed refresh duplicated score rows")
  }

  test("scale shape: broadcast weights, id-partitioned feats, no window") {
    // fresh values so test 1's persisted frame can't be cache-reused
    // into this plan (InMemoryRelation would hide the exchange shape)
    val fresh = docs.withColumn("text", concat($"text", lit(" zz")))
    val feats = Classifier.hashedFeatures(fresh, "doc_id", "text",
      $"y" === 1L, cfg)
    // ONE exchange for the whole feature build (the id repartition);
    // the (id, y, bucket) count rides it — partial and final
    // HashAggregate collapse onto the repartition's partitioning
    val fplan = feats.queryExecution.executedPlan.toString
    assert(fplan.split("Exchange hashpartitioning").length - 1 == 1, fplan)
    val scored = Classifier.score(feats, Array.fill(cfg.dim)(1L), 0L, cfg)
    val splan = scored.queryExecution.executedPlan.toString
    assert(splan.contains("BroadcastHashJoin") ||
      splan.contains("BroadcastNestedLoopJoin"), splan)
    assert(!splan.contains("Window"), splan)
  }
}
