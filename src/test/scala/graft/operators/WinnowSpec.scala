package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference reimplementation (independent of the operator) ----
  private def normTokens(s: String): Seq[String] = {
    val n = s.toLowerCase.replaceAll("[^a-z0-9]+", " ")
      .replaceAll("\\s+", " ").trim
    if (n.isEmpty) Seq.empty else n.split(" ").toSeq
  }
  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
  private def shingleHash(sh: String, salt: String): Long =
    java.lang.Long.parseLong(md5hex(s"$salt:$sh").take(9), 16)

  /** Reference winnowing: packed-key window min, rightmost tie-break. */
  private def refFingerprints(text: String, k: Int, w: Int,
                              salt: String): Set[(Long, Long)] = {
    val P = 1L << 24
    val t = normTokens(text)
    if (t.isEmpty) return Set.empty
    val m = math.max(1, t.length - k + 1)
    val keys = (1 to m).map { i =>
      val sh = t.slice(i - 1, i - 1 + k).mkString(" ")
      shingleHash(sh, salt) * P + (P - 1 - i)
    }
    keys.indices.map { e =>
      keys.slice(math.max(0, e - w + 1), e + 1).min
    }.toSet.map { skey: Long => (P - 1 - skey % P, skey / P) }
  }

  private val passage =
    "shared canonical passage of many identical tokens in sequence here"

  private val docs = Seq(
    (1L, s"alpha beta gamma $passage delta epsilon zeta"),
    // same passage, shifted by a different-length prefix
    (2L, s"one two three four five six seven $passage eight"),
    (3L, "entirely unrelated content talking about engines and planes " +
      "with nothing in common beyond stopwords"),
    (4L, "tiny"), // shorter than k: one truncated shingle
    (5L, ""), // empty after normalize: no fingerprints
    (6L, s"another carrier of $passage inside other words")
  ).toDF("doc_id", "text")

  test("fingerprints match the reference implementation exactly") {
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 5, salt = "w-spec")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val expect = docs.as[(Long, String)].collect()
      .map { case (id, tx) =>
        id -> refFingerprints(tx, 4, 5, "w-spec")
      }.filter(_._2.nonEmpty).toMap
    assert(got == expect, "selection diverged from reference winnowing")
  }

  test("guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 5, salt = "w-spec")
      .select($"doc_id", $"fp").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // passage is 10 tokens >= w+k-1 = 8, embedded at different offsets
    for (Seq(a, b) <- Seq(1L, 2L, 6L).combinations(2))
      assert((fps(a) & fps(b)).nonEmpty,
        s"docs $a and $b share a long passage but no fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty,
      "unrelated docs should not share fingerprints at this size")
  }

  test("rightmost tie-break: identical hashes select rightmost position") {
    val rep = Seq((10L, "echo echo echo echo echo echo echo echo"))
      .toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(rep, "doc_id", "text",
        k = 2, w = 3, salt = "w-spec")
      .select($"pos").as[Long].collect().toSet
    // all 7 bigram hashes equal -> every window picks its OWN end
    // (rightmost); positions 1..7 all selected
    assert(got == (1L to 7L).toSet,
      s"rightmost tie-break violated: $got")
  }

  test("short and empty docs: truncated shingle vs nothing") {
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 5, salt = "w-spec")
      .groupBy($"doc_id").count().as[(Long, Long)].collect().toMap
    assert(fps(4L) == 1L, "sub-k doc must emit one truncated fingerprint")
    assert(!fps.contains(5L), "empty doc must emit none")
  }

  test("pairs: shared passage found, boilerplate df-capped out") {
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text",
        k = 4, w = 5, minShared = 1L, maxDf = 8, salt = "w-spec")
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 6L)) &&
      pairs.contains((2L, 6L)), s"passage pairs missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc paired")
    // same corpus with maxDf = 2: the passage fingerprints live in 3
    // docs -> pruned, no pairs survive at minShared 1 unless another
    // fingerprint is shared by exactly 2
    val capped = Dedup.winnowPairs(docs, "doc_id", "text",
        k = 4, w = 5, minShared = 1L, maxDf = 2, salt = "w-spec")
      .select($"id_a", $"id_b", $"n_shared")
      .as[(Long, Long, Long)].collect()
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text",
        k = 4, w = 5, salt = "w-spec")
      .select($"doc_id", $"fp").distinct()
      .as[(Long, Long)].collect()
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
      .filter { case (_, ds) => ds.size == 2 }
    val expectPairs = byFp.values.toSeq
      .map(ds => { val s = ds.toSeq.sorted; (s(0), s(1)) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(capped.map(r => (r._1, r._2) -> r._3).toMap == expectPairs,
      "df cap changed pair semantics beyond pruning")
  }

  test("determinism under repartitioning; loud envelopes") {
    val a = Dedup.winnowFingerprints(docs, "doc_id", "text").collect()
      .toSet
    val b = Dedup.winnowFingerprints(docs.repartition(5), "doc_id",
      "text").collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Dedup.winnowFingerprints(docs, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.winnowPairs(docs, "doc_id", "text", maxDf = 1)
    }
  }
}
