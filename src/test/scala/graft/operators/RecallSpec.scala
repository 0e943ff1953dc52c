package graft.operators

import graft.SparkSpec

/** Serving-quality measurement on a STRUCTURED fixture
  * ([[EmbeddingFixtures.lowRank]]): the prescreen family's recall
  * claims, previously only measurable as noise on the i.i.d.-random
  * driver testdata, pinned against exact retrieval with stated
  * targets. Deterministic end to end (fixed seed, deterministic
  * operators), so these are assertions, not flaky benchmarks.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  private val n = 500
  private val dim = 64
  private lazy val data =
    EmbeddingFixtures.lowRank(n, dim, nCenters = 25, noise = 0.35)
  private lazy val emb = data.toDF("vec_id", "embedding")
  private lazy val q = emb.filter($"vec_id" < 10)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"qid", $"nid").as[(Long, Long)].collect().toSet

  private lazy val exactCos =
    pairs(Similarity.bruteForceTopK(q, emb, "vec_id", "vec_id",
      "embedding", k = 10))

  private def recall(got: Set[(Long, Long)], want: Set[(Long, Long)]): Double =
    (got intersect want).size.toDouble / want.size

  test("binary-quantization prescreen: recall@10 >= 0.9 on structured embeddings") {
    val r = recall(pairs(Similarity.binaryTopK(q, emb, "vec_id",
      "vec_id", "embedding", dim, k = 10, rerank = 50)), exactCos)
    info(f"binaryTopK recall@10 (rerank=50) = $r%.3f")
    assert(r >= 0.9, f"binary recall $r%.3f below target 0.9")
  }

  test("Matryoshka prefix prescreen: recall@10 >= 0.9 at 16 of 64 dims") {
    val r = recall(pairs(Similarity.matryoshkaTopK(q, emb, "vec_id",
      "vec_id", "embedding", dimPrefix = 16, k = 10, rerank = 50)),
      exactCos)
    info(f"matryoshkaTopK recall@10 (prefix 16/64, rerank=50) = $r%.3f")
    assert(r >= 0.9, f"MRL recall $r%.3f below target 0.9")
  }

  test("PQ/ADC: recall@10 >= 0.7 against exact L2 on structured embeddings") {
    val (m, ksub) = (16, 32)
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", dim, m, ksub,
      iters = 3)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", dim, m, cb)
    val got = Similarity.pqTopK(q, codes, cb, "vec_id", "embedding",
      dim, m, ksub, k = 10)
      .select($"qid", $"id".as("nid")).as[(Long, Long)].collect().toSet
    // PQ ranks by ADC L2 — measure against exact L2 (driver replay on
    // the 500-vector fixture), not the cosine exact set
    val vecs = data.toMap.view.mapValues(_.map(_.toDouble).toArray).toMap
    val exactL2 = (0L until 10L).flatMap { qid =>
      val qv = vecs(qid)
      vecs.keys.toSeq
        .map { id =>
          val v = vecs(id)
          val d = qv.indices.foldLeft(0.0) { (acc, j) =>
            val t = qv(j) - v(j); acc + t * t
          }
          (d, id)
        }.sorted.take(10).map { case (_, id) => (qid, id) }
    }.toSet
    val r = recall(got, exactL2)
    info(f"pqTopK recall@10 (m=$m, ksub=$ksub) = $r%.3f")
    assert(r >= 0.7, f"PQ recall $r%.3f below target 0.7")
  }

  test("hardNegativesIvf: recall@10 >= 0.8 vs exact label-filtered brute") {
    // labels = id % 10 on the structured fixture; anchors = first 10
    val lab = emb.withColumn("label",
      org.apache.spark.sql.functions.pmod($"vec_id", org.apache.spark
        .sql.functions.lit(10)).cast("int"))
    val anchors = lab.filter($"vec_id" < 10)
    val exact = pairs(Similarity.hardNegatives(anchors, lab, "vec_id",
      "vec_id", "embedding", "label", k = 10))
    val served = pairs(Similarity.hardNegativesIvf(anchors, lab,
      "vec_id", "vec_id", "embedding", "label", k = 10,
      centroidEvery = 16, nprobe = 8))
    // probe-bounded candidates: same-label never appears at all
    val labels = lab.select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    assert(served.forall { case (q, n) => labels(q) != labels(n) })
    val r = recall(served, exact)
    info(f"hardNegativesIvf recall@10 (nprobe=8) = $r%.3f")
    assert(r >= 0.8, f"IVF hard-negative recall $r%.3f below 0.8")
  }

  test("normProfile: per-row quantized norms, exact extremes") {
    val e = Seq(
      (1L, Array(3f, 4f), java.lang.Integer.valueOf(0)),   // norm2 25
      (2L, Array(1f, 0f), java.lang.Integer.valueOf(0)),   // norm2 1
      (3L, Array(0f, 0f), java.lang.Integer.valueOf(1)),   // norm2 0
      (4L, Array(2f, 0f), null.asInstanceOf[java.lang.Integer])
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.normProfile(e, "embedding", "label")
      .orderBy($"label")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 1000000L, 25000000L, 13000000L),
      (1L, 1L, 0L, 0L, 0L)), got.toString)
  }

  test("hardNegatives: same-label (incl. self) never ranks; nulls drop") {
    // axis-aligned vectors: 1 and 2 share label 7 and point the same
    // way; 3 (label 8) is orthogonal-ish, 4 has a null label
    val e = Seq(
      (1L, Array(1f, 0f), java.lang.Integer.valueOf(7)),
      (2L, Array(0.9f, 0.1f), java.lang.Integer.valueOf(7)),
      (3L, Array(0f, 1f), java.lang.Integer.valueOf(8)),
      (4L, Array(1f, 0f), null.asInstanceOf[java.lang.Integer])
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(e.filter($"vec_id" === 1L), e,
        "vec_id", "vec_id", "embedding", "label", k = 10)
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    // anchor 1 (label 7): 2 excluded (same label), self excluded,
    // 4 excluded (null label) -> only 3 survives
    assert(got == Set((1L, 3L)), got.toString)
    // agreement with the exact top-k restricted by label post-hoc
    val brute = Similarity.bruteForceTopK(
        e.filter($"vec_id" === 1L), e.filter($"label" === 8),
        "vec_id", "vec_id", "embedding", k = 10)
      .select($"qid", $"nid", $"sim")
      .as[(Long, Long, Double)].collect().toSet
    val hn = Similarity.hardNegatives(e.filter($"vec_id" === 1L), e,
        "vec_id", "vec_id", "embedding", "label", k = 10)
      .select($"qid", $"nid", $"sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(hn == brute, s"hn $hn vs brute $brute")
  }

  test("dimProfile: per-dim quantized extremes, sign-split mean") {
    import spark.implicits._
    // float-exact values: dim0 floors to 1000/250, dim1 to -500/-250
    val v = Seq((1L, Array(1.0f, -0.5f)), (2L, Array(0.25f, -0.25f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dimProfile(v, "embedding")
      .orderBy($"dim")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // dim1 mean: sum -750 over 2 -> sign-split ABS(750) div 2 = -375
    // (a floor-division -750 // 2 would also be -375 here; the
    // sign-split matters when ABS(sum) is odd — next case)
    assert(got == Seq((0L, 2L, 625L, 250L, 1000L),
      (1L, 2L, -375L, -500L, -250L)), got.toString)
    // odd negative sum: floors -500 and -501 (from the float-exact
    // -513/1024 = -0.5009765625) sum to -1001 over 2 -> the
    // sign-split gives -500 (trunc), where floor division = -501 —
    // the case the oracle's ABS form exists for
    val odd = Seq((1L, Array(-0.5f)), (2L, Array(-513f / 1024f)))
      .toDF("vec_id", "embedding")
    val gotO = Similarity.dimProfile(odd, "embedding")
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(gotO == ((0L, 2L, -500L, -501L, -500L)), gotO.toString)
  }
}
