package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation ([[Eval.recallAtK]]): hand fixtures
  * for every branch (full/partial/zero overlap, candidate-starved
  * query, MRR rank placement, deeper-than-k inputs), plus the real
  * ANN integration the q126 gate runs.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("qid").as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("hand fixture: overlap counting, ppm arithmetic, MRR") {
    // exact top-3 per query; approx lists with varying overlap
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), // q1: full overlap
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L), // q2: top-1 missed
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L)  // q3: no approx rows
    ).toDF("qid", "id", "rk")
    val approx = Seq(
      (1L, 10L, 1L), (1L, 12L, 2L), (1L, 11L, 3L),
      (2L, 21L, 1L), (2L, 99L, 2L), (2L, 98L, 3L)
    ).toDF("qid", "id", "rk")
    val got = rows(Eval.recallAtK(approx, exact, "qid", "id", "rk", 3))
    assert(got == Seq(
      // (qid, n_exact, n_hit, recall_ppm, mrr_ppm)
      (1L, 3L, 3L, 1000000L, 1000000L), // top-1 at approx rank 1
      (2L, 3L, 1L, 333333L, 0L),        // exact #1 (20) missed -> mrr 0
      (3L, 3L, 0L, 0L, 0L)), got.toString)
  }

  test("MRR uses the APPROX rank of the baseline's #1 id") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "id", "rk")
    val approx = Seq((1L, 11L, 1L), (1L, 10L, 3L)).toDF("qid", "id", "rk")
    val got = rows(Eval.recallAtK(approx, exact, "qid", "id", "rk", 3))
    assert(got == Seq((1L, 2L, 2L, 1000000L, 333333L)), got.toString)
  }

  test("rows beyond k are ignored on both sides") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 99L, 3L))
      .toDF("qid", "id", "rk")
    val approx = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("qid", "id", "rk")
    val got = rows(Eval.recallAtK(approx, exact, "qid", "id", "rk", 2))
    assert(got == Seq((1L, 2L, 2L, 1000000L, 1000000L)), got.toString)
  }

  test("integration: LSH vs brute force on the embeddings fixture") {
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val approx = Similarity.lshTopK(queries = q, corpus = e,
      qidCol = "vec_id", idCol = "vec_id", vecCol = "embedding",
      k = 10, dim = 64, planes = 16, bandBits = 2)
    val exact = Similarity.bruteForceTopK(queries = q, corpus = e,
      qidCol = "vec_id", idCol = "vec_id", vecCol = "embedding", k = 10)
    val got = rows(Eval.recallAtK(approx, exact, "qid", "nid", "rk", 10))
    assert(got.size == 5, s"one row per query: $got")
    // driver-side reference from the two collected lists
    val ap = approx.select(col("qid").cast("long"),
        col("nid").cast("long"), col("rk").cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val exRows = exact.select(col("qid").cast("long"),
        col("nid").cast("long"), col("rk").cast("long"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    got.foreach { case (qid, nExact, nHit, recallPpm, mrrPpm) =>
      val ex = exRows(qid)
      val apq = ap.getOrElse(qid, Map.empty[Long, Long])
      val hits = ex.count(r => apq.contains(r._2))
      assert(nExact == ex.length && nHit == hits.toLong, s"qid $qid")
      assert(recallPpm == 1000000L * hits / ex.length, s"qid $qid")
      val top1 = ex.find(_._3 == 1L).get._2
      val wantMrr = apq.get(top1).map(1000000L / _).getOrElse(0L)
      assert(mrrPpm == wantMrr, s"qid $qid mrr")
    }
    // the fixture must exercise a non-trivial recall (LSH at these
    // params misses some of the exact top-10)
    assert(got.exists(_._4 < 1000000L) || got.forall(_._4 == 1000000L))
  }

  // ------------------------------------------------------------- nDCG

  test("nDCG hand fixture: perfect, reordered, and missed lists") {
    val k = 3
    def w(i: Int) = Eval.dcgWeight(i)
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L)
    ).toDF("qid", "id", "rk")
    val approx = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), // perfect
      (2L, 21L, 1L), (2L, 20L, 2L), (2L, 99L, 3L)  // swap + miss
      // qid 3: no approx rows at all
    ).toDF("qid", "id", "rk")
    val got = Eval.ndcgAtK(approx, exact, "qid", "id", "rk", k)
      .orderBy("qid")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val idcg = 3L * w(1) + 2L * w(2) + 1L * w(3)
    val dcg2 = 2L * w(1) + 3L * w(2) // rel(21)=2 at pos 1, rel(20)=3 at 2
    assert(got == Seq(
      (1L, 3L, idcg, idcg, 1000000L * idcg / idcg),
      (2L, 3L, dcg2, idcg, 1000000L * dcg2 / idcg),
      (3L, 3L, 0L, idcg, 0L)), got.toString)
  }

  test("nDCG: short baseline list scales IDCG by n_exact") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "id", "rk")
    val approx = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "id", "rk")
    val got = Eval.ndcgAtK(approx, exact, "qid", "id", "rk", 5)
      .as[(Long, Long, Long, Long, Long)].collect().head
    val idcg = 5L * Eval.dcgWeight(1) + 4L * Eval.dcgWeight(2)
    assert(got == ((1L, 2L, idcg, idcg, 1000000L)), got.toString)
  }

  test("nDCG integration: LSH vs brute matches a driver-side reference") {
    val k = 10
    val e = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val approx = Similarity.lshTopK(queries = q, corpus = e,
      qidCol = "vec_id", idCol = "vec_id", vecCol = "embedding",
      k = k, dim = 64, planes = 16, bandBits = 2)
    val exact = Similarity.bruteForceTopK(queries = q, corpus = e,
      qidCol = "vec_id", idCol = "vec_id", vecCol = "embedding", k = k)
    val got = Eval.ndcgAtK(approx, exact, "qid", "nid", "rk", k)
      .orderBy("qid").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val ap = approx.select(col("qid").cast("long"),
        col("nid").cast("long"), col("rk").cast("long"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val exRows = exact.select(col("qid").cast("long"),
        col("nid").cast("long"), col("rk").cast("long"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    got.foreach { case (qid, nExact, dcg, idcg, ppm) =>
      val exq = exRows(qid)
      val apq = ap.getOrElse(qid, Map.empty[Long, Long])
      val wantDcg = exq.collect {
        case (_, id, erk) if apq.contains(id) =>
          (k + 1 - erk) * Eval.dcgWeight(apq(id).toInt)
      }.sum
      val wantIdcg = (1 to exq.length).map(i =>
        (k + 1 - i).toLong * Eval.dcgWeight(i)).sum
      assert((nExact, dcg, idcg, ppm) ==
        ((exq.length.toLong, wantDcg, wantIdcg,
          1000000L * wantDcg / wantIdcg)), s"qid $qid")
    }
  }

  private def rougeRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("pair_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  test("rougeN hand fixture: clipping, identity, disjoint, short text") {
    val pairs = Seq(
      // identical texts: full overlap, F1 = 1e6
      (1L, "the cat sat on the mat", "the cat sat on the mat"),
      // clipped repeat: cand has "a a a a" (3x "a a"), ref "a a" (1x)
      // -> overlap min(3,1)=1; tc=3, tr=1
      (2L, "a a a a", "a a"),
      // disjoint
      (3L, "alpha beta gamma", "delta epsilon zeta"),
      // shorter than n: one truncated single-token window each side
      (4L, "hello", "hello"),
      // empty candidate
      (5L, "", "some text here")
    ).toDF("pair_id", "cand", "ref")
    val got = rougeRows(Eval.rougeN(pairs, "pair_id", "cand", "ref", 2))
    assert(got == Seq(
      // (pair_id, overlap, cand_grams, ref_grams, p, r, f1)
      (1L, 5L, 5L, 5L, 1000000L, 1000000L, 1000000L),
      (2L, 1L, 3L, 1L, 333333L, 1000000L, 500000L),
      (3L, 0L, 2L, 2L, 0L, 0L, 0L),
      (4L, 1L, 1L, 1L, 1000000L, 1000000L, 1000000L),
      (5L, 0L, 0L, 2L, 0L, 0L, 0L)), got.toString)
  }

  test("rougeN matches a driver-side clipped-count reference on real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
    val local = docs.as[(Long, String)].collect().toMap
    val n = 2
    def grams(s: String): Seq[String] = {
      val toks = graft.functions.TextFunctions.normalizeString(s)
        .split(" ").toSeq
      (0 to math.max(toks.length - n, 0))
        .map(i => toks.slice(i, i + n).mkString(" "))
        .filter(_.nonEmpty)
    }
    val ids = local.keys.toSeq.sorted
    val ref = ids.zip(ids.drop(30) ++ ids.take(30)).map { case (c, r) =>
      val (cg, rg) = (grams(local(c)), grams(local(r)))
      val (cc, rc) = (cg.groupBy(identity).view.mapValues(_.size),
        rg.groupBy(identity).view.mapValues(_.size))
      val o = cc.map { case (g, k) =>
        math.min(k, rc.getOrElse(g, 0)) }.sum.toLong
      val (tc, tr) = (cg.size.toLong, rg.size.toLong)
      (c, o, tc, tr,
        if (tc > 0) 1000000L * o / tc else 0L,
        if (tr > 0) 1000000L * o / tr else 0L,
        if (tc + tr > 0) 2000000L * o / (tc + tr) else 0L)
    }
    val cand = docs.select(col("doc_id").as("pair_id"),
      col("text").as("cand"))
    val refs = docs.select(col("doc_id").as("rid"),
      col("text").as("ref"))
    val rot = ids.zip(ids.drop(30) ++ ids.take(30))
      .toDF("pair_id", "rid")
    val paired = cand.join(rot, "pair_id").join(refs, "rid")
      .select(col("pair_id"), col("cand"), col("ref"))
    val got = rougeRows(Eval.rougeN(paired, "pair_id", "cand", "ref", n))
    assert(got == ref.sortBy(_._1), s"first diff: ${
      got.zip(ref.sortBy(_._1)).find(p => p._1 != p._2)}")
  }

  test("pairsPrecisionRecall: canonicalization, duplicates, empty sides") {
    def one(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long, Long, Long)].collect().head
    // approx holds (1,2) twice in both directions + a false positive;
    // exact holds (2,1) reversed + a missed pair
    val approx = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L))
      .toDF("id_a", "id_b")
    val exact = Seq((2L, 1L), (5L, 6L)).toDF("id_a", "id_b")
    val got = one(Eval.pairsPrecisionRecall(approx, exact,
      "id_a", "id_b"))
    // na=2 {(1,2),(3,4)}, ne=2 {(1,2),(5,6)}, hit=1
    assert(got == ((2L, 2L, 1L, 500000L, 500000L, 500000L)),
      got.toString)
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(one(Eval.pairsPrecisionRecall(empty, exact, "id_a", "id_b"))
      == ((0L, 2L, 0L, 0L, 0L, 0L)))
    assert(one(Eval.pairsPrecisionRecall(approx, empty, "id_a", "id_b"))
      == ((2L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("blockingPairs: superset of jaccard pairs; minCommon monotone") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"))
        .as[(Long, Long)].collect().toSet
    val b1 = pairs(graft.operators.Dedup.blockingPairs(docs, "doc_id",
      "text", shingleN = 3, minCommon = 1))
    val b3 = pairs(graft.operators.Dedup.blockingPairs(docs, "doc_id",
      "text", shingleN = 3, minCommon = 3))
    val truth = pairs(graft.operators.Dedup.jaccardPairs(docs, "doc_id",
      "text", shingleN = 3, threshold = 0.2))
    assert(b3.subsetOf(b1))
    // minCommon = 1 is recall-complete for any positive threshold
    assert(truth.subsetOf(b1))
  }

  test("aucPpm: separation, reversal, ties, and a brute-force pair reference") {
    def auc(rows: Seq[(Long, Long)]) =
      Eval.aucPpm(rows.toDF("s", "y"), "s", "y")
        .as[(Long, Long, Long)].collect().head
    // perfect separation / reversal / coin-flip ties
    assert(auc(Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))) ==
      ((2L, 2L, 1000000L)))
    assert(auc(Seq((4L, 0L), (3L, 0L), (1L, 1L), (2L, 1L))) ==
      ((2L, 2L, 0L)))
    assert(auc(Seq((7L, 0L), (7L, 1L), (7L, 0L), (7L, 1L))) ==
      ((2L, 2L, 500000L)))
    // degenerate single-class input scores 0, not a crash
    assert(auc(Seq((1L, 1L), (2L, 1L))) == ((2L, 0L, 0L)))
    // seeded fixture vs the O(nP*nN) definition
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(2).toLong))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val num = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val want = 1000000L * num / (2L * pos.length * neg.length)
    assert(auc(rows) == ((pos.length.toLong, neg.length.toLong, want)))
  }

  test("confusionMatrix: multiclass cells with exact row shares") {
    import spark.implicits._
    val rows = Seq(("en", "en"), ("en", "en"), ("en", "de"),
      ("de", "de"), ("fr", "en"), ("fr", null))
      .toDF("actual", "pred")
    val got = Eval.confusionMatrix(rows, "actual", "pred")
      .as[(String, String, Long, Long)].collect().toSet
    // en: 2/3 correct (666666), 1/3 de ; de: 1/1 ; fr: null dropped,
    // remaining 1 row -> en 100%
    assert(got == Set(("en", "en", 2L, 666666L),
      ("en", "de", 1L, 333333L), ("de", "de", 1L, 1000000L),
      ("fr", "en", 1L, 1000000L)), got.toString)
  }

  test("confusionPpm: exact cells and single-division F1") {
    import spark.implicits._
    // tp=3 fp=1 fn=2 tn=4
    val rows = Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, 0L), (0L, 1L),
      (0L, 1L), (0L, 0L), (0L, 0L), (0L, 0L), (0L, 0L))
      .toDF("pred", "y")
    val got = Eval.confusionPpm(rows, "pred", "y")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    // precision 3/4 = 750000; recall 3/5 = 600000;
    // f1 = 2*3/(6+1+2) = 6/9 -> 666666
    assert(got == ((3L, 1L, 2L, 4L, 750000L, 600000L, 666666L)),
      got.toString)
    // degenerate: no positives anywhere -> zeros, not nulls
    val none = Seq((0L, 0L), (0L, 0L)).toDF("pred", "y")
    val z = Eval.confusionPpm(none, "pred", "y")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(z == ((0L, 0L, 0L, 2L, 0L, 0L, 0L)), z.toString)
  }

  test("calibrationBins: exact ppm reliability rows on a hand fixture") {
    import spark.implicits._
    // scale 8, 4 bins (width 2): p=8 must clamp into the last bin
    val rows = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L),
      (6L, 1L), (7L, 1L), (8L, 1L), (8L, 0L)).toDF("p", "y")
    val got = Eval.calibrationBins(rows, "p", "y", scale = 8L,
        bins = 4)
      .orderBy($"bin")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // bin 0 (p 0,1): n=2 pos=0 meanp=(1e6*1)/(2*8)=62500 rate=0
    //   brier=(1e6*(0+1))/(2*64)=7812
    // bin 1 (p 2,3): n=2 pos=1 meanp=(1e6*5)/16=312500 rate=500000
    //   brier=(1e6*(4+25))/128=226562
    // bin 3 (p 6,7,8,8): n=4 pos=3 meanp=(1e6*29)/32=906250
    //   rate=750000 brier=(1e6*(4+1+0+64))/256=269531
    assert(got == Seq(
      (0L, 2L, 0L, 62500L, 0L, 7812L),
      (1L, 2L, 1L, 312500L, 500000L, 226562L),
      (3L, 4L, 3L, 906250L, 750000L, 269531L)), got.toString)
    intercept[IllegalArgumentException] {
      Eval.calibrationBins(rows, "p", "y", scale = 0L)
    }
    intercept[IllegalArgumentException] {
      Eval.calibrationBins(rows, "p", "y", scale = 8L, bins = 0)
    }
  }
}
