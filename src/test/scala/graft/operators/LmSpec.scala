package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stupid-backoff scoring (Brants et al. 2007): differential vs a
  * driver-side reference (all three branches — hit, unigram backoff,
  * OOV floor), degenerate docs, plan shape, and the quantization
  * margin audit the hash-compared oracle rests on.
  */
class LmSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private val tgtSrcs = Seq("src0", "src1")
  private def tgt = docs.filter(col("source").isin(tgtSrcs: _*))

  private def refTokens(text: String): Seq[String] = {
    val nrm = Option(text).getOrElse("").toLowerCase
      .replaceAll("[^a-z0-9]+", " ").replaceAll("\\s+", " ").trim
    if (nrm.isEmpty) Seq.empty else nrm.split(" ").toSeq
  }
  private def refBigrams(ts: Seq[String]): Seq[String] =
    if (ts.size < 2) Seq.empty
    else ts.sliding(2).map(_.mkString(" ")).toSeq

  test("differential: distributed scores == driver-side reference, all branches") {
    val got = Lm.stupidBackoffScores(docs, tgt, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val tgtToks = tgt.select("text").as[String].collect().map(refTokens)
    val bc = tgtToks.flatMap(refBigrams).groupBy(identity)
      .map { case (g, gs) => g -> gs.size.toLong }
    val uc = tgtToks.flatten.groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val n = uc.values.sum
    val v = uc.size.toLong
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(got.size == all.length)
    var hits = 0L; var backs = 0L; var oovs = 0L
    all.foreach { case (id, text) =>
      val gs = refBigrams(refTokens(text))
      var h = 0L; var b = 0L; var s = 0L
      gs.foreach { g =>
        val Array(w1, w2) = g.split(" ", 2)
        val y =
          if (bc.contains(g)) {
            h += 1
            math.log(bc(g).toDouble / uc(w1).toDouble)
          } else if (uc.contains(w2)) {
            b += 1
            math.log(0.4 * (uc(w2).toDouble / n.toDouble))
          } else math.log(0.4 / v.toDouble)
        s += math.floor(Lm.Scale * y).toLong
      }
      hits += h; backs += b; oovs += gs.size - h - b
      assert(got(id) == ((gs.size.toLong, h, b, s)),
        s"doc $id: got ${got(id)}, want (${gs.size}, $h, $b, $s)")
    }
    // the src0-1 target slice must exercise hit AND backoff branches
    // on this fixture (OOV requires a token absent from the target
    // vocabulary — assert only if the fixture provides one)
    assert(hits > 0 && backs > 0,
      s"fixture exercises hit=$hits backoff=$backs oov=$oovs")
  }

  test("degenerate docs (< 2 tokens, empty, NULL) stay at all-zero") {
    val funky = Seq((1L, "one"), (2L, ""), (3L, null: String),
      (4L, "two words")).toDF("doc_id", "text")
    val out = Lm.stupidBackoffScores(funky, tgt, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 4)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._2 == 0 && out(id)._3 == 0 && out(id)._4 == 0 &&
        out(id)._5 == 0, s"doc $id: ${out(id)}")
    }
    assert(out(4L)._2 == 1)
  }

  test("hand fixture: hit / backoff / OOV score exactly per the paper's rule") {
    // target: "a b a b a c" → c(a)=3 c(b)=2 c(c)=1, N=6 V=3
    // bigrams: ab×2 ba×2 ac×1
    val t0 = Seq((0L, "a b a b a c")).toDF("doc_id", "text")
    // corpus doc: "b a c z" → transitions: "b a" hit ln(2/2)=0;
    // "a c" hit ln(1/3); "c z" OOV ln(0.4/3)
    val c0 = Seq((7L, "b a c z")).toDF("doc_id", "text")
    val r = Lm.stupidBackoffScores(c0, t0, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].head()
    val want = math.floor(1e6 * math.log(2.0 / 2.0)).toLong +
      math.floor(1e6 * math.log(1.0 / 3.0)).toLong +
      math.floor(1e6 * math.log(0.4 / 3.0)).toLong
    assert(r == ((7L, 3L, 2L, 0L, want)), r.toString)
    // backoff branch: "c b" unseen bigram, b in vocab → 0.4·(2/6)
    val c1 = Seq((8L, "c b")).toDF("doc_id", "text")
    val r1 = Lm.stupidBackoffScores(c1, t0, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].head()
    val wantB = math.floor(1e6 * math.log(0.4 * (2.0 / 6.0))).toLong
    assert(r1 == ((8L, 1L, 0L, 1L, wantB)), r1.toString)
  }

  test("target-trained model prefers target-like docs") {
    val scored = Lm.stupidBackoffScores(docs, tgt, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .filter(col("n_bigrams") > 0)
      .groupBy(col("source").isin(tgtSrcs: _*).as("is_tgt"))
      .agg(avg(col("sb_score").cast("double") /
        col("n_bigrams").cast("double")).as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(scored(true) > scored(false),
      s"target docs should score higher: $scored")
  }

  test("plan: no cartesian product, no window; ONE doc-keyed final agg exchange") {
    val out = Lm.stupidBackoffScores(docs, tgt, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
    assert("hashpartitioning\\(doc_id".r.findAllIn(plan).size == 1,
      s"exactly ONE doc-keyed aggregation exchange:\n$plan")
  }

  test("empty/token-less target fails fast instead of scoring garbage") {
    val corpus = Seq((1L, "two words")).toDF("doc_id", "text")
    val noneTgt = docs.filter(col("source") === "no_such_source")
    val e = intercept[Exception] {
      Lm.stupidBackoffScores(corpus, noneTgt, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("V = 0") ||
      Option(e.getCause).exists(_.getMessage.contains("V = 0")), e.toString)
  }

  // ---- trigram recursive backoff ----

  private def refTrigrams(ts: Seq[String]): Seq[String] =
    if (ts.size < 3) Seq.empty
    else ts.sliding(3).map(_.mkString(" ")).toSeq

  test("trigram differential: distributed scores == reference, four branches") {
    val got = Lm.stupidBackoffTrigramScores(docs, tgt, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val tgtToks = tgt.select("text").as[String].collect().map(refTokens)
    val tc = tgtToks.flatMap(refTrigrams).groupBy(identity)
      .map { case (g, gs) => g -> gs.size.toLong }
    val bc = tgtToks.flatMap(refBigrams).groupBy(identity)
      .map { case (g, gs) => g -> gs.size.toLong }
    val uc = tgtToks.flatten.groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val n = uc.values.sum
    val v = uc.size.toLong
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    assert(got.size == all.length)
    var h3s = 0L; var h2s = 0L; var b1s = 0L
    all.foreach { case (id, text) =>
      val gs = refTrigrams(refTokens(text))
      var h3 = 0L; var h2 = 0L; var b1 = 0L; var s = 0L
      gs.foreach { g =>
        val Array(w1, w2, w3) = g.split(" ", 3)
        val y =
          if (tc.contains(g)) {
            h3 += 1
            math.log(tc(g).toDouble / bc(s"$w1 $w2").toDouble)
          } else if (bc.contains(s"$w2 $w3")) {
            h2 += 1
            math.log(0.4 * (bc(s"$w2 $w3").toDouble / uc(w2).toDouble))
          } else if (uc.contains(w3)) {
            b1 += 1
            math.log(0.4 * 0.4 * (uc(w3).toDouble / n.toDouble))
          } else math.log(0.4 * 0.4 / v.toDouble)
        s += math.floor(Lm.Scale * y).toLong
      }
      h3s += h3; h2s += h2; b1s += b1
      assert(got(id) == ((gs.size.toLong, h3, h2, b1, s)),
        s"doc $id: got ${got(id)}, want (${gs.size}, $h3, $h2, $b1, $s)")
    }
    // the cross-source fixture must exercise the recursive levels
    assert(h3s > 0 && h2s > 0,
      s"fixture exercises hit3=$h3s hit2=$h2s back1=$b1s")
  }

  test("trigram hand fixture: every backoff level scores per the recursion") {
    // target: "a b c a b d" → trigrams: abc, bca, cab, abd
    // bigrams: ab×2 bc ca bd ; unigrams: a×2 b×2 c d ; N=6 V=4
    val t0 = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    // probe "a b c d z a": transitions
    //  "a b c" seen       → ln(1/2)            (c123/c12, hit3)
    //  "b c d" unseen, bigram "c d" unseen, d in vocab
    //                     → ln(0.16·(1/6))     (back1)
    //  "c d z" unseen, "d z" unseen, z OOV → ln(0.16/4)  (floor)
    //  "d z a" unseen, "z a" unseen, a in vocab → ln(0.16·(2/6))
    val c0 = Seq((7L, "a b c d z a")).toDF("doc_id", "text")
    val r = Lm.stupidBackoffTrigramScores(c0, t0, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val want = math.floor(1e6 * math.log(1.0 / 2.0)).toLong +
      math.floor(1e6 * math.log(0.4 * 0.4 * (1.0 / 6.0))).toLong +
      math.floor(1e6 * math.log(0.4 * 0.4 / 4.0)).toLong +
      math.floor(1e6 * math.log(0.4 * 0.4 * (2.0 / 6.0))).toLong
    assert(r == ((7L, 4L, 1L, 0L, 2L, want)), r.toString)
    // hit2 level: probe "x b c" has trigram unseen (x OOV) but the
    // SUFFIX bigram "b c" seen → α·c(bc)/c(b) = 0.4·(1/2)
    val c1 = Seq((8L, "x b c")).toDF("doc_id", "text")
    val r1 = Lm.stupidBackoffTrigramScores(c1, t0, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val wantB = math.floor(1e6 * math.log(0.4 * (1.0 / 2.0))).toLong
    assert(r1 == ((8L, 1L, 0L, 1L, 0L, wantB)), r1.toString)
  }

  test("trigram degenerate docs (< 3 tokens) stay at all-zero") {
    val funky = Seq((1L, "one two"), (2L, ""), (3L, null: String),
      (4L, "three word doc")).toDF("doc_id", "text")
    val out = Lm.stupidBackoffTrigramScores(funky, tgt, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 4)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._2 == 0 && out(id)._6 == 0, s"doc $id: ${out(id)}")
    }
    assert(out(4L)._2 == 1)
  }

  test("trigram plan: no cartesian, ONE doc-keyed final agg exchange") {
    val out = Lm.stupidBackoffTrigramScores(docs, tgt, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert("hashpartitioning\\(doc_id".r.findAllIn(plan).size == 1,
      s"exactly ONE doc-keyed aggregation exchange:\n$plan")
  }

  test("trigram quantization-margin guard mirrors the bigram kit") {
    val m = Lm.minQuantizationMarginTrigram(docs, tgt, "doc_id", "text")
    assert(m > 0 && m <= 0.5, s"margin $m")
    info(f"trigram fixture quantization margin = $m%.3e")
    val boom = intercept[IllegalStateException] {
      Lm.stupidBackoffTrigramScores(docs, tgt, "doc_id", "text",
        minQuantMargin = Some(m + 1e-12))
    }
    assert(boom.getMessage.contains("quantization margin"), boom.getMessage)
  }

  test("quantization-margin guard: throws above the fixture's margin, passes below") {
    val m = Lm.minQuantizationMargin(docs, tgt, "doc_id", "text")
    assert(m > 0 && m <= 0.5, s"margin $m")
    info(f"fixture quantization margin = $m%.3e")
    val ok = Lm.stupidBackoffScores(docs, tgt, "doc_id", "text",
      minQuantMargin = Some(m / 2)).count()
    assert(ok == docs.count())
    val boom = intercept[IllegalStateException] {
      Lm.stupidBackoffScores(docs, tgt, "doc_id", "text",
        minQuantMargin = Some(m + 1e-12))
    }
    assert(boom.getMessage.contains("quantization margin"), boom.getMessage)
  }

  // ---- interpolated Kneser-Ney ----

  test("KN differential: distributed scores == driver-side reference, branch counts") {
    val got = Lm.kneserNeyScores(docs, tgt, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val tgtToks = tgt.select("text").as[String].collect().map(refTokens)
    val bc = tgtToks.flatMap(refBigrams).groupBy(identity)
      .map { case (g, gs) => g -> gs.size.toLong }
    val uc = tgtToks.flatten.groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    // .toSeq first: bc.keys is set-backed, a direct .map would collapse
    // duplicate first/second words and leave every N1+ count at 1
    val n1f = bc.keys.toSeq.map(_.split(" ", 2)(0)).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val n1b = bc.keys.toSeq.map(_.split(" ", 2)(1)).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }
    val b = bc.size.toLong
    val v = uc.size.toLong
    val all = docs.select("doc_id", "text").as[(Long, String)].collect()
    var tops = 0L; var interps = 0L; var conts = 0L; var floors = 0L
    all.foreach { case (id, text) =>
      val gs = refBigrams(refTokens(text))
      var t = 0L; var i = 0L; var c = 0L; var s = 0L
      gs.foreach { g =>
        val Array(w1, w2) = g.split(" ", 2)
        val y =
          if (bc.contains(g)) {
            t += 1
            val num = (4L * bc(g) - 3L) * b + 3L * n1f(w1) * n1b(w2)
            math.log(num.toDouble / (4L * uc(w1) * b).toDouble)
          } else if (uc.contains(w1) && n1f.contains(w1) &&
              n1b.contains(w2)) {
            i += 1
            val num = 3L * n1f(w1) * n1b(w2)
            math.log(num.toDouble / (4L * uc(w1) * b).toDouble)
          } else if (n1b.contains(w2)) {
            c += 1
            math.log(n1b(w2).toDouble / b.toDouble)
          } else math.log(1.0 / v.toDouble)
        s += math.floor(Lm.Scale * y).toLong
      }
      tops += t; interps += i; conts += c; floors += gs.size - t - i - c
      assert(got(id) == ((gs.size.toLong, t, i, c, s)),
        s"doc $id: got ${got(id)}, want (${gs.size}, $t, $i, $c, $s)")
    }
    assert(tops > 0 && interps > 0,
      s"fixture exercises top=$tops interp=$interps cont=$conts floor=$floors")
  }

  test("KN hand fixture: each branch scores the interpolated formula") {
    // target: "a b", "a c", "b c" -> bc: ab ac bc (each 1); uc: a2 b2 c2
    // n1f: a->2 b->1; n1b: b->1 c->2; B=3 V=3
    val target = Seq((1L, "a b"), (2L, "a c"), (3L, "b c"))
      .toDF("doc_id", "text")
    // corpus doc exercises: "a b" top, "c a" w1-seen-but-continuationless
    // (c has no continuations -> n1f(c) null -> cont branch on a? n1b(a)
    // null -> floor), "b c" top, "c z" floor (z OOV)
    val corpus = Seq((10L, "a b c z")).toDF("doc_id", "text")
    val got = Lm.kneserNeyScores(corpus, target, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // transitions: "a b" (top), "b c" (top), "c z" (floor: z unseen)
    val yab = math.log(((4L * 1 - 3) * 3 + 3L * 2 * 1).toDouble /
      (4L * 2 * 3).toDouble)
    val ybc = math.log(((4L * 1 - 3) * 3 + 3L * 1 * 2).toDouble /
      (4L * 2 * 3).toDouble)
    val yz = math.log(1.0 / 3.0)
    val want = Seq(yab, ybc, yz)
      .map(y => math.floor(Lm.Scale * y).toLong).sum
    assert(got == ((10L, 3L, 2L, 0L, 0L, want)), got.toString)
  }

  test("KN cont branch: seen-continuation w2 under an unseen w1") {
    // "z a": w1 z unseen entirely, w2 a IS a continuation (b a)
    val target = Seq((1L, "b a"), (2L, "a c")).toDF("doc_id", "text")
    val corpus = Seq((10L, "z a")).toDF("doc_id", "text")
    val got = Lm.kneserNeyScores(corpus, target, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val want = math.floor(Lm.Scale * math.log(1.0 / 2.0)).toLong
    assert(got == ((10L, 1L, 0L, 0L, 1L, want)), got.toString)
  }

  test("KN plan: no cartesian beyond the one-row broadcast, ONE doc agg exchange") {
    val out = Lm.kneserNeyScores(docs, tgt, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Window"), plan)
    assert("hashpartitioning\\(doc_id".r.findAllIn(plan).size == 1,
      s"exactly ONE doc-keyed aggregation exchange:\n$plan")
  }

  test("KN quantization-margin guard mirrors the bigram kit") {
    val m = Lm.minQuantizationMarginKn(docs, tgt, "doc_id", "text")
    assert(m > 0 && m <= 0.5, s"margin $m")
    info(f"KN fixture quantization margin = $m%.3e")
    Lm.kneserNeyScores(docs, tgt, "doc_id", "text",
      minQuantMargin = Some(m / 2)).count()
    val boom = intercept[IllegalStateException] {
      Lm.kneserNeyScores(docs, tgt, "doc_id", "text",
        minQuantMargin = Some(m + 1e-12))
    }
    assert(boom.getMessage.contains("quantization margin"), boom.getMessage)
  }
}
