package graft.plans

import graft.SparkSpec
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.Dedup
import graft.pipelines.Enrichment
import org.apache.spark.sql.functions._

/** Native expressions must be bit-equal to the composed-builtin forms
  * they replace — checked over real testdata, not toy rows.
  */
class NativeExprsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200)

  test("graft_cosine == composed cosine, bit-exact incl. float arrays") {
    val pairs = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("vb")))
      .limit(5000)
    val diff = pairs.select(
      VectorFunctions.cosine($"va", $"vb").as("nat"),
      VectorFunctions.cosineHof($"va", $"vb").as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("graft_cosine returns null on zero vectors") {
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(z.select(VectorFunctions.cosine($"a", $"b")).head().isNullAt(0))
  }

  test("cosine + norm-tokens fuse into WholeStageCodegen (real doGenCode)") {
    // a CodegenFallback expression would push the WHOLE projection out
    // of the fused (starred) stage; with real doGenCode the Project
    // carrying both kernels stays starred
    val cosPlan = emb.select(
      VectorFunctions.cosine($"embedding", $"embedding").as("c"),
      (length(lit("x")) + 1).as("builtin"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*graft_cosine".r
      .findFirstIn(cosPlan).isDefined, cosPlan)
    val tokPlan = docs.select(TextFunctions.tokens($"text").as("t"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*graft_norm_tokens".r
      .findFirstIn(tokPlan).isDefined, tokPlan)
    val shPlan = docs.select(TextFunctions.shingles($"text", 3).as("sh"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*graft_shingles".r
      .findFirstIn(shPlan).isDefined, shPlan)
  }


  test("graft_nfc == JDK Normalizer; fast path; codegen-starred") {
    val cases = Seq(
      "plain ascii", "", "we\u0301z", "o\u0308", "\u1100\u1161",
      "\u00e9 already nfc", "mixed e\u0301 and \u00e9 and \u1100\u1161",
      "tail combining e\u0301\u0301", null.asInstanceOf[String])
    val got = cases.toDF("s")
      .select(TextFunctions.nfc($"s")).as[String].collect()
    val want = cases.map(c =>
      if (c == null) null
      else java.text.Normalizer.normalize(c, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
    // composition really happened: the combining pair became one char
    assert(got(2) == "w\u00e9z" && got(4).length == 1)
    // already-normalized input is returned unchanged (identity fast path
    // at the kernel level; value equality is the observable contract)
    assert(got(0) == "plain ascii")
    // the kernel stays inside the fused codegen stage (a local-Seq
    // frame would collapse to LocalTableScan — use the file scan)
    val plan = docs.select(TextFunctions.nfc($"text").as("n"))
      .queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[[^\\n]*graft_nfc".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("strict codegen mode: generated kernels compile and agree") {
    // CODEGEN_ONLY makes a Janino failure throw instead of silently
    // falling back to interpreted eval, so a broken doGenCode cannot
    // hide behind passing results
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val pairs = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
        .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("vb")))
        .limit(500)
      val diff = pairs.select(
        VectorFunctions.cosine($"va", $"vb").as("nat"),
        VectorFunctions.cosineHof($"va", $"vb").as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(diff == 0)
      val tokDiff = docs.select(
        TextFunctions.tokens($"text").as("nat"),
        TextFunctions.tokensHof($"text").as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(tokDiff == 0)
      val shDiff = docs.select(
        TextFunctions.shingles($"text", 3).as("nat"),
        TextFunctions.shinglesHof($"text", 3).as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(shDiff == 0)
      // every remaining kernel: generated call compiles and agrees with
      // its composed/driver-side twin under forced codegen
      val sh = docs.select(
        array_distinct(TextFunctions.shingles($"text", 3)).as("sh"),
        TextFunctions.tokens($"text").as("t"), $"text")
      val kernelDiff = sh.select(
        Dedup.minhashSignature($"sh", 8).as("mh_nat"),
        Dedup.minhashSignatureHof($"sh", 8).as("mh_hof"),
        Dedup.simhash($"t").as("sx_nat"),
        Dedup.simhashHof($"t").as("sx_hof"),
        TextFunctions.rollingHash($"text").as("rh"),
        Enrichment.hashEmbedding($"text", 16).as("he_nat"),
        Enrichment.hashEmbeddingHof($"text", 16).as("he_hof"))
        .filter(!($"mh_nat" <=> $"mh_hof") || !($"sx_nat" <=> $"sx_hof") ||
          !($"he_nat" <=> $"he_hof")).count()
      assert(kernelDiff == 0)
      import graft.operators.Similarity
      val hp = Similarity.hyperplanes(8, 64)
      val psDiff = emb.select(
        Similarity.planeSignature($"embedding", hp).as("nat"),
        Similarity.planeSignatureHof($"embedding", hp).as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(psDiff == 0)
      import graft.functions.GeoFunctions
      val ringDf = Seq((0.2, 0.7)).toDF("px", "py").select($"px", $"py",
        array(struct(lit(0.0).as("x"), lit(0.0).as("y")),
          struct(lit(1.0).as("x"), lit(0.0).as("y")),
          struct(lit(1.0).as("x"), lit(1.0).as("y")),
          struct(lit(0.0).as("x"), lit(1.0).as("y"))).as("ring"))
      val pipDiff = ringDf.select(
        GeoFunctions.pointInPolygon($"px", $"py", $"ring").as("nat"),
        GeoFunctions.pointInPolygonHof($"px", $"py", $"ring").as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(pipDiff == 0)
      val bbDiff = ringDf.select(
        call_function("graft_poly_bbox", $"ring").as("nat"),
        struct(
          array_min(transform($"ring", p => p.getField("x"))).as("minx"),
          array_max(transform($"ring", p => p.getField("x"))).as("maxx"),
          array_min(transform($"ring", p => p.getField("y"))).as("miny"),
          array_max(transform($"ring", p => p.getField("y"))).as("maxy"))
          .as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(bbDiff == 0)
    } finally spark.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("graft_poly_bbox == composed min/max HOFs; empty ring is null") {
    val rnd = new scala.util.Random(3)
    val rings = (1 to 30).map { i =>
      val n = 3 + rnd.nextInt(8)
      (i.toLong,
        Seq.fill(n)((rnd.nextDouble() * 100 - 50, rnd.nextDouble() * 100 - 50)))
    }.toDF("id", "pts")
      .select($"id", transform($"pts", p =>
        struct(p.getField("_1").as("x"), p.getField("_2").as("y"))).as("ring"))
    val diff = rings.select(
      call_function("graft_poly_bbox", $"ring").as("nat"),
      struct(
        array_min(transform($"ring", p => p.getField("x"))).as("minx"),
        array_max(transform($"ring", p => p.getField("x"))).as("maxx"),
        array_min(transform($"ring", p => p.getField("y"))).as("miny"),
        array_max(transform($"ring", p => p.getField("y"))).as("maxy"))
        .as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
    val empty = Seq(1).toDF("id").select(
      expr("cast(array() as array<struct<x:double,y:double>>)").as("ring"))
    assert(empty.select(call_function("graft_poly_bbox", $"ring"))
      .head().isNullAt(0))
    // NULL elements and NULL coord fields are skipped per field like
    // the HOF form, not NPE'd; an all-null ring yields a null bbox
    val dirty = Seq(1).toDF("id").select(expr(
      """array(named_struct('x', cast(null as double), 'y', 2.0d),
        |      cast(null as struct<x:double,y:double>),
        |      named_struct('x', 3.0d, 'y', 7.0d),
        |      named_struct('x', -1.0d, 'y', 5.0d))""".stripMargin).as("ring"))
    val bb = dirty.select(call_function("graft_poly_bbox", $"ring")).head()
      .getStruct(0)
    assert((bb.getDouble(0), bb.getDouble(1), bb.getDouble(2),
      bb.getDouble(3)) == (-1.0, 3.0, 2.0, 7.0))
    val allNull = Seq(1).toDF("id").select(expr(
      "array(cast(null as struct<x:double,y:double>))").as("ring"))
    assert(allNull.select(call_function("graft_poly_bbox", $"ring"))
      .head().isNullAt(0))
  }

  test("graft_minhash == composed minhash") {
    val sh = docs.select(
      array_distinct(TextFunctions.shingles($"text", 3)).as("sh"))
    val diff = sh.select(
      Dedup.minhashSignature($"sh", 16).as("nat"),
      Dedup.minhashSignatureHof($"sh", 16).as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("graft_simhash == composed simhash") {
    val toks = docs.select(TextFunctions.tokens($"text").as("t"))
    val diff = toks.select(
      Dedup.simhash($"t").as("nat"), Dedup.simhashHof($"t").as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("graft_simhash_md5 == driver-side MessageDigest reference") {
    // plain-Scala reference: first 8 MD5 digest bytes big-endian,
    // ±1 vote per bit plane, multiset semantics
    def ref(toks: Seq[String]): Long = {
      val votes = new Array[Int](64)
      val md = java.security.MessageDigest.getInstance("MD5")
      toks.foreach { t =>
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        val v = (0 until 8).foldLeft(0L)((a, b) => (a << 8) | (d(b) & 0xffL))
        (0 until 64).foreach(j =>
          if (((v >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
      }
      (0 until 64).foldLeft(0L)((s, j) => if (votes(j) > 0) s | (1L << j) else s)
    }
    val edge: Seq[Seq[String]] = Seq(
      Seq("the", "quick", "brown", "fox", "the"), // duplicate votes count
      Seq("émigré", "wörld"),                     // UTF-8 multibyte
      Seq(""),                                    // split("") token
      Seq())                                      // empty doc
    val got = edge.toDF("t")
      .select(Dedup.simhashMd5($"t").as("sig")).collect().map(_.getLong(0))
    assert(got.toSeq == edge.map(ref))
    // and over real corpus text end-to-end through the tokenizer
    // (tokens themselves are pinned to the composed form elsewhere)
    val fromDocs = docs.limit(20)
      .select(TextFunctions.tokens($"text").as("toks"),
        Dedup.simhashMd5(TextFunctions.tokens($"text")).as("sig"))
      .collect()
    fromDocs.foreach { r =>
      assert(r.getLong(1) == ref(r.getSeq[String](0)))
    }
  }

  test("graft_rolling_hash == driver-side wrapping Horner reference") {
    // java-wrap reference over the normalized text (ASCII by invariant)
    def ref(normalized: String): Long =
      normalized.foldLeft(0L)((acc, ch) => acc * 31L + ch.toLong)
    val edge = Seq("", "!!!", "a", "abc 123", "x" * 500).toDF("text")
    for (df <- Seq(docs.limit(50).select($"text"), edge)) {
      val rows = df.select(
        TextFunctions.normalizeText($"text").as("nrm"),
        TextFunctions.rollingHash($"text").as("nat")).collect()
      rows.foreach(r => assert(r.getLong(1) == ref(r.getString(0))))
    }
    // long texts wrap far past Long.MaxValue without erroring (ANSI-safe)
    val wrapped = edge.filter(length($"text") === 500)
      .select(TextFunctions.rollingHash($"text")).head().getLong(0)
    assert(wrapped != ("x" * 13).foldLeft(0L)((a, c) => a * 31 + c))
  }

  test("graft_norm_tokens == composed tokens, incl. empty/punct-only") {
    val edge = Seq("", "!!!", "  A  b ", "héllo wörld", "a1b2").toDF("text")
    for (df <- Seq(docs.select($"text"), edge)) {
      val diff = df.select(
        TextFunctions.tokens($"text").as("nat"),
        TextFunctions.tokensHof($"text").as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(diff == 0)
    }
  }

  test("graft_shingles == composed shingles, incl. short texts") {
    val edge = Seq("", "one", "one two", "one two three four").toDF("text")
    for (df <- Seq(docs.select($"text"), edge)) {
      val diff = df.select(
        TextFunctions.shingles($"text", 3).as("nat"),
        TextFunctions.shinglesHof($"text", 3).as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
      assert(diff == 0)
    }
  }

  test("graft_hash_embedding == composed hash embedding") {
    val diff = docs.select(
      Enrichment.hashEmbedding($"text", 32).as("nat"),
      Enrichment.hashEmbeddingHof($"text", 32).as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("graft_cosine returns null on mismatched dimensions (zip_with parity)") {
    val z = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(z.select(VectorFunctions.cosine($"a", $"b")).head().isNullAt(0))
    assert(z.select(VectorFunctions.cosineHof($"a", $"b")).head().isNullAt(0))
  }

  test("graft_minhash empty shingle set == k x Long.MaxValue (HOF parity)") {
    val empty = Seq(Seq.empty[String], Seq("a b c")).toDF("sh")
    val rows = empty.select(
      Dedup.minhashSignature($"sh", 4).as("nat"),
      Dedup.minhashSignatureHof($"sh", 4).as("hof")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    assert(rows(0).getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
  }

  test("graft_pip == composed ray-cast PIP over random points") {
    import graft.functions.GeoFunctions
    // Non-convex ring (open form); grid of probe points crossing edges,
    // vertices, and the concavity.
    val ring = Seq((-3.0, -2.0), (4.0, -1.5), (4.5, 3.0), (0.5, 0.5),
      (-1.0, 4.0), (-3.5, 2.0)).map { case (x, y) => (x, y) }
    val ringDf = Seq(1).toDF("one").select(
      array(ring.map { case (x, y) =>
        struct(lit(x).as("x"), lit(y).as("y")) }: _*).as("ring"))
    val pts = (for (i <- -60 to 60; j <- -60 to 60)
      yield (i / 10.0, j / 10.0)).toDF("px", "py")
    val diff = pts.crossJoin(ringDf).select(
      GeoFunctions.pointInPolygon($"px", $"py", $"ring").as("nat"),
      GeoFunctions.pointInPolygonHof($"px", $"py", $"ring").as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("graft_marker_hits / graft_alpha_words == composed HOF twins") {
    val toksDf = docs.select(TextFunctions.tokens($"text").as("t"))
      .union(Seq(Seq.empty[String], Seq(""), Seq("the", "the", "x1", "9"),
        Seq("the", null, "a")).toDF("t"))
    val langDiff = TextFunctions.langMarkers.keys.toSeq.map { l =>
      toksDf.select(
        TextFunctions.markerHitsOf($"t", l).as("nat"),
        TextFunctions.markerHitsOfHof($"t", l).as("hof"))
        .filter(!($"nat" <=> $"hof")).count()
    }.sum
    assert(langDiff == 0)
    val alphaDiff = toksDf.select(
      TextFunctions.alphaWordsOf($"t").as("nat"),
      size(filter($"t", t => t.rlike("[a-z]"))).cast("long").as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(alphaDiff == 0)
    // unknown language: defined as zero hits
    assert(toksDf.select(TextFunctions.markerHitsOf($"t", "xx").as("h"))
      .filter($"h" =!= 0L).count() == 0)
  }

  test("graft_int_dot: exact integer dot, null on length mismatch") {
    import graft.functions.VectorFunctions
    // composed reference: zip_with product + aggregate sum over longs
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, x) => acc + x)
    val qz = emb.select($"vec_id", $"embedding".as("v"),
        VectorFunctions.i8Scale($"embedding").as("s"))
      .select($"vec_id",
        VectorFunctions.i8Quantize($"v", $"s").as("q"))
    val pairs = qz.select($"q".as("qa"))
      .crossJoin(qz.limit(5).select($"q".as("qb")))
    val diff = pairs.select(
      VectorFunctions.intDot($"qa", $"qb").as("nat"),
      hofDot($"qa", $"qb").as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
    // quantization bound: |x - q*scale| <= scale/2 per element
    val bad = emb.select($"embedding".as("v"),
        VectorFunctions.i8Scale($"embedding").as("s"))
      .select($"v", $"s", VectorFunctions.i8Quantize($"v", $"s").as("q"))
      .select(aggregate(zip_with($"v", $"q",
        (x, y) => abs(x.cast("double") - y.cast("double") * $"s")),
        lit(0.0), (m, e) => greatest(m, e)).as("maxErr"), $"s")
      .filter($"maxErr" > $"s" * 0.5 + 1e-12)
    assert(bad.count() == 0)
    // length mismatch → null (cosine parity contract)
    val mm = Seq((Seq(1.toByte, 2.toByte), Seq(1.toByte))).toDF("a", "b")
    assert(mm.select(VectorFunctions.intDot($"a", $"b")).head().isNullAt(0))
  }

  test("graft_plane_sig == composed hyperplane signature over embeddings") {
    import graft.operators.Similarity
    val hp = Similarity.hyperplanes(16, 64)
    val diff = emb.select(
      Similarity.planeSignature($"embedding", hp).as("nat"),
      Similarity.planeSignatureHof($"embedding", hp).as("hof"))
      .filter(!($"nat" <=> $"hof")).count()
    assert(diff == 0)
  }

  test("graft_plane_sig: NaN dot follows Spark SQL semantics, bit set") {
    import graft.operators.Similarity
    val hp = Similarity.hyperplanes(8, 4)
    val nan = Seq(
      Seq(Double.NaN, 1.0, -2.0, 0.5),  // NaN poisons every plane's dot
      Seq(0.0, Double.NaN, 0.0, 0.0))
      .toDF("embedding")
    val rows = nan.select(
      Similarity.planeSignature($"embedding", hp).as("nat"),
      Similarity.planeSignatureHof($"embedding", hp).as("hof")).collect()
    // Spark SQL orders NaN above every double, so `dot > 0` is TRUE:
    // all 8 bits set — and native must agree with the HOF twin
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) == 255L)
    }
  }
}
