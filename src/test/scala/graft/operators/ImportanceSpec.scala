package graft.operators

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
  private val tgtSrcs = Seq("src0", "src1", "src2")
  private def tgt = docs.filter(col("source").isin(tgtSrcs: _*))
  private def raw = docs.filter(!col("source").isin(tgtSrcs: _*))

  // ---- driver-side reference (independent of the Column kernels) ----
  private def refTokens(text: String): Seq[String] = {
    val nrm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ")
      .replaceAll("\\s+", " ").trim
    if (nrm.isEmpty) Seq.empty else nrm.split(" ").toSeq
  }
  private def refGrams(text: String): Seq[String] = {
    val ts = refTokens(text)
    def ngrams(n: Int): Seq[String] =
      (0 to math.max(ts.size - n, 0)).map(i =>
        ts.slice(i, i + n).mkString(" ")).filter(_.nonEmpty)
    ngrams(1) ++ ngrams(2)
  }
  private def refBucket(g: String, salt: String, k: Int): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$salt:$g".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % k
  }

  test("differential: distributed scores == driver-side reference") {
    val k = 16
    val got = Importance
      .dsirScores(tgt, raw, "doc_id", "text", k = k, salt = "il-dsir")
      .as[(Long, Long, Long)].collect().toMap2
    val tgtDocs = tgt.select("text").as[String].collect()
    val rawDocs = raw.select("doc_id", "text").as[(Long, String)].collect()
    val ct = tgtDocs.flatMap(refGrams).groupBy(refBucket(_, "il-dsir", k))
      .map { case (b, gs) => b -> gs.size.toLong }
    val cr = rawDocs.flatMap(d => refGrams(d._2))
      .groupBy(refBucket(_, "il-dsir", k))
      .map { case (b, gs) => b -> gs.size.toLong }
    val (nt, nr) = (ct.values.sum, cr.values.sum)
    val w = (0L until k.toLong).map { b =>
      val x = ((ct.getOrElse(b, 0L) + 1).toDouble /
          (cr.getOrElse(b, 0L) + 1).toDouble) *
        ((nr + k).toDouble / (nt + k).toDouble)
      b -> math.floor(Importance.WeightScale * math.log(x)).toLong
    }.toMap
    assert(got.size == rawDocs.length)
    rawDocs.foreach { case (id, text) =>
      val gs = refGrams(text)
      val want = (gs.size.toLong,
        gs.map(g => w(refBucket(g, "il-dsir", k))).sum)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
    }
  }

  private implicit class Tup3Ops(rs: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rs.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("target-matching docs outscore off-distribution docs") {
    // docs from the target's own sources score high against a disjoint
    // raw pool — sanity that the sign of the estimator is right
    val half = docs.filter(col("source").isin("src3", "src4"))
    val scored = Importance.dsirScores(tgt, tgt.unionByName(half),
      "doc_id", "text", k = 64, salt = "sign")
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val means = scored
      .groupBy(col("source").isin(tgtSrcs: _*).as("is_tgt"))
      .agg(avg(col("score").cast("double")).as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false),
      s"target docs should outscore: $means")
  }

  test("featureless docs stay in the output at (0, 0)") {
    val funky = raw.limit(3).withColumn("text", lit("!!! ???"))
      .unionByName(raw.limit(2).withColumn("text", lit(null: String)))
      .withColumn("doc_id", monotonically_increasing_id() + 1000000)
      .unionByName(raw.limit(5))
    val out = Importance.dsirScores(tgt, funky, "doc_id", "text", k = 8)
    assert(out.count() == 10)
    val empty = out.filter(col("n_feats") === 0)
    assert(empty.count() == 5)
    assert(empty.filter(col("score") =!= 0).isEmpty)
  }

  test("plan: weight table broadcasts; ONE doc-keyed exchange; no window") {
    val w = Importance.hashedWeights(tgt, raw, "text", k = 8)
    assert(w.count() == 8)
    val out = Importance.score(raw, "doc_id", "text", w, k = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"), plan)
    assert("hashpartitioning\\(".r.findAllIn(plan).size == 1,
      s"score pass must exchange on the doc key only:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("weight table is deterministic across invocations") {
    val a = Importance.hashedWeights(tgt, raw, "text", k = 32)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val b = Importance.hashedWeights(tgt, raw, "text", k = 32)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.map(_._1) == (0L until 32L))
  }

  test("quantization-margin guard: boundary fixture throws, healthy fixture passes") {
    // identical target and raw: every bucket ratio x = 1 exactly, so
    // 10⁶·ln(x) = 0 sits ON its floor boundary — margin 0
    val boom = intercept[IllegalStateException] {
      Importance.hashedWeights(raw, raw, "text", k = 8,
        minQuantMargin = Some(1e-9))
    }
    assert(boom.getMessage.contains("quantization margin"), boom.getMessage)
    // the real gate fixture clears the audited envelope (≥ 5e-4
    // documented; demand well above ulp drift ~1e-9)
    assert(Importance.hashedWeights(tgt, raw, "text", k = 8,
      minQuantMargin = Some(1e-6)).count() == 8)
  }

  test("persistUpstream: raw materializes ONCE; scores unchanged") {
    val data = (0L until 40L).map(i => (i, s"tok$i alpha beta gamma"))
    val acc = spark.sparkContext.longAccumulator("raw-reads")
    def instrumented() = spark.sparkContext.parallelize(data, 4)
      .map { t => acc.add(1); t }.toDF("doc_id", "text")
    // default: counts pass + scoring pass = two upstream executions
    acc.reset()
    val plain = Importance.dsirScores(tgt, instrumented(), "doc_id", "text",
      k = 8)
    val plainRows = plain.collect().map(_.toSeq).toSet
    assert(acc.value == 2L * data.size,
      s"expected two passes by default, saw ${acc.value}")
    // pinned: one execution fills the cache, scoring reads it
    acc.reset()
    val pinned = Importance.dsirScores(tgt, instrumented(), "doc_id", "text",
      k = 8, persistUpstream = true)
    assert(acc.value == data.size,
      s"expected ONE upstream pass with persistUpstream, saw ${acc.value}")
    // result is already materialized — consuming it adds no reads
    assert(pinned.collect().map(_.toSeq).toSet == plainRows)
    assert(acc.value == data.size)
    pinned.unpersist(blocking = false)
  }
}
