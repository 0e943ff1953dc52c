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
}
