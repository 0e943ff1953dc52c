package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over embedding columns (north-star operator; the
  * reference delegates this to Pinecone,
  * transcripts_to_vector_db.py:303-313 — here it's engine-native).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact. Queries are broadcast (a query batch is
  *    always ≪ corpus); the corpus is scanned once, narrow, and the
  *    per-query top-k is a window over (query, sim) — the only shuffle.
  *    At 100 TB this is the correct baseline: one pass, no index.
  *  - [[lshTopK]]: approximate scale path. Random-hyperplane signatures
  *    bucket the corpus (narrow projection, deterministic seed); only
  *    same-bucket candidates get exact cosine. Recall is tunable by
  *    `planes` (bucket granularity) and `probes` (multi-probe on the
  *    query side flips low-|margin| bits).
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes: `planes` rows × `dim`
    * values in [-0.5, 0.5), seeded — same plan every run/cluster size.
    */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextDouble() - 0.5)
  }

  /** Sign-bit signature of a vector against the given hyperplanes,
    * packed into a long (planes <= 63). Pure column algebra.
    */
  def planeSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      val d = VectorFunctions.dot(vec, planeCol)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact top-k neighbors for each query row.
    * @param queries DataFrame with (qidCol, vecCol)
    * @param corpus  DataFrame with (idCol, vecCol)
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qidCol: String, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val q = queries.select(col(qidCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", VectorFunctions.cosine(col("qv"), col("nv")))
      .filter(col("sim").isNotNull)
    TopK.perGroup(scored, Seq(col("qid")),
      Seq(col("sim").desc, col("nid")), k)
      .select(col("qid"), col("nid"), col("sim"), col("rk"))
  }

  /** IVF-style approximate top-k: a deterministic subset of the corpus
    * acts as coarse centroids; every vector is assigned to its best
    * centroid by cosine (narrow projection over a broadcast centroid
    * array); a query probes its own top-`nprobe` centroid lists and runs
    * exact cosine only there. One shuffle (the centroid-id equi-join).
    * Classic IVF trades recall for a corpus-scan reduction of
    * ~nprobe/nCentroids.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              qidCol: String, idCol: String, vecCol: String,
              k: Int, centroidEvery: Int = 32, nprobe: Int = 3): DataFrame = {
    import graft.functions.VectorFunctions.cosine
    val cents = corpus
      .filter(pmod(col(idCol), lit(centroidEvery)) === 0)
      .select(col(idCol).as("cent_id"), col(vecCol).as("cent_v"))
    def assign(df: DataFrame, id: String, as: String, n: Int): DataFrame =
      TopK.perGroup(
        df.select(col(id).as(as), col(vecCol).as(s"${as}_v"))
          .crossJoin(broadcast(cents))
          .withColumn("csim", cosine(col(s"${as}_v"), col("cent_v")))
          .filter(col("csim").isNotNull),
        Seq(col(as)), Seq(col("csim").desc, col("cent_id")), n)
        .select(col(as), col(s"${as}_v"), col("cent_id"))
    val corpusAssigned = assign(corpus, idCol, "nid", 1)
    val queryProbes = assign(queries, qidCol, "qid", nprobe)
    val cands = corpusAssigned.join(broadcast(queryProbes), Seq("cent_id"))
      .select(col("qid"), col("nid"), col("qid_v"), col("nid_v"))
      .distinct()
      .withColumn("sim", cosine(col("qid_v"), col("nid_v")))
      .filter(col("sim").isNotNull)
    TopK.perGroup(cands, Seq(col("qid")),
      Seq(col("sim").desc, col("nid")), k)
      .select(col("qid"), col("nid"), col("sim"), col("rk"))
  }

  /** Approximate top-k: candidates = corpus rows whose plane-signature
    * band matches the query's (bands of `bandBits` planes, pigeonhole:
    * any candidate differing in < nBands bands shares one). Exact cosine
    * + window top-k on candidates only.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qidCol: String, idCol: String, vecCol: String,
              k: Int, dim: Int, planes: Int = 16, bandBits: Int = 4,
              seed: Long = 42L): DataFrame = {
    require(planes % bandBits == 0, "bandBits must divide planes")
    val hp = hyperplanes(planes, dim, seed)
    val nBands = planes / bandBits
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, id: String, as: String): DataFrame = {
      val withSig = df.select(col(id).as(as), col(vecCol).as(s"${as}_v"))
        .withColumn("__sig", planeSignature(col(s"${as}_v"), hp))
      val keys = array((0 until nBands).map(b =>
        struct(lit(b).as("b"),
          shiftrightunsigned(col("__sig"), b * bandBits)
            .bitwiseAND(lit(mask)).as("bits"))): _*)
      withSig.withColumn("band", explode(keys)).drop("__sig")
    }
    val qb = banded(queries, qidCol, "qid")
    val cb = banded(corpus, idCol, "nid")
    val cands = cb.join(broadcast(qb), Seq("band"))
      .select(col("qid"), col("nid"), col("qid_v"), col("nid_v"))
      .distinct()
      .withColumn("sim", VectorFunctions.cosine(col("qid_v"), col("nid_v")))
      .filter(col("sim").isNotNull)
    TopK.perGroup(cands, Seq(col("qid")),
      Seq(col("sim").desc, col("nid")), k)
      .select(col("qid"), col("nid"), col("sim"), col("rk"))
  }
}
