package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window text chunking with overlap — the reference's transcript
  * chunker (transcripts_to_vector_db.py:174-228; SURVEY.md §2.5 W1):
  * order snippets within a document, emit windows of `n` items advancing
  * by `stride = n - overlap`, concatenating item texts; the first item's
  * order key becomes the chunk key.
  *
  * Spark-first shape: ONE shuffle (the window over the partition key),
  * then a narrow explode that assigns each row to every chunk covering it
  * (`k` such that k*stride < rn <= k*stride + n), then a groupBy on
  * (partition, chunk) — which reuses the same hash partitioning, so at
  * 100 TB this is a single exchange regardless of document count. No
  * flatMapGroups / no driver-side loops; all expressions codegen.
  */
object Chunker {

  /** @param df        input rows (one row = one snippet)
    * @param partCol   document/partition key column
    * @param orderCols total ordering within a document (must be tie-free)
    * @param textCol   snippet text column
    * @param n         window size in snippets
    * @param overlap   snippets shared between consecutive windows
    * @return (partCol, chunk_id, n_items, text) one row per chunk
    */
  def slidingChunks(df: DataFrame, partCol: String, orderCols: Seq[String],
                    textCol: String, n: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < n, s"need 0 <= overlap < n, got $overlap/$n")
    val stride = n - overlap
    val w = Window.partitionBy(col(partCol)).orderBy(orderCols.map(col): _*)
    // chunk k covers rows rn in (k*stride, k*stride + n]
    // => k in [ceil((rn - n)/stride), floor((rn - 1)/stride)], clamped at 0
    val rn = col("__rn")
    val kMin = greatest(lit(0L),
      ceil((rn - lit(n)).cast("double") / lit(stride.toDouble)).cast("long"))
    val kMax = floor((rn - lit(1)).cast("double") / lit(stride.toDouble))
      .cast("long")
    df.withColumn("__rn", row_number().over(w))
      .withColumn("chunk_id", explode(sequence(kMin, kMax)))
      .groupBy(col(partCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_items"),
        // sort_array over (rn, text) structs => deterministic join order
        // (collect_list alone has nondeterministic arrival order)
        array_join(
          transform(
            array_sort(collect_list(struct(col("__rn"), col(textCol)))),
            s => s(textCol)),
          " ").as("text"))
  }

  /** Exact replica of the reference chunker's semantics
    * (transcripts_to_vector_db.py:197-225): FULL windows only, at starts
    * 0, stride, 2·stride … while start <= len−n, PLUS a tail window of
    * the last n items emitted only when `len % stride != 0 AND
    * pythonMod(len−n, stride) != 0` — including the quirk that some
    * lengths (e.g. len=3, n=5, stride=3) emit NOTHING. Same single-
    * exchange shape as [[slidingChunks]]; the tail is a second narrow
    * branch over the same shuffled partition, unioned.
    *
    * @return (partCol, chunk_ts = order value of the window's first row,
    *          n_items, text, is_tail)
    */
  def referenceChunks(df: DataFrame, partCol: String, tsCol: String,
                      textCol: String, n: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < n, s"need 0 <= overlap < n, got $overlap/$n")
    val stride = n - overlap
    val w = Window.partitionBy(col(partCol)).orderBy(col(tsCol))
    val wAll = Window.partitionBy(col(partCol))
    val base = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wAll))
    val rn = col("__rn"); val cnt = col("__cnt")
    def sortedText = array_join(
      transform(array_sort(collect_list(struct(col("__rn"), col(textCol)))),
        s => s(textCol)), " ")

    // full windows: k in [max(0, ceil((rn-n)/stride)), min(floor((rn-1)/
    // stride), floorDiv(cnt-n, stride))], nonempty only when cnt >= n
    val kMin = greatest(lit(0L),
      ceil((rn - lit(n)).cast("double") / lit(stride.toDouble)).cast("long"))
    val kCap = floor((cnt - lit(n)).cast("double") / lit(stride.toDouble))
      .cast("long")
    val kMax = least(
      floor((rn - lit(1)).cast("double") / lit(stride.toDouble)).cast("long"),
      kCap)
    val fulls = base
      .withColumn("k",
        explode(when(cnt >= n && kMax >= kMin, sequence(kMin, kMax))
          .otherwise(array().cast("array<long>"))))
      .groupBy(col(partCol), col("k"))
      .agg(min(col(tsCol)).as("chunk_ts"), count(lit(1)).as("n_items"),
        sortedText.as("text"))
      .select(col(partCol), col("chunk_ts"), col("n_items"), col("text"),
        lit(false).as("is_tail"))

    // tail: last n rows, under the reference's double-modulo condition
    // (python % semantics on the possibly-negative len-n => pmod)
    val tails = base
      .filter(pmod(cnt, lit(stride)) =!= 0 &&
        pmod(cnt - lit(n), lit(stride)) =!= 0 &&
        rn > cnt - lit(n))
      .groupBy(col(partCol))
      .agg(min(col(tsCol)).as("chunk_ts"), count(lit(1)).as("n_items"),
        sortedText.as("text"))
      .select(col(partCol), col("chunk_ts"), col("n_items"), col("text"),
        lit(true).as("is_tail"))

    fulls.unionByName(tails)
  }
}
