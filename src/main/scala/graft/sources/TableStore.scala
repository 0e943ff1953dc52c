package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.operators.Upsert

/** Parquet-backed table store: the engine-native replacement for the
  * reference's Postgres/Supabase serving sink (SURVEY.md §2.1 S13,
  * K2/K3/K7/K8). A table = a parquet directory under `root`.
  *
  * Semantics re-expressed as DataFrame algebra:
  *  - append            = K3 plain insert
  *  - upsert(keys)      = K2 INSERT ... ON CONFLICT DO NOTHING
  *  - deleteByKeys      = K8 conditional delete
  *  - updateFlag        = K7 row update (flag flip) as a rewrite
  *
  * Scale notes: rewrites (upsert/delete/update) read + write the whole
  * table — correct and simple for the reference's weekly/daily batch
  * cadence; at 100 TB these would target partitioned tables so only
  * affected partitions rewrite (partitionBy is exposed for that). The
  * write-to-temp-then-swap keeps a crash from truncating the table
  * (single-writer assumption, as documented in SURVEY.md §7.4).
  */
final class TableStore(spark: SparkSession, root: String) {

  private def path(table: String) = s"$root/$table"

  def exists(table: String): Boolean =
    new java.io.File(path(table)).exists()

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def append(table: String, df: DataFrame,
             partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(table))
  }

  /** INSERT ... ON CONFLICT DO NOTHING: append only new-keyed rows.
    * `tieBreak` makes intra-batch dedup deterministic.
    */
  def upsert(table: String, incoming: DataFrame, keys: Seq[String],
             tieBreak: Seq[String]): Unit =
    if (!exists(table)) {
      append(table, Upsert.dedupByKey(incoming, keys, tieBreak))
    } else {
      val existing = read(table)
      val novel = Upsert.newRows(existing, incoming, keys, tieBreak)
        .select(existing.columns.map(org.apache.spark.sql.functions.col)
          .toIndexedSeq: _*)
      append(table, novel)
    }

  /** Rewrite `table` without rows whose key-tuple appears in `toDelete`. */
  def deleteByKeys(table: String, toDelete: DataFrame,
                   keys: Seq[String]): Unit =
    rewrite(table, Upsert.antiDelete(read(table), toDelete, keys))

  /** Flag flip: set `flagCol = value` on rows whose key is in `keys_df`
    * (reference: summarized=1 / vectorized=1 rewrites).
    */
  def updateFlag(table: String, keysDf: DataFrame, keys: Seq[String],
                 flagCol: String, value: Int): Unit = {
    import org.apache.spark.sql.functions._
    val cur = read(table)
    val marked = cur.join(keysDf.select(keys.map(col): _*).distinct()
      .withColumn("__hit", lit(1)), keys, "left")
      .withColumn(flagCol,
        when(col("__hit").isNotNull, lit(value)).otherwise(col(flagCol)))
      .drop("__hit")
    rewrite(table, marked)
  }

  /** Full-table rewrite via temp dir + atomic-ish rename (single writer). */
  def rewrite(table: String, df: DataFrame): Unit = {
    val tmp = path(table) + "__tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new java.io.File(path(table))
    val bak = new java.io.File(path(table) + "__old")
    deleteRecursively(bak)
    if (dst.exists()) dst.renameTo(bak)
    new java.io.File(tmp).renameTo(dst)
    deleteRecursively(bak)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) { f.delete(); () }
  }
}
