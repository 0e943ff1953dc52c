package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions.{broadcast, col}
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
  * Storage goes through the Hadoop FileSystem API resolved from the
  * root path — the same store code runs on local fs, HDFS, or an
  * object store (s3a/gs/abfs), not just java.io. Mutations on
  * PARTITIONED tables are partition-targeted: `updateFlag` /
  * `deleteByKeys` with `partitionCols` rewrite only the partition
  * directories that contain affected keys (via dynamic partition
  * overwrite), so a flag flip on one day of a year-partitioned 100 TB
  * table moves one day's bytes, not the year's. Unpartitioned tables
  * fall back to the full temp-swap rewrite, which keeps a crash from
  * truncating the table (single-writer assumption, SURVEY.md §7.4).
  */
final class TableStore(spark: SparkSession, root: String) {

  private def path(table: String) = s"$root/$table"
  private def hpath(table: String) = new Path(path(table))
  private def fsOf(p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  def exists(table: String): Boolean = {
    val p = hpath(table)
    fsOf(p).exists(p)
  }

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
             tieBreak: Seq[String], partitionBy: Seq[String] = Nil): Unit =
    if (!exists(table)) {
      append(table, Upsert.dedupByKey(incoming, keys, tieBreak), partitionBy)
    } else {
      val existing = read(table)
      val novel = Upsert.newRows(existing, incoming, keys, tieBreak)
        .select(existing.columns.map(col).toIndexedSeq: _*)
      append(table, novel, partitionBy)
    }

  /** Rewrite `table` without rows whose key-tuple appears in `toDelete`.
    * With `partitionCols`, only partitions holding a matching key are
    * rewritten; partitions left empty by the delete are removed.
    */
  def deleteByKeys(table: String, toDelete: DataFrame, keys: Seq[String],
                   partitionCols: Seq[String] = Nil): Unit =
    if (partitionCols.isEmpty)
      rewrite(table, Upsert.antiDelete(read(table), toDelete, keys))
    else
      rewriteAffected(table, partitionCols,
        hitParts = read(table)
          .join(toDelete.select(keys.map(col): _*).distinct(), keys, "left_semi")
          .select(partitionCols.map(col): _*).distinct(),
        transform = Upsert.antiDelete(_, toDelete, keys))

  /** Flag flip: set `flagCol = value` on rows whose key is in `keysDf`
    * (reference: summarized=1 / vectorized=1 rewrites). With
    * `partitionCols`, only the partitions containing a keyed row are
    * rewritten.
    */
  def updateFlag(table: String, keysDf: DataFrame, keys: Seq[String],
                 flagCol: String, value: Int,
                 partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions._
    def flip(df: DataFrame): DataFrame =
      df.join(keysDf.select(keys.map(col): _*).distinct()
        .withColumn("__hit", lit(1)), keys, "left")
        .withColumn(flagCol,
          when(col("__hit").isNotNull, lit(value)).otherwise(col(flagCol)))
        .drop("__hit")
    if (partitionCols.isEmpty) rewrite(table, flip(read(table)))
    else rewriteAffected(table, partitionCols,
      hitParts = read(table)
        .join(keysDf.select(keys.map(col): _*).distinct(), keys, "left_semi")
        .select(partitionCols.map(col): _*).distinct(),
      transform = flip)
  }

  /** Full-table rewrite via temp dir + rename through the table's
    * FileSystem (single writer). On stores without atomic dir rename
    * (raw S3) the window is the two renames — still write-then-swap,
    * never truncate-then-write.
    */
  def rewrite(table: String, df: DataFrame,
              partitionBy: Seq[String] = Nil): Unit = {
    val dst = hpath(table)
    val tmp = new Path(path(table) + "__tmp")
    val bak = new Path(path(table) + "__old")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    val fs = fsOf(dst)
    fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(tmp, dst)
    fs.delete(bak, true)
    ()
  }

  /** Rewrite ONLY the partitions in `hitParts`: their rows are read,
    * transformed, and written back with dynamic partition overwrite
    * (untouched partition dirs never move); partitions the transform
    * leaves empty are deleted explicitly (dynamic overwrite cannot
    * express "this partition is now empty").
    */
  private def rewriteAffected(table: String, partitionCols: Seq[String],
                              hitParts: DataFrame,
                              transform: DataFrame => DataFrame): Unit = {
    val affected = hitParts.collect()
    if (affected.isEmpty) return
    val affectedDf = broadcast(
      spark.createDataFrame(java.util.Arrays.asList(affected: _*),
        hitParts.schema))
    val cur = read(table)
    val updated = transform(
      cur.join(affectedDf, partitionCols, "left_semi"))
      // break lineage to the files the overwrite below replaces
      .localCheckpoint(true)
    val survivors = updated
      .select(partitionCols.map(col): _*).distinct().collect().toSet
    updated.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path(table))
    val emptied = affected.filterNot(survivors.contains)
    if (emptied.nonEmpty) {
      val fs = fsOf(hpath(table))
      emptied.foreach { row =>
        val rel = partitionCols.zipWithIndex.map { case (c, i) =>
          val v = row.get(i)
          val s = if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
                  else ExternalCatalogUtils.escapePathName(v.toString)
          s"${ExternalCatalogUtils.escapePathName(c)}=$s"
        }.mkString("/")
        fs.delete(new Path(s"${path(table)}/$rel"), true)
      }
    }
  }
}
