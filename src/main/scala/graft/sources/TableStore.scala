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
  * directories that contain affected keys (write to a `__tmp` sibling,
  * then per-partition rename swap), so a flag flip on one day of a
  * year-partitioned 100 TB table moves one day's bytes, not the year's,
  * and a crash at any point leaves each partition wholly old or wholly
  * new. Unpartitioned tables use the same temp-swap at table
  * granularity (single-writer assumption, SURVEY.md §7.4).
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

  /** Exact-dedup append: insert only batch rows whose normalized-text
    * fingerprint has never been stored — cross-batch dedup backed by
    * the store (the batch analogue of streaming corpus-ingest's
    * dropDuplicatesWithinWatermark, for corpora that grow by bulk
    * drops rather than streams). The survivor table carries the batch
    * columns plus `fp`. The anti-join needs only the store's fp column
    * (column pruning reaches the parquet scan), so a daily drop against
    * a 100 TB corpus store shuffles one fingerprint column, not the
    * corpus. Returns the rows appended (intra-batch dups removed with a
    * min-`idCol` tie-break, cross-batch dups removed via the store).
    */
  def dedupAppend(table: String, batch: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    // fp is this sink's column: silently overwriting caller data that
    // already carries one would corrupt it AND poison the cross-batch
    // anti-join — reject loudly instead
    require(!batch.columns.contains("fp"),
      "dedupAppend reserves the column name 'fp' for the stored " +
        "fingerprint; rename the batch's existing 'fp' column first")
    val fped = batch.withColumn("fp",
      graft.functions.TextFunctions.fingerprint(col(textCol)))
    val novel =
      if (!exists(table)) Upsert.dedupByKey(fped, Seq("fp"), Seq(idCol))
      else Upsert.newRows(read(table), fped, Seq("fp"), Seq(idCol))
        .select(fped.columns.map(col).toIndexedSeq: _*)
    // Snapshot BEFORE the append mutates this plan's own input
    // ([[TableStore.snapshot]] rationale): the returned frame must
    // never re-run the anti-join against the table it was just appended
    // to. Scoped persist: the table is append-only, so recompute from
    // the pinned splits after release still yields the pre-append
    // snapshot — callers that read it repeatedly should persist it
    // themselves; pinning here would leak one full batch per call
    // across a long-lived ingest session.
    val out = TableStore.snapshot(novel)
    try append(table, out)
    finally out.unpersist(blocking = false)
    out
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

  /** Small-file compaction — the operational companion to the mutation
    * paths: every append/upsert batch writes its own part-files, so a
    * frequently-updated table degrades into thousands of tiny files
    * whose listing and task-per-file overhead dominate scans at 100 TB.
    * Partitioned tables rewrite ONLY the partitions holding more than
    * `maxFiles` part-files (found with one metadata-cheap
    * `input_file_name` aggregation), one output file per partition
    * value, through the same per-partition temp-swap as
    * [[rewriteAffected]] — contents unchanged, untouched partitions
    * never move, a crash leaves each partition wholly old or new.
    * Unpartitioned tables rewrite into `targetFiles` files via the
    * [[rewrite]] temp-swap.
    */
  def compact(table: String, partitionCols: Seq[String] = Nil,
              maxFiles: Int = 1, targetFiles: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    if (partitionCols.isEmpty) {
      rewrite(table, read(table).repartition(targetFiles))
    } else {
      // input_file_name() is nondeterministic, so it must be projected
      // before the aggregate; the scan reads no data columns (footer
      // metadata + partition values only)
      val hit = read(table)
        .select(partitionCols.map(col) :+ input_file_name().as("__f"): _*)
        .groupBy(partitionCols.map(col): _*)
        .agg(countDistinct(col("__f")).as("__nf"))
        .filter(col("__nf") > maxFiles)
        .select(partitionCols.map(col): _*)
      // repartition BY the partition columns: each partition value
      // lands wholly in one task, so each swapped dir gets one file
      rewriteAffected(table, partitionCols, hit,
        transform = df => df.repartition(partitionCols.map(col): _*))
    }
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

  /** Rewrite ONLY the partitions in `hitParts`, write-then-swap:
    * the transformed rows land in a sibling `<table>__tmp` first (the
    * live table is never an input AND an output of the same job, so no
    * lineage break is needed — and nothing fault-tolerance-critical
    * lives in executor storage, unlike a `localCheckpoint` pivot), then
    * each written partition dir is swapped into place with per-dir
    * `FileSystem.rename`. A crash leaves every partition wholly old or
    * wholly new — the same temp-swap guarantee as [[rewrite]], at
    * partition granularity. Affected partitions the transform emptied
    * are deleted; untouched partition dirs never move.
    */
  private[sources] def rewriteAffected(table: String,
                                       partitionCols: Seq[String],
                                       hitParts: DataFrame,
                                       transform: DataFrame => DataFrame): Unit = {
    val affected = hitParts.collect()
    if (affected.isEmpty) return
    val affectedDf = broadcast(
      spark.createDataFrame(java.util.Arrays.asList(affected: _*),
        hitParts.schema))
    val updated = transform(
      read(table).join(affectedDf, partitionCols, "left_semi"))

    val dst = hpath(table)
    val tmp = new Path(path(table) + "__tmp")
    val bak = new Path(path(table) + "__old")
    val fs = fsOf(dst)
    fs.delete(tmp, true)
    fs.delete(bak, true)
    // phase 1: job output goes to the tmp sibling; a failure anywhere
    // in here leaves the live table byte-identical
    updated.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(tmp.toString)

    // leaf partition dirs the job actually wrote (a transform may also
    // emit rows into partition values outside `affected`, e.g. a flag
    // flip on a partition column; one that empties a partition writes
    // no dir at all)
    def leafDirs(base: Path, depth: Int, rel: String): Seq[String] =
      if (depth == 0) Seq(rel)
      else fs.listStatus(base).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => leafDirs(s.getPath, depth - 1,
          if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}"))
    val written = leafDirs(tmp, partitionCols.length, "")
    val affectedRels = affected.map { row =>
      partitionCols.zipWithIndex.map { case (c, i) =>
        val v = row.get(i)
        val s = if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
                else ExternalCatalogUtils.escapePathName(v.toString)
        s"${ExternalCatalogUtils.escapePathName(c)}=$s"
      }.mkString("/")
    }.toSet

    // phase 2: per-partition swap. Old data moves to the OUTSIDE
    // sibling `__old` (an `…__old` dir inside the table would read as
    // a bogus partition value if a crash stranded it), new dir renames
    // in — each dir is old or new at every instant, never truncated.
    written.foreach { rel =>
      val cur = new Path(dst, rel)
      val old = new Path(bak, rel)
      if (fs.exists(cur)) {
        fs.mkdirs(old.getParent)
        fs.rename(cur, old)
      }
      fs.mkdirs(cur.getParent)
      fs.rename(new Path(tmp, rel), cur)
    }
    // affected partitions the transform emptied: delete (as before)
    (affectedRels -- written).foreach { rel =>
      fs.delete(new Path(dst, rel), true)
    }
    fs.delete(tmp, true)
    fs.delete(bak, true)
    ()
  }
}

object TableStore {

  /** RDD-backed snapshot of a frame that must survive a mutation of the
    * very table files it reads (K7/K8 flag-flip/delete rewrites). The
    * `LogicalRDD` is opaque to the write path's recache-by-path — the
    * plan is never re-executed against replaced files — and pins the
    * scan to the file splits planned here. Unlike `localCheckpoint`,
    * whose blocks die with their executors and can never be rebuilt,
    * lineage stays recomputable from the pre-mutation files for the
    * whole write phase (every rewrite is write-then-swap, so the old
    * files outlive the job that reads them).
    *
    * The frame comes back `persist()`ed but lazily materialized: run
    * the durable WRITE first (its job fills the cache while the old
    * files are still live), then the rewrite. A snapshot consumed only
    * inside the calling method is released in `finally`
    * ([[TableStore.dedupAppend]]); one returned to the caller IS the
    * release handle — `unpersist()` it when consumed.
    */
  def snapshot(df: DataFrame): DataFrame = {
    val s = df.sparkSession.createDataFrame(df.rdd, df.schema)
    s.persist()
    s
  }
}
