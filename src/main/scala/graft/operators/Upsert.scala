package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed-merge primitives re-expressing the reference's Postgres
  * `INSERT ... ON CONFLICT DO NOTHING` sinks and delisting flow as pure
  * DataFrame algebra (SURVEY.md §2.1 K2/K8, §2.3 J5/J6):
  *
  *  - reference upsert: combine_broker_listings.py:224-228 (key
  *    lat/lon/address), combine_and_format.py:122-129, etc.
  *  - reference delisting set-diff: archive_delisted_properties.py:93-147.
  *
  * All joins here are key-equi joins; at scale they hash-shuffle on the
  * key columns (or broadcast when one side is small — Spark's AQE decides
  * from runtime stats). No driver-side collect anywhere.
  */
object Upsert {

  /** Deduplicate incoming rows on `keys` deterministically: within a key
    * group keep the row that sorts first by `tieBreak` columns. (Plain
    * `dropDuplicates` keeps an arbitrary row — non-reproducible across
    * runs/cluster sizes, so golden tests would flake.)
    */
  def dedupByKey(incoming: DataFrame, keys: Seq[String],
                 tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tieBreak.map(col): _*)
    incoming.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** ON CONFLICT DO NOTHING: rows of `incoming` whose key is absent from
    * `existing`, deduped within the batch. Append-ready.
    */
  def newRows(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
              tieBreak: Seq[String]): DataFrame =
    dedupByKey(incoming, keys, tieBreak)
      .join(existing.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Full upsert result: existing ∪ new-keyed incoming. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             tieBreak: Seq[String]): DataFrame =
    existing.unionByName(
      newRows(existing, incoming, keys, tieBreak).select(
        existing.columns.map(col).toIndexedSeq: _*))

  /** Delisting (archive flow): keys present in `existing` but absent from
    * `current` — the rows to move to the archive table.
    */
  def delisted(existing: DataFrame, current: DataFrame,
               keys: Seq[String]): DataFrame =
    existing.join(current.select(keys.map(col): _*).distinct(),
      keys, "left_anti")

  /** Rows of `table` whose key is NOT in `toDelete` (the K8 conditional
    * delete, as a rewrite).
    */
  def antiDelete(table: DataFrame, toDelete: DataFrame,
                 keys: Seq[String]): DataFrame =
    // restore the table's column ORDER: a USING-column join moves the
    // key columns to the front, and a rewrite that persists that order
    // writes files whose parquet schema disagrees with the table's
    // other files — readers then resolve a NONDETERMINISTIC column
    // order (whichever footer gets sampled first) and positional
    // consumers break at random (the LexIndexSpec-under-load find)
    table.join(toDelete.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
      .select(table.columns.map(col).toIndexedSeq: _*)
}
