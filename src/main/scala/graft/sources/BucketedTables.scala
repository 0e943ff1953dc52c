package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Catalog-backed bucketed tables: the co-located-join path for
  * fact-fact joins at scale (SURVEY.md §4 "physical"). Two tables
  * bucketed by their join key with the same bucket count join WITHOUT a
  * shuffle — at 100 TB that exchange is the dominant cost of the
  * reference's J1-style fact joins, and bucketing removes it from every
  * downstream join/aggregation on the key.
  */
object BucketedTables {

  /** Persist `df` bucketed (and optionally sorted) by `cols`. */
  def save(spark: SparkSession, name: String, df: DataFrame,
           nBuckets: Int, cols: Seq[String], sorted: Boolean = true): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, cols.head, cols.tail: _*)
    (if (sorted) w.sortBy(cols.head, cols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(name)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
