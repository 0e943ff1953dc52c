package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic TPC-H-ish testdata (TESTDATA.md).
  * A "table" is one parquet file under the scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Fail fast if `events.parquet`'s `ts` physical type regresses to
    * TIMESTAMP(NANOS). The session builders keep
    * `spark.sql.legacy.parquet.nanosAsLong=true` as a read guard, but
    * under that flag a NANOS file comes back as a LONG of nanoseconds —
    * and the `unix_micros(cast(ts as timestamp))` projections
    * (q43/q44/q46/q67) would then interpret nanos as SECONDS: silently
    * wrong values caught only by the downstream oracle hash. This
    * schema-only check (parquet footer, no data scan) turns that into
    * a loud startup failure naming the sites to swap.
    */
  def assertEventsTsReadable(spark: SparkSession, sfDir: String): Unit = {
    val p = new java.io.File(s"$sfDir/events.parquet")
    if (p.exists()) {
      val dt = t(spark, sfDir, "events").schema("ts").dataType
      require(dt.typeName.startsWith("timestamp"),
        s"events.parquet ts reads as $dt, not a timestamp: the dataset " +
          "likely regressed to TIMESTAMP(NANOS) (read as long nanos " +
          "under the nanosAsLong guard). Swap the four micros " +
          "projections (q43/q44/q46/q67 + SessionizeSpec) to `ts div " +
          "1000` before trusting any event-time result.")
    }
  }

  /** Register every table as a temp view so `spark.sql` mirrors the
    * DuckDB oracle's naming.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
}
