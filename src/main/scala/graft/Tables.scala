package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic TPC-H-ish testdata (TESTDATA.md).
  * A "table" is one parquet file under the scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache (metadata only — never data): parquet schema
  // INFERENCE costs ~250 ms per spark.read.parquet call (footer read +
  // merge) while a provided schema plans in ~15 ms, and a full bench
  // pass opens these ten tables ~700 times. Guarded by (mtime, size)
  // so a regenerated dataset re-infers; the cached StructType comes
  // from the same session config (nanosAsLong guard included), so the
  // frame is identical to the inferred one.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, org.apache.spark.sql.types.StructType)]()

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val f = new java.io.File(path)
    val (mt, len) = (f.lastModified, f.length)
    val hit = schemaCache.get(path)
    val sch =
      if (hit != null && hit._1 == mt && hit._2 == len) hit._3
      else {
        val s = spark.read.parquet(path).schema
        schemaCache.put(path, (mt, len, s))
        s
      }
    spark.read.schema(sch).parquet(path)
  }

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
